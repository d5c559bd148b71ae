"""Reference-schema HDF5 round-trip and debug-tool tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model import tiny_config
from spair_pytorch_tpu.models import forward, init_params
from spair_pytorch_tpu.utils.debug import (Benchmark, enable_nan_hunter,
                                           nan_hunter)


class TestHDF5:
    def test_reference_schema_roundtrip(self, tmp_path):
        """Write a file in the reference layout (group 'train/full' with
        image/bbox/digit_count, reference dataloader.py:13-33) and read it
        back through ScatteredMNISTFile."""
        h5py = pytest.importorskip("h5py")
        from spair_pytorch_tpu.data import ScatteredMNISTFile

        rng = np.random.RandomState(0)
        n, h, w, m = 10, 48, 48, 4
        path = str(tmp_path / "ref.hdf5")
        with h5py.File(path, "w") as f:
            g = f.create_group("train/full")
            g.create_dataset("image", data=rng.rand(n, h, w).astype("f"))
            g.create_dataset("bbox", data=rng.rand(n, m, 4).astype("f") * 20)
            g.create_dataset("digit_count",
                             data=rng.randint(1, m, (n, 1)).astype("f"))

        ds = ScatteredMNISTFile(path)
        assert len(ds) == n
        img, bbox, count = ds[0]
        assert img.shape == (1, h, w)
        assert bbox.shape == (m, 4)
        batches = list(ds.batches(4))
        assert len(batches) == 2  # drop_last like reference train.py:52
        assert batches[0][0].shape == (4, 1, h, w)

    def test_train_from_hdf5(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from spair_pytorch_tpu.train import train

        rng = np.random.RandomState(1)
        path = str(tmp_path / "data.hdf5")
        with h5py.File(path, "w") as f:
            g = f.create_group("train/full")
            g.create_dataset("image",
                             data=(rng.rand(8, 48, 48) > 0.9).astype("f"))
            g.create_dataset("bbox", data=rng.rand(8, 3, 4).astype("f") * 20)
            g.create_dataset("digit_count",
                             data=rng.randint(1, 3, (8, 1)).astype("f"))
        cfg = tiny_config(inference_mode="independent", batch_size=4)
        state = train(cfg, steps=2, logdir=str(tmp_path / "run"), hdf5=path,
                      checkpoint_every=0, metrics_every=0, verbose=False)
        assert int(state.step) == 2


class TestNanHunter:
    def test_silent_when_disabled(self):
        nan_hunter("test", x=jnp.array([float("nan")]))  # no-op

    def test_raises_on_nan(self):
        enable_nan_hunter(True)
        try:
            with pytest.raises(Exception):
                @jax.jit
                def f(x):
                    nan_hunter("inside jit", val=x)
                    return x * 2
                f(jnp.array([1.0, float("nan")]))
                # callbacks may be async; force them to run
                jax.effects_barrier()
        finally:
            enable_nan_hunter(False)

    def test_clean_tensor_passes(self):
        enable_nan_hunter(True)
        try:
            @jax.jit
            def f(x):
                nan_hunter("clean", val=x)
                return x + 1
            out = f(jnp.ones(4))
            jax.effects_barrier()
            np.testing.assert_allclose(np.asarray(out), 2.0)
        finally:
            enable_nan_hunter(False)

    def test_forward_with_hunter_enabled(self):
        enable_nan_hunter(True)
        try:
            cfg = tiny_config(inference_mode="independent")
            params = init_params(jax.random.PRNGKey(0), cfg)
            x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
            loss, _ = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
            jax.effects_barrier()
            assert np.isfinite(float(loss))
        finally:
            enable_nan_hunter(False)


class TestBenchmark:
    def test_spans_accumulate(self):
        b = Benchmark()
        with b.span("op"):
            sum(range(1000))
        with b.span("op"):
            sum(range(1000))
        assert b.counts["op"] == 2
        assert "op: total" in b.report()
