"""Multi-device (virtual 8-CPU mesh) and training-infrastructure tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_model import tiny_config
from spair_pytorch_tpu.parallel import (create_train_state, make_mesh,
                                        make_train_step, replicate,
                                        shard_batch)

pytestmark = pytest.mark.slow  # 8-device mesh + multiprocess jax.distributed


@pytest.fixture(scope="module")
def eight_devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestDataParallel:
    def test_dp_matches_single_device(self, eight_devices):
        """A DP step over 8 shards must produce the same loss and updated
        params as the same batch on one device (SURVEY.md section 4 test (g))."""
        cfg = tiny_config(inference_mode="independent", batch_size=8)
        state_sd = create_train_state(cfg)
        state_dp = jax.tree_util.tree_map(lambda t: t.copy(), state_sd)

        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 1, 48, 48))

        step_sd = make_train_step(cfg, donate=False)
        state_sd, m_sd = step_sd(state_sd, x)

        mesh = make_mesh(n_data=8, devices=eight_devices)
        state_dp = replicate(mesh, state_dp)
        step_dp = make_train_step(cfg, mesh, donate=False)
        state_dp, m_dp = step_dp(state_dp, shard_batch(mesh, x))

        assert np.isclose(float(m_sd["losses/total"]),
                          float(m_dp["losses/total"]), rtol=1e-4)
        flat_sd = jax.tree_util.tree_leaves(state_sd.params)
        flat_dp = jax.tree_util.tree_leaves(state_dp.params)
        for a, b in zip(flat_sd, flat_dp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5)

    def test_mesh_2d(self, eight_devices):
        mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_model_axis_sharding_matches_single_device(self, eight_devices):
        """(data=4, model=2) mesh with the cell axis sharded over 'model'
        must reproduce the single-device loss."""
        from spair_pytorch_tpu.parallel import set_constraint_mesh
        cfg = tiny_config(inference_mode="independent", batch_size=8)
        state_sd = create_train_state(cfg)
        state_2d = jax.tree_util.tree_map(lambda t: t.copy(), state_sd)
        x = jax.random.uniform(jax.random.PRNGKey(2), (8, 1, 48, 48))

        step_sd = make_train_step(cfg, donate=False)
        _, m_sd = step_sd(state_sd, x)

        mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
        try:
            step_2d = make_train_step(cfg, mesh, donate=False)
            _, m_2d = step_2d(replicate(mesh, state_2d),
                              shard_batch(mesh, x))
        finally:
            set_constraint_mesh(None)
        assert np.isclose(float(m_sd["losses/total"]),
                          float(m_2d["losses/total"]), rtol=1e-4)

    def test_wavefront_lane_sharding_matches_single_device(
            self, eight_devices):
        """(data=4, model=2) with the WAVEFRONT scan: the 'model' axis
        shards each front's lane axis (models/spair.py lane_constrain);
        must reproduce the single-device loss."""
        from spair_pytorch_tpu.parallel import set_constraint_mesh
        cfg = tiny_config(inference_mode="wavefront", batch_size=8)
        state_sd = create_train_state(cfg)
        state_2d = jax.tree_util.tree_map(lambda t: t.copy(), state_sd)
        x = jax.random.uniform(jax.random.PRNGKey(2), (8, 1, 48, 48))

        step_sd = make_train_step(cfg, donate=False)
        _, m_sd = step_sd(state_sd, x)

        mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
        try:
            step_2d = make_train_step(cfg, mesh, donate=False)
            _, m_2d = step_2d(replicate(mesh, state_2d),
                              shard_batch(mesh, x))
        finally:
            set_constraint_mesh(None)
        assert np.isclose(float(m_sd["losses/total"]),
                          float(m_2d["losses/total"]), rtol=1e-4)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        assert compiled is not None

    def test_dryrun_multichip(self, eight_devices):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
        cfg = tiny_config(inference_mode="independent")
        state = create_train_state(cfg)
        step = make_train_step(cfg, donate=False)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 48, 48))
        state, _ = step(state, x)
        state, _ = step(state, x)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state)
        mgr.wait()

        template = create_train_state(cfg)
        restored = mgr.restore(template)
        assert restored is not None
        assert int(restored.step) == 2
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # training continues from the restored state
        restored, metrics = step(restored, x)
        assert np.isfinite(float(metrics["losses/total"]))

    def test_restore_none_when_empty(self, tmp_path):
        from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
        cfg = tiny_config()
        mgr = CheckpointManager(str(tmp_path / "empty"))
        assert mgr.restore(create_train_state(cfg)) is None


class TestTrainDriver:
    def test_train_smoke(self, tmp_path):
        from spair_pytorch_tpu.train import train
        cfg = tiny_config(inference_mode="independent", batch_size=2)
        state = train(cfg, steps=3, logdir=str(tmp_path / "run"),
                      checkpoint_every=0, metrics_every=0, verbose=False)
        assert int(state.step) == 3
        assert (tmp_path / "run" / "metrics.jsonl").exists()


class TestGradClipping:
    def test_clipped_optimizer_trains(self):
        cfg = tiny_config(inference_mode="independent", grad_clip_norm=1.0)
        state = create_train_state(cfg)
        step = make_train_step(cfg, donate=False)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 48, 48))
        s1, m1 = step(state, x)
        # with clip norm 1.0 every update is tiny but finite
        assert np.isfinite(float(m1["losses/total"]))
        d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   state.params, s1.params)
        assert max(jax.tree_util.tree_leaves(d)) > 0


class TestShardedData:
    """Per-host sharded generation (SURVEY §5: distributed data loading)."""

    def test_host_slice_partition(self):
        from spair_pytorch_tpu.data.sharded import host_slice
        # slices tile the global batch exactly, for any process count
        for nproc in (1, 2, 4, 8):
            spans = [host_slice(32, nproc, i) for i in range(nproc)]
            assert spans[0][0] == 0 and spans[-1][1] == 32
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b == c
        with pytest.raises(ValueError):
            host_slice(10, 4, 0)

    def test_topology_invariant_content(self):
        """Example i is bit-identical no matter how many processes generate
        it (the fold_in(key, global_index) determinism contract)."""
        from spair_pytorch_tpu.data import DataConfig, glyph_bank
        from spair_pytorch_tpu.data.sharded import generate_host_local
        bank = jnp.asarray(glyph_bank((7, 7)))
        dcfg = DataConfig(image_hw=(24, 24), patch_hw=(7, 7), max_objects=2)
        key = jax.random.PRNGKey(5)
        whole = generate_host_local(key, bank, dcfg, 8, 1, 0)
        parts = [generate_host_local(key, bank, dcfg, 8, 4, i)
                 for i in range(4)]
        stitched = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts)
        for a, b in zip(jax.tree_util.tree_leaves(whole),
                        jax.tree_util.tree_leaves(stitched)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sharded_batch_on_mesh(self, eight_devices):
        """The assembled global array is data-axis sharded, each shard holds
        the examples its host generated, and a DP train step consumes it
        with the same loss as the replicated-input run."""
        from spair_pytorch_tpu.data import DataConfig, glyph_bank
        from spair_pytorch_tpu.data.sharded import (generate_host_local,
                                                    sharded_scattered_batch)
        bank = jnp.asarray(glyph_bank((7, 7)))
        dcfg = DataConfig(image_hw=(48, 48), patch_hw=(7, 7), max_objects=2)
        mesh = make_mesh(n_data=8, devices=eight_devices)
        key = jax.random.PRNGKey(9)
        batch = sharded_scattered_batch(key, bank, dcfg, 8, mesh)
        x, bbox, count = batch
        assert x.shape == (8, 1, 48, 48)
        # sharded over 'data': every addressable shard is 1 example
        assert len(x.sharding.device_set) == 8
        for shard in x.addressable_shards:
            assert shard.data.shape[0] == 1
        # content matches host-local generation of the same global ids
        ref_x, ref_bbox, ref_count = generate_host_local(key, bank, dcfg,
                                                         8, 1, 0)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(ref_x))
        np.testing.assert_array_equal(np.asarray(bbox), np.asarray(ref_bbox))

        cfg = tiny_config(inference_mode="independent", batch_size=8)
        state = replicate(mesh, create_train_state(cfg))
        step_dp = make_train_step(cfg, mesh, donate=False)
        _, m_dp = step_dp(state, x)

        step_sd = make_train_step(cfg, donate=False)
        _, m_sd = step_sd(create_train_state(cfg), jnp.asarray(ref_x))
        assert np.isclose(float(m_dp["losses/total"]),
                          float(m_sd["losses/total"]), rtol=1e-4)


class TestStepsPerCall:
    def test_scan_folded_steps_match_sequential(self):
        """steps_per_call=K is bit-identical to K sequential fused calls
        (same RNG chain through the carried state), with stacked metrics."""
        from spair_pytorch_tpu.data import DataConfig, glyph_bank
        cfg = tiny_config(inference_mode="independent", batch_size=2)
        bank = jnp.asarray(glyph_bank((10, 10)))
        dcfg = DataConfig(image_hw=(48, 48), patch_hw=(10, 10),
                          max_objects=2)
        s1 = create_train_state(cfg)
        s2 = jax.tree_util.tree_map(lambda t: t.copy(), s1)

        step1 = make_train_step(cfg, datagen=(dcfg, bank), donate=False)
        losses_seq = []
        for _ in range(3):
            s1, m = step1(s1)
            losses_seq.append(float(m["losses/total"]))

        step3 = make_train_step(cfg, datagen=(dcfg, bank), donate=False,
                                steps_per_call=3)
        s2, m3 = step3(s2)
        assert m3["losses/total"].shape == (3,)
        np.testing.assert_allclose(np.asarray(m3["losses/total"]),
                                   np.asarray(losses_seq), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_train_driver_steps_per_call(self, tmp_path):
        """Driver with steps_per_call: every step still logged, loop count
        right."""
        import json
        from spair_pytorch_tpu.train import train
        cfg = tiny_config(inference_mode="independent", batch_size=2)
        state = train(cfg, steps=6, logdir=str(tmp_path / "run"),
                      checkpoint_every=0, metrics_every=0, verbose=False,
                      steps_per_call=3, log_flush_every=2)
        assert int(state.step) == 6
        steps_logged = set()
        with open(tmp_path / "run" / "metrics.jsonl") as fh:
            for line in fh:
                steps_logged.add(json.loads(line)["step"])
        assert steps_logged == {0, 1, 2, 3, 4, 5}


class TestMultiProcess:
    """REAL multi-process jax.distributed execution (Gloo CPU backend).

    Everything else in this file shards over one process's 8 virtual
    devices; these spawn actual separate processes (2 procs x 2 devices)
    and assert the two claims sharded.py makes about topology invariance
    (sharded.py:11-18): identical data stream, identical DP training math.
    """

    @staticmethod
    def _run_cluster(nproc, outdir):
        import socket
        import subprocess
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs = [subprocess.Popen(
            ["python", os.path.join(root, "tests", "multiproc_worker.py"),
             str(i), str(nproc), str(port), outdir],
            cwd=root, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT) for i in range(nproc)]
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"

    def test_two_process_dp_matches_single_process(self, tmp_path):
        d2, d1 = str(tmp_path / "np2"), str(tmp_path / "np1")
        os.makedirs(d2), os.makedirs(d1)
        self._run_cluster(2, d2)
        self._run_cluster(1, d1)

        one = np.load(os.path.join(d1, "proc0.npz"))
        a = np.load(os.path.join(d2, "proc0.npz"))
        b = np.load(os.path.join(d2, "proc1.npz"))

        # (a) bit-identical global stream, any process count
        for k in ("images", "bbox", "count"):
            two = np.concatenate([a[k], b[k]], axis=0)
            np.testing.assert_array_equal(two, one[k])

        # (b) the DP train step computes the same math on 4 devices/2
        # processes as on 2 devices/1 process (reduction-order tolerance)
        for k in ("loss", "pnorm"):
            np.testing.assert_allclose(a[k], one[k], rtol=2e-5)
            np.testing.assert_allclose(b[k], one[k], rtol=2e-5)
