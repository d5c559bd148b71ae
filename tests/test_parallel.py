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
