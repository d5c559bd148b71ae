"""torch state_dict interop: roundtrip and load-into-reference checks."""

import jax
import numpy as np
import pytest

from tests.test_model import tiny_config
from spair_pytorch_tpu.models import init_params
from spair_pytorch_tpu.utils.interop import (from_torch_state_dict,
                                             to_torch_state_dict)

pytestmark = pytest.mark.slow  # torch cross-loading round-trips


class TestRoundtrip:
    def test_export_import_identity(self):
        cfg = tiny_config()
        params = init_params(jax.random.PRNGKey(0), cfg)
        sd = to_torch_state_dict(params)
        assert "backbone.net.conv_0.weight" in sd
        assert "backbone.net.conv_out.weight" in sd
        assert "box_network.output_layers.0.weight" in sd
        assert "virtual_edge_element" in sd

        back = from_torch_state_dict(sd, init_params(jax.random.PRNGKey(1),
                                                     cfg))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_torch_pickle_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")
        cfg = tiny_config()
        params = init_params(jax.random.PRNGKey(2), cfg)
        sd = {k: torch.tensor(v) for k, v in to_torch_state_dict(params).items()}
        path = tmp_path / "ckpt.pkl"
        torch.save(sd, path)
        loaded = torch.load(path)
        back = from_torch_state_dict(loaded,
                                     init_params(jax.random.PRNGKey(3), cfg))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_loads_into_reference_model(self):
        """Exported state_dict keys/shapes must be accepted by the actual
        reference torch module (strict=False only for the Self_Attn params
        we deliberately do not carry)."""
        torch = pytest.importorskip("torch")
        pytest.importorskip("tensorboardX")
        import sys
        sys.path.insert(0, "/root/reference")
        try:
            import spair.config as ref_cfg
            ref_cfg.INPUT_IMAGE_SHAPE = [1, 60, 60]
            ref_cfg.OBJECT_SHAPE = [14, 14]
            ref_cfg.ANCHORBOX_SHAPE = [24, 24]
            import spair.models as ref_models
            from tests.test_reference_parity import _NullWriter, our_config

            cfg = our_config()
            params = init_params(jax.random.PRNGKey(4), cfg)
            sd = {k: torch.tensor(v)
                  for k, v in to_torch_state_dict(params).items()}
            ref = ref_models.SPAIR([1, 60, 60], _NullWriter(), "cpu")
            missing, unexpected = ref.load_state_dict(sd, strict=False)
            assert not unexpected, f"keys the reference rejects: {unexpected}"
            assert all(k.startswith("attn.") for k in missing), missing
        finally:
            sys.path.remove("/root/reference")


def test_export_import_cli_roundtrip(tmp_path):
    """Full CLI path: train 1 step -> export .pkl -> import into a new
    logdir -> params identical."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from spair_pytorch_tpu import export as export_cli
    from spair_pytorch_tpu.parallel import create_train_state
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
    import os
    from unittest import mock

    cfg = tiny_config()
    state = create_train_state(cfg)
    mgr = CheckpointManager(str(tmp_path / "run" / "checkpoints"))
    mgr.save(state)
    mgr.wait()

    pkl = str(tmp_path / "exported.pkl")
    with mock.patch.dict("spair_pytorch_tpu.export.PRESETS",
                         {"tiny": lambda **kw: tiny_config(**kw)}):
        export_cli.main(["--logdir", str(tmp_path / "run"),
                         "--preset", "tiny", "--out", pkl])
        assert os.path.exists(pkl)
        export_cli.main(["--import-pkl", pkl, "--preset", "tiny",
                         "--logdir", str(tmp_path / "back")])

    back = CheckpointManager(str(tmp_path / "back" / "checkpoints")).restore(
        create_train_state(cfg))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
