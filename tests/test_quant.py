"""int8 serving quantization (ops/quant.py): layer-level error bounds and
detector-level drop-in behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu.ops.quant import (conv_int8, dense_int8,
                                         quantize_conv, quantize_linear,
                                         quantize_params_int8)


class TestLayerQuant:
    def test_dense_int8_close_to_f32(self):
        rng = np.random.RandomState(0)
        layer = {"w": jnp.asarray(rng.randn(64, 32).astype("f") * 0.1),
                 "b": jnp.asarray(rng.randn(32).astype("f") * 0.01)}
        x = jnp.asarray(rng.randn(8, 64).astype("f"))
        ref = x @ layer["w"] + layer["b"]
        out = dense_int8(quantize_linear(layer), x)
        denom = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) / denom < 0.02

    def test_dense_int8_per_row_scaling(self):
        # rows with wildly different magnitudes must each stay accurate —
        # the reason activations are per-row, not per-tensor
        rng = np.random.RandomState(1)
        layer = {"w": jnp.asarray(rng.randn(16, 8).astype("f")),
                 "b": jnp.zeros(8)}
        x = jnp.asarray(np.concatenate([
            rng.randn(2, 16) * 1e-3, rng.randn(2, 16) * 1e2]).astype("f"))
        ref = x @ layer["w"]
        out = dense_int8(quantize_linear(layer), x)
        for i in range(4):
            denom = max(1e-6, float(jnp.max(jnp.abs(ref[i]))))
            assert float(jnp.max(jnp.abs(out[i] - ref[i]))) / denom < 0.02

    def test_conv_int8_close_to_f32(self):
        rng = np.random.RandomState(2)
        layer = {"w": jnp.asarray(rng.randn(4, 4, 3, 8).astype("f") * 0.1),
                 "b": jnp.asarray(rng.randn(8).astype("f") * 0.01)}
        x = jnp.asarray(rng.rand(2, 16, 16, 3).astype("f"))
        ref = jax.lax.conv_general_dilated(
            x, layer["w"], (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + layer["b"]
        out = conv_int8(quantize_conv(layer), x, 2)
        denom = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) / denom < 0.02

    def test_quantize_tree_walks_and_preserves(self):
        rng = np.random.RandomState(3)
        tree = {
            "mlp": {"trunk": [{"w": jnp.asarray(rng.randn(4, 4), "f"),
                               "b": jnp.zeros(4)}],
                    "heads": [{"w": jnp.asarray(rng.randn(4, 2), "f"),
                               "b": jnp.zeros(2)}]},
            "edge": jnp.ones(7),  # non-layer leaf passes through
        }
        q = quantize_params_int8(tree)
        assert q["mlp"]["trunk"][0]["w_q"].dtype == jnp.int8
        assert q["mlp"]["heads"][0]["w_q"].dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(q["edge"]), np.ones(7))


class TestDetectorInt8:
    def test_quantized_detector_runs_and_tracks_f32(self):
        from tests.test_model import tiny_config
        from spair_pytorch_tpu.models import init_params
        from spair_pytorch_tpu.models.infer import detect
        cfg = tiny_config(inference_mode="independent")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        of = detect(params, x, cfg)
        oq = detect(quantize_params_int8(params), x, cfg)
        # same shapes; scores within PTQ tolerance of the f32 arm
        assert oq["boxes"].shape == of["boxes"].shape
        assert float(jnp.max(jnp.abs(oq["scores"] - of["scores"]))) < 0.15
        # boxes close in pixel units (48px canvas)
        assert float(jnp.max(jnp.abs(oq["boxes"] - of["boxes"]))) < 4.0

    def test_mixed_tree_allowed(self):
        # quantize ONLY the backbone: apply fns dispatch per layer
        from tests.test_model import tiny_config
        from spair_pytorch_tpu.models import init_params
        from spair_pytorch_tpu.models.infer import detect
        cfg = tiny_config(inference_mode="independent")
        params = dict(init_params(jax.random.PRNGKey(0), cfg))
        params["backbone"] = quantize_params_int8(params["backbone"])
        out = detect(params, jax.random.uniform(jax.random.PRNGKey(1),
                                                (1, 1, 48, 48)), cfg)
        assert np.isfinite(np.asarray(out["scores"])).all()
