"""Serving detector tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_config
from spair_pytorch_tpu.models import init_params
from spair_pytorch_tpu.models.infer import detect, make_detector


def test_detect_shapes_and_determinism():
    cfg = tiny_config(inference_mode="wavefront")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    out1 = detect(params, x, cfg)
    out2 = detect(params, x, cfg)
    assert out1["boxes"].shape == (2, 16, 4)
    assert out1["scores"].shape == (2, 16)
    assert out1["count"].shape == (2,)
    np.testing.assert_array_equal(np.asarray(out1["boxes"]),
                                  np.asarray(out2["boxes"]))
    s = np.asarray(out1["scores"])
    assert (s >= 0).all() and (s <= 1).all()


def test_make_detector_jit():
    cfg = tiny_config(inference_mode="independent")
    params = init_params(jax.random.PRNGKey(0), cfg)
    det = make_detector(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    out = det(params, x)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    # boxes are [x0,y0,x1,y1] with x1>=x0, y1>=y0
    b = np.asarray(out["boxes"])
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
