"""Conv object codec (the reference's broken sketch, made functional)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_config
from spair_pytorch_tpu.models import forward, init_params
from spair_pytorch_tpu.ops.convcodec import (apply_conv_decoder,
                                             apply_conv_encoder,
                                             codec_shapes, init_conv_decoder,
                                             init_conv_encoder)


def test_codec_shapes_reference_28():
    # the reference's comments expect 13 -> 6(5?) -> 2 maps; our closed form
    # for 28x28 with its topology (reference config.py:15-20)
    assert codec_shapes((28, 28)) == [(28, 28), (13, 13), (6, 6), (2, 2),
                                      (2, 2)]


def test_encoder_decoder_shapes():
    enc = init_conv_encoder(jax.random.PRNGKey(0), 1, 16, (28, 28))
    g = jnp.zeros((2, 5, 1, 28, 28))
    out = apply_conv_encoder(enc, g)
    assert out.shape == (2, 5, 16)

    dec = init_conv_decoder(jax.random.PRNGKey(1), 8, 2, (28, 28))
    z = jnp.zeros((2, 5, 8))
    logits = apply_conv_decoder(dec, z, (28, 28))
    assert logits.shape == (2, 5, 28, 28, 2)


def test_forward_and_training_with_conv_codec():
    cfg = tiny_config(inference_mode="independent", object_codec="conv")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    loss, aux = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert aux["recon"].shape == (2, 1, 48, 48)
    g = jax.grad(lambda p: forward(p, cfg, x, 0, jax.random.PRNGKey(2))[0])(
        params)
    mags = [float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(m) for m in mags) and max(mags) > 0
    # encoder/decoder conv params actually receive gradients
    ge = jax.tree_util.tree_leaves(g["object_encoder"])
    gd = jax.tree_util.tree_leaves(g["object_decoder"])
    assert max(float(jnp.abs(l).max()) for l in ge) > 0
    assert max(float(jnp.abs(l).max()) for l in gd) > 0
