"""ELBO-curve parity at training scale: ours vs the unmodified reference.

Runs BOTH implementations from the same initial parameters, on the same
fixed scattered-digit batch, with zeroed sampling noise (Normal.rsample ->
mean, Uniform.rsample -> 0.5), for --steps Adam(1e-4) steps, and writes

  * benchmarks/elbo_overlay.json  — per-step loss curves for both sides
  * benchmarks/elbo_overlay.png   — the overlay figure

This is the BASELINE.json "bit-comparable ELBO curves" north star measured
at training scale rather than the 4 steps of
tests/test_reference_parity.py::test_training_trajectory_parity.

Config: the reduced 60x60 / 5x5-grid setup of the parity tests (the
reference's per-cell Python loop makes the full 11x11 grid ~5x slower;
every code path is identical). Ours runs raster mode on CPU so that both
sides use the same IEEE f32 arithmetic.

Usage:
  python benchmarks/elbo_overlay.py --side ref  --steps 2000   (slow, hours)
  python benchmarks/elbo_overlay.py --side ours --steps 2000   (minutes)
  python benchmarks/elbo_overlay.py --side plot                (merge + png)

Reference entry points exercised: spair/models.py SPAIR.forward +
_build_loss, train.py:54-92 (Adam loop).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
from unittest import mock

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root
REF = "/root/reference"
STEP0 = 1503  # training wheel off -> all heads receive gradients


def fixed_batch(batch=8):
    """One fixed scattered-digit batch at 60x60, identical for both sides."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from spair_pytorch_tpu.data import DataConfig, glyph_bank
    from spair_pytorch_tpu.data.scattered_mnist import _generate_one

    bank = jnp.asarray(glyph_bank((14, 14)))
    dcfg = DataConfig(image_hw=(60, 60), max_objects=3)
    keys = jax.random.split(jax.random.PRNGKey(1234), batch)
    x, _, _ = jax.vmap(lambda k: _generate_one(k, bank, dcfg))(keys)
    return np.asarray(x, dtype=np.float32)


def our_config():
    from spair_pytorch_tpu.config import SpairConfig
    return SpairConfig(image_shape=(1, 60, 60), object_shape=(14, 14),
                       anchor_shape=(24, 24), inference_mode="raster")


def init_shared_params():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from spair_pytorch_tpu.models import init_params
    return init_params(jax.random.PRNGKey(7), our_config())


def run_ours(steps, batch, out):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from spair_pytorch_tpu.models import forward, geometry, sample_noise

    cfg = our_config()
    params = init_shared_params()
    x = jnp.asarray(fixed_batch(batch))
    _, (gh, gw), _ = geometry(cfg)
    noise = jax.tree_util.tree_map(
        jnp.zeros_like,
        sample_noise(jax.random.PRNGKey(0), batch, (gh, gw), cfg))
    opt = optax.adam(1e-4, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, o, step):
        (loss, aux), grads = jax.value_and_grad(
            lambda q: forward(q, cfg, x, step, jax.random.PRNGKey(0),
                              noise=noise), has_aux=True)(p)
        updates, o = opt.update(grads, o, p)
        terms = aux["losses"]
        return (optax.apply_updates(p, updates), o, loss,
                terms["losses/reconst"], terms["losses/KLpres_dist"])

    losses, recons, klp = [], [], []
    t0 = time.time()
    p = params
    for i in range(steps):
        p, opt_state, loss, rec, kp = train_step(p, opt_state, STEP0 + i)
        losses.append(float(loss))
        recons.append(float(rec))
        klp.append(float(kp))
        if i % 200 == 0:
            print(f"[ours] step {i} loss {losses[-1]:.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    json.dump({"loss": losses, "recon": recons, "kl_pres": klp},
              open(out, "w"))
    print(f"[ours] done {steps} steps in {time.time() - t0:.0f}s -> {out}")


def run_ref(steps, batch, out):
    import torch
    import torch.nn.functional as F

    params = init_shared_params()
    x = fixed_batch(batch)

    sys.path.insert(0, REF)
    import spair.config as ref_cfg
    ref_cfg.INPUT_IMAGE_SHAPE = [1, 60, 60]
    ref_cfg.OBJECT_SHAPE = [14, 14]
    ref_cfg.ANCHORBOX_SHAPE = [24, 24]
    import spair.models as ref_models

    class _NullWriter:
        def __getattr__(self, name):
            return lambda *a, **k: None

    ref_model = ref_models.SPAIR([1, 60, 60], _NullWriter(), "cpu")
    from spair_pytorch_tpu.utils.interop import to_torch_state_dict
    sd = {k: torch.tensor(v) for k, v in to_torch_state_dict(params).items()}
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not unexpected and all(k.startswith("attn.") for k in missing)
    ref_opt = torch.optim.Adam(ref_model.parameters(), lr=1e-4)

    orig_affine, orig_sample = F.affine_grid, F.grid_sample

    def affine_ac(theta, size, align_corners=None):
        return orig_affine(theta, size, align_corners=True)

    def sample_ac(inp, grid, mode="bilinear", padding_mode="zeros",
                  align_corners=None):
        return orig_sample(inp, grid, mode=mode, padding_mode=padding_mode,
                           align_corners=True)

    def normal_mean(self, sample_shape=torch.Size()):
        return self.loc.expand(self._extended_shape(sample_shape)).clone()

    def uniform_half(self, sample_shape=torch.Size()):
        return torch.full(self._extended_shape(sample_shape), 0.5)

    losses = []
    t0 = time.time()
    xt = torch.tensor(x)
    with mock.patch.object(torch.distributions.Normal, "rsample",
                           normal_mean), \
            mock.patch.object(torch.distributions.Uniform, "rsample",
                              uniform_half), \
            mock.patch.object(F, "affine_grid", affine_ac), \
            mock.patch.object(F, "grid_sample", sample_ac), \
            mock.patch.object(ref_models.debug_tools,
                              "plot_prerender_components",
                              lambda *a, **k: None):
        for i in range(steps):
            ref_opt.zero_grad()
            with contextlib.redirect_stdout(io.StringIO()):
                loss, *_ = ref_model(xt, STEP0 + i)
                loss.backward()
            ref_opt.step()
            losses.append(float(loss))
            if i % 50 == 0:
                print(f"[ref] step {i} loss {losses[-1]:.2f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            json.dump({"loss": losses}, open(out, "w")) if i % 200 == 0 \
                else None
    json.dump({"loss": losses}, open(out, "w"))
    print(f"[ref] done {steps} steps in {time.time() - t0:.0f}s -> {out}")


def plot(ours_json, ref_json, out_png):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ours = json.load(open(ours_json))["loss"]
    ref = json.load(open(ref_json))["loss"]
    n = min(len(ours), len(ref))
    ours, ref = np.asarray(ours[:n]), np.asarray(ref[:n])
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-9)

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 7), sharex=True,
                                   height_ratios=[3, 1])
    ax1.plot(ref, label="reference (torch CPU)", lw=2.2, alpha=0.75)
    ax1.plot(ours, label="ours (jax CPU, raster)", lw=1.0)
    ax1.set_yscale("log")
    ax1.set_ylabel("total loss (ELBO)")
    ax1.set_title(f"Shared init, zeroed noise, fixed batch — {n} Adam steps")
    ax1.legend()
    ax2.plot(rel, lw=0.8)
    ax2.set_yscale("log")
    ax2.set_ylabel("|Δ| / ref")
    ax2.set_xlabel("step")
    fig.tight_layout()
    fig.savefig(out_png, dpi=120)
    print(f"overlay -> {out_png}; median rel err {np.median(rel):.2e}, "
          f"max {rel.max():.2e} at step {int(rel.argmax())}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["ours", "ref", "plot"], required=True)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    ours_json = os.path.join(HERE, "elbo_ours.json")
    ref_json = os.path.join(HERE, "elbo_ref.json")
    if args.side == "ours":
        run_ours(args.steps, args.batch, ours_json)
    elif args.side == "ref":
        run_ref(args.steps, args.batch, ref_json)
    else:
        plot(ours_json, ref_json, os.path.join(HERE, "elbo_overlay.png"))


if __name__ == "__main__":
    main()
