"""Cross-validate a TRAINED checkpoint against the unmodified reference.

Loads a trained orbax checkpoint, pushes the parameters into the reference
PyTorch SPAIR via the state_dict interop layer, and runs ONE deterministic
forward (zeroed sampling noise) of BOTH implementations on the same batch
at the checkpoint's training step — end-to-end proof that a model trained
in this framework is bit-compatible with the reference at full 128x128
scale, not just at init (tests/test_reference_parity.py covers init-time
parity at a reduced size).

Usage: python benchmarks/cross_validate.py --logdir runs/paper128_real100k
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
from unittest import mock

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="runs/paper128_real100k")
    p.add_argument("--preset", default="paper128")
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from spair_pytorch_tpu.config import PRESETS
    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import _generate_one
    from spair_pytorch_tpu.models import forward, geometry, sample_noise
    from spair_pytorch_tpu.parallel import create_train_state
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
    from spair_pytorch_tpu.utils.interop import to_torch_state_dict

    cfg = PRESETS[args.preset](inference_mode="raster",
                               compute_dtype="float32")
    state = create_train_state(cfg)
    mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
    state = mgr.restore(state, params_only=True)
    assert state is not None, f"no checkpoint under {args.logdir}"
    step = int(state.step)
    print(f"checkpoint step {step}")

    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:], max_objects=6)
    keys = jax.random.split(jax.random.PRNGKey(77), args.batch)
    x, _, _ = jax.vmap(lambda k: _generate_one(k, bank, dcfg))(keys)
    x = np.asarray(x, np.float32)

    # --- ours, deterministic ---
    _, (gh, gw), _ = geometry(cfg)
    noise = jax.tree_util.tree_map(
        jnp.zeros_like,
        sample_noise(jax.random.PRNGKey(0), args.batch, (gh, gw), cfg))
    loss, aux = forward(state.params, cfg, jnp.asarray(x), step,
                        jax.random.PRNGKey(0), noise=noise)
    ours_loss = float(loss)
    ours_recon = np.asarray(aux["recon"])
    ours_pres = np.asarray(aux["z_pres"])

    # --- reference, same params ---
    sys.path.insert(0, REF)
    import spair.models as ref_models

    class _NullWriter:
        def __getattr__(self, name):
            return lambda *a, **k: None

    ref_model = ref_models.SPAIR(list(cfg.image_shape), _NullWriter(), "cpu")
    sd = {k: torch.tensor(v)
          for k, v in to_torch_state_dict(
              jax.device_get(state.params)).items()}
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(k.startswith("attn.") for k in missing), missing

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

    with mock.patch.object(torch.distributions.Normal, "rsample",
                           normal_mean), \
            mock.patch.object(torch.distributions.Uniform, "rsample",
                              uniform_half), \
            mock.patch.object(F, "affine_grid", affine_ac), \
            mock.patch.object(F, "grid_sample", sample_ac), \
            mock.patch.object(ref_models.debug_tools,
                              "plot_prerender_components",
                              lambda *a, **k: None), \
            contextlib.redirect_stdout(io.StringIO()):
        with torch.no_grad():
            ref_loss, ref_recon, _, ref_pres = ref_model(
                torch.tensor(x), step)

    ref_loss = float(ref_loss)
    ref_recon = ref_recon.numpy()
    rel = abs(ours_loss - ref_loss) / abs(ref_loss)
    recon_mae = np.abs(ours_recon - ref_recon).max()
    pres_mae = np.abs(ours_pres - ref_pres.numpy()).max()
    print(f"loss: ours {ours_loss:.2f} vs reference {ref_loss:.2f} "
          f"(rel diff {rel:.2e})")
    print(f"recon max|diff| {recon_mae:.2e}   z_pres max|diff| {pres_mae:.2e}")
    ok = rel < 1e-3 and recon_mae < 1e-3
    print("CROSS-VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
