"""Export an orbax checkpoint as a reference-format torch state_dict pickle.

The reference saves/loads bare ``state_dict`` pickles named ``step_N.pkl``
(reference train.py:84-90). This exports our checkpoints in exactly that
format so a trained model can be loaded into the ORIGINAL implementation
(``ref_model.load_state_dict(torch.load(path), strict=False)`` — only the
discarded Self_Attn params are absent), and the reverse: import a reference
pickle into a fresh orbax checkpoint.

Usage:
    python -m spair_pytorch_tpu.export --logdir runs/paper128_50k \
        --out step_50000.pkl
    python -m spair_pytorch_tpu.export --import-pkl their.pkl \
        --logdir runs/from_ref --preset paper128
"""

from __future__ import annotations

import argparse
import os

import jax

from spair_pytorch_tpu.config import PRESETS
from spair_pytorch_tpu.parallel import create_train_state
from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
from spair_pytorch_tpu.utils.compile_cache import enable_persistent_cache
from spair_pytorch_tpu.utils.interop import (from_torch_state_dict,
                                             to_torch_state_dict)


def main(argv=None):
    enable_persistent_cache()  # SPAIR_COMPILE_CACHE=0 opts out
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--logdir", required=True)
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", default=None,
                   help="write reference-format .pkl here")
    p.add_argument("--import-pkl", default=None,
                   help="reference state_dict pickle to import instead")
    args = p.parse_args(argv)

    import torch  # serialization only

    saved = os.path.join(args.logdir, "config.json")
    if os.path.exists(saved):
        # prefer the run's persisted config (see eval.py)
        from spair_pytorch_tpu.config import config_from_json
        with open(saved) as f:
            cfg = config_from_json(f.read())
    else:
        cfg = PRESETS[args.preset]()
    state = create_train_state(cfg)
    mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))

    if args.import_pkl:
        sd = torch.load(args.import_pkl, map_location="cpu")
        params = from_torch_state_dict(sd, state.params)
        state = type(state)(step=state.step, params=params,
                            opt_state=state.opt_state, rng=state.rng)
        step = mgr.save(state)
        mgr.wait()
        print(f"imported {args.import_pkl} -> {args.logdir} @ step {step}")
        return

    restored = mgr.restore(state, step=args.step, params_only=True)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.logdir}")
    sd = {k: torch.tensor(v)
          for k, v in to_torch_state_dict(jax.device_get(
              restored.params)).items()}
    out = args.out or f"step_{int(restored.step)}.pkl"
    torch.save(sd, out)
    print(f"wrote {out} (load into the reference with "
          f"model.load_state_dict(torch.load(...), strict=False))")


if __name__ == "__main__":
    main()
