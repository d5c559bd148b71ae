"""Cold/warm probe for the persistent XLA compilation cache (real TPU).

No reference counterpart: torch eager (/root/reference/train.py:24-65)
pays no compile step. Here the question is purely infrastructural: does
`utils/compile_cache.enable_persistent_cache` actually shorten the second
invocation of the SAME program through the axon backend (compiles are
remote in this environment — PALLAS_AXON_REMOTE_COMPILE — so executable
serialization may or may not round-trip)?

Protocol: run this script TWICE in separate processes with the same
--cache-dir (fresh on the first run). Each run times
`step_fn.lower(state).compile()` for the full K=1 training step — the
exact program every CLI compiles first — and reports the on-disk cache
state afterwards. Cold = first run (populates), warm = second run (hits
or doesn't). The verdict lives in benchmarks/RESULTS.md ("persistent
compilation cache").

Usage:
    d=$(mktemp -d); for i in 1 2; do
        python benchmarks/compile_cache_probe.py --cache-dir $d; done
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cache-dir", required=True)
    p.add_argument("--preset", default="paper128")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--mode", default="wavefront")
    p.add_argument("--no-cache", action="store_true",
                   help="skip enable_persistent_cache (control arm)")
    args = p.parse_args()

    if not args.no_cache:
        from spair_pytorch_tpu.utils.compile_cache import \
            enable_persistent_cache
        used = enable_persistent_cache(args.cache_dir, min_compile_secs=0.5)
        assert used == args.cache_dir

    import jax  # noqa: F401  (device init before timing)
    import jax.numpy as jnp

    from spair_pytorch_tpu.config import PRESETS
    from spair_pytorch_tpu.data import DataConfig, glyph_bank
    from spair_pytorch_tpu.parallel import create_train_state, make_train_step

    cfg = PRESETS[args.preset](batch_size=args.batch,
                               inference_mode=args.mode,
                               pres_gate_threshold=0.01)
    bank = jnp.asarray(glyph_bank((14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects,
                      min_objects=cfg.min_scene_objects)
    state = create_train_state(cfg)
    step_fn = make_train_step(cfg, datagen=(dcfg, bank), steps_per_call=1)

    t0 = time.perf_counter()
    lowered = step_fn.lower(state)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    del compiled

    entries = [os.path.join(r, f)
               for r, _, fs in os.walk(args.cache_dir) for f in fs]
    print(json.dumps({
        "cache_dir": args.cache_dir,
        "cache_enabled": not args.no_cache,
        "lower_s": round(t_lower, 2),
        "compile_s": round(t_compile, 2),
        "cache_entries": len(entries),
        "cache_bytes": sum(os.path.getsize(e) for e in entries),
    }))


if __name__ == "__main__":
    main()
