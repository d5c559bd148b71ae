"""Profiling CLI: capture a TPU/XLA trace of training steps.

TPU-native counterpart of the reference's wall-clock ``benchmark``/
``benchmark_init`` timers (reference debug_tools.py:30-40): captures a full
``jax.profiler`` trace (viewable in TensorBoard / Perfetto) around jitted
training steps, plus block_until_ready-bracketed per-step wall times from
the Benchmark utility.

Usage:
    python -m spair_pytorch_tpu.profile --preset paper128 --steps 5 \
        --out /tmp/spair_trace
"""

from __future__ import annotations

import argparse

import jax

from spair_pytorch_tpu.config import PRESETS
from spair_pytorch_tpu.data import DataConfig, generate_batch, glyph_bank
from spair_pytorch_tpu.parallel import create_train_state, make_train_step
from spair_pytorch_tpu.utils.compile_cache import enable_persistent_cache
from spair_pytorch_tpu.utils.debug import Benchmark


def main(argv=None):
    enable_persistent_cache()  # SPAIR_COMPILE_CACHE=0 opts out
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--out", default="/tmp/spair_trace")
    p.add_argument("--mode", default=None,
                   choices=[None, "independent", "raster", "wavefront", "rowscan"])
    args = p.parse_args(argv)

    overrides = {"inference_mode": args.mode} if args.mode else {}
    cfg = PRESETS[args.preset](**overrides)
    state = create_train_state(cfg)
    step_fn = make_train_step(cfg, donate=False)

    import jax.numpy as jnp
    bank = jnp.asarray(glyph_bank((14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects)
    key = jax.random.PRNGKey(0)

    def batch(i):
        return generate_batch(jax.random.fold_in(key, i), bank,
                              cfg.batch_size, dcfg)[0]

    bench = Benchmark()
    for i in range(args.warmup):
        with bench.span("warmup/compile"):
            state, m = step_fn(state, batch(i))
            jax.block_until_ready(m)

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            with bench.span("train_step", sync=None):
                state, m = step_fn(state, batch(args.warmup + i))
            jax.block_until_ready(m)

    print(bench.report())
    print(f"trace written to {args.out} "
          f"(tensorboard --logdir {args.out} -> Profile tab)")


if __name__ == "__main__":
    main()
