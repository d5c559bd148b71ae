"""Debug & observability tools.

TPU-native counterparts of reference ``spair/debug_tools.py``:

  * ``nan_hunter`` (reference debug_tools.py:245-271, called at
    models.py:65,108,245): here a ``jax.debug.callback``-based NaN check
    usable INSIDE jitted code, gated by a module flag so production runs
    pay zero cost (the callback is not staged when disabled). For
    whole-program hunting, ``enable_debug_nans`` flips JAX's global
    jax_debug_nans mode.
  * ``benchmark`` scoped timers (reference debug_tools.py:30-40): wall-clock
    deltas with ``block_until_ready`` bracketing, plus a
    ``jax.profiler.TraceAnnotation`` so the spans show up in TPU profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_NAN_HUNTING = False


def enable_nan_hunter(on: bool = True):
    global _NAN_HUNTING
    _NAN_HUNTING = on


def enable_debug_nans(on: bool = True):
    jax.config.update("jax_debug_nans", on)


def nan_hunter(location: str, **tensors):
    """Inside jit: if any watched tensor contains NaN, dump all watched
    values and raise — mirroring the reference's behavior of dumping every
    kwarg then raising AssertionError (debug_tools.py:245-271)."""
    if not _NAN_HUNTING:
        return

    names = list(tensors.keys())

    def _check(*vals):
        bad = [n for n, v in zip(names, vals)
               if np.isnan(np.asarray(v, dtype=np.float64)).any()]
        if bad:
            print(f"============== NaN HUNTER ({location}) ==============")
            for n, v in zip(names, vals):
                print(f"  {n}: {np.asarray(v)!r}")
            raise FloatingPointError(
                f"NaN detected at {location} in {bad}")

    jax.debug.callback(_check, *[jnp.asarray(v) for v in tensors.values()])


class Benchmark:
    """Scoped wall-clock timing (reference debug_tools.py:30-40), with
    device-sync correctness: a span only ends after its outputs are ready."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name}: total {total:.4f}s over {n} "
                         f"(avg {total / n * 1e3:.2f} ms)")
        return "\n".join(lines)
