"""Persistent XLA compilation cache for every CLI entry point.

No reference counterpart: torch eager mode (/root/reference/train.py:24-65)
pays no compile step, so the reference has nothing to cache. Under XLA the
first jit of the training step costs 15-40 s on this TPU (compiles are
remote in this environment), and every CLI invocation — train, eval, serve,
bench, profile, export — pays it again from scratch. JAX's persistent
compilation cache keys serialized executables on (HLO, compile options,
backend) under a directory, so repeat invocations of the same configuration
skip straight to execution.

Measured on the real TPU (benchmarks/RESULTS.md "persistent compilation
cache"): see that section for the cold/warm numbers and the axon-backend
serialization verdict before relying on warm-start latency.

Opt out (or redirect) with the ``SPAIR_COMPILE_CACHE`` env var:
``SPAIR_COMPILE_CACHE=0`` disables, any other value is used as the cache
directory. Errors stay non-fatal (``jax_raise_persistent_cache_errors``
remains False): a backend whose executables can't be serialized degrades
to the uncached behavior instead of crashing the run.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "spair_pytorch_tpu", "jax_cache")

_OFF_VALUES = ("0", "off", "false", "none", "")


def enable_persistent_cache(cache_dir: str | None = None,
                            *, min_compile_secs: float = 1.0) -> str | None:
    """Enable JAX's on-disk compilation cache; returns the directory in use.

    Call before the first jit executes (any time at CLI startup is fine).
    ``cache_dir=None`` resolves ``SPAIR_COMPILE_CACHE`` (0/off/false
    disables; a path overrides) and falls back to
    ``~/.cache/spair_pytorch_tpu/jax_cache``. Only compiles slower than
    ``min_compile_secs`` are persisted, so trivial test-sized jits don't
    churn the cache with thousands of tiny entries.
    """
    env = os.environ.get("SPAIR_COMPILE_CACHE")
    if cache_dir is None:
        if env is not None and env.strip().lower() in _OFF_VALUES:
            return None
        cache_dir = env if env else _DEFAULT_DIR

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # Cache every sufficiently slow compile regardless of entry size.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
