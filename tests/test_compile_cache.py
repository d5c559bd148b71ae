"""Persistent compilation cache (utils/compile_cache.py).

No reference counterpart (torch eager pays no compile step). Verifies the
enable/opt-out/redirect contract and that enabling it actually persists
serialized executables to disk — the on-TPU cold/warm measurement lives in
benchmarks/RESULTS.md ("persistent compilation cache").
"""

import os

import jax
import jax.numpy as jnp
import pytest

from spair_pytorch_tpu.utils.compile_cache import enable_persistent_cache


@pytest.fixture
def restore_cache_config():
    yield
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def test_env_opt_out(monkeypatch):
    monkeypatch.setenv("SPAIR_COMPILE_CACHE", "0")
    assert enable_persistent_cache() is None
    monkeypatch.setenv("SPAIR_COMPILE_CACHE", "off")
    assert enable_persistent_cache() is None


def test_env_redirect(monkeypatch, tmp_path, restore_cache_config):
    target = str(tmp_path / "redirected")
    monkeypatch.setenv("SPAIR_COMPILE_CACHE", target)
    assert enable_persistent_cache() == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_explicit_dir_wins_and_persists_entries(tmp_path, restore_cache_config):
    cache_dir = str(tmp_path / "cache")
    assert enable_persistent_cache(cache_dir, min_compile_secs=0.0) == cache_dir

    # A fresh (unseen) jit must write at least one serialized executable.
    k = jnp.float32(3.0)

    def f(x):
        return jnp.tanh(x @ x.T) * k

    x = jnp.ones((17, 5), jnp.float32)
    jax.jit(f)(x).block_until_ready()
    entries = [os.path.join(r, fn)
               for r, _, fns in os.walk(cache_dir) for fn in fns]
    assert entries, "no cache entries written"
    assert all(os.path.getsize(e) > 0 for e in entries)
