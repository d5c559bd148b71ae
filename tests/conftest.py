"""Test harness: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh — the
standard JAX substitute for a TPU pod in CI. The environment pins
JAX_PLATFORMS=axon (the TPU tunnel) via sitecustomize, so the env var alone
is not enough; we update jax.config directly before any backend is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against torch f32; default TPU-style bf16 matmul
# passes would dominate the tolerance budget.
jax.config.update("jax_default_matmul_precision", "highest")
