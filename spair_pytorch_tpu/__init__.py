"""spair_pytorch_tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of SPAIR.

A from-scratch framework with the capabilities of yonkshi/SPAIR_pytorch
(Crawford & Pineau, AAAI 2019 — "Spatially Invariant Unsupervised Object
Detection with Convolutional Neural Networks"), redesigned for TPU:
batched matmul-based spatial transformers on the MXU, wavefront scans for
the autoregressive lateral-context inference, fused Pallas rendering, and
data-parallel training over a jax.sharding.Mesh.
"""

from spair_pytorch_tpu import config as config  # noqa: F401
from spair_pytorch_tpu.config import (  # noqa: F401
    SpairConfig,
    PRESETS,
    paper_config,
    small_config,
    sequential_config,
    cluttered_config,
    tpu_throughput_config,
)


def __getattr__(name):
    # lazy subpackage access (spair_pytorch_tpu.models / .parallel / .data /
    # .metrics / .utils) without importing jax-heavy modules at package
    # import time
    import importlib
    if name in ("models", "parallel", "data", "metrics", "utils", "train",
                "eval"):
        return importlib.import_module(f"spair_pytorch_tpu.{name}")
    raise AttributeError(f"module 'spair_pytorch_tpu' has no attribute "
                         f"{name!r}")


__version__ = "0.1.0"
