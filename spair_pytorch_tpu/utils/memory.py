"""Device-memory observability.

No reference counterpart (the reference calls torch.cuda.empty_cache every
step as a band-aid, train.py:92 — SURVEY quirk #9). Reports live HBM usage
per device and the largest live arrays, for debugging memory regressions in
the render/scan paths.
"""

from __future__ import annotations

import jax


def device_memory_stats():
    """{device: stats-dict} where available (TPU runtimes expose
    bytes_in_use / peak_bytes_in_use)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


def live_array_report(top: int = 10) -> str:
    """Largest live jax arrays (host view of what holds HBM)."""
    arrays = sorted(jax.live_arrays(), key=lambda a: -a.nbytes)[:top]
    lines = [f"{a.nbytes / 1e6:10.2f} MB  {a.shape} {a.dtype}"
             for a in arrays]
    total = sum(a.nbytes for a in jax.live_arrays())
    lines.append(f"total live: {total / 1e6:.1f} MB "
                 f"across {len(jax.live_arrays())} arrays")
    return "\n".join(lines)
