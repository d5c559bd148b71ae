"""Batched-request serving harness for the SPAIR detector.

No reference counterpart (the reference exposes only the training
forward). This is the deployment surface around
``models.infer.make_detector``: requests of arbitrary size are packed
into fixed-shape device batches (one compiled program per bucket — no
recompiles at serving time), detections are thresholded and unpadded per
request, and a simple latency/throughput report is available for capacity
planning.

    server = DetectorServer(cfg, params, batch_sizes=(1, 8, 32))
    dets = server.detect(images)        # (N, C, H, W) any N
    dets[i]["boxes"]   # (k_i, 4) pixel [x0, y0, x1, y1] above threshold
    dets[i]["scores"]  # (k_i,)
    dets[i]["count"]   # int

Measured bucket guidance (one v5e chip, f32 detector, paper128 —
round-5 sweep in benchmarks/RESULTS.md): throughput rises monotonically
through b512 (46k img/s/chip at 11.1 ms/call; b128 34.5k at 3.7 ms;
b256 42.8k at 6.0 ms), latency floor is b32 at 2.35 ms/call. Pick b512
for offline/bulk scoring, b32 for interactive latency.

CLI smoke/benchmark:
    python -m spair_pytorch_tpu.serve --preset paper128 \
        --logdir runs/paper128_real100k --requests 64 --batch 8
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu.config import PRESETS, SpairConfig
from spair_pytorch_tpu.models.infer import make_detector
from spair_pytorch_tpu.utils.compile_cache import enable_persistent_cache


class DetectorServer:
    """Fixed-bucket batched detector with per-request unpadding."""

    def __init__(self, cfg: SpairConfig, params,
                 batch_sizes: Sequence[int] = (1, 8, 32),
                 pres_threshold: float = 0.5,
                 nms_iou: Optional[float] = None):
        self.cfg = cfg
        self.params = params
        self.threshold = pres_threshold
        self.buckets = tuple(sorted(batch_sizes))
        self._fn = make_detector(cfg, pres_threshold, nms_iou=nms_iou)

    def warmup(self):
        """Compile every bucket up front (serving should never pay a
        first-request compile)."""
        c, h, w = self.cfg.image_shape
        for b in self.buckets:
            out = self._fn(self.params, jnp.zeros((b, c, h, w)))
        jax.block_until_ready(out["boxes"])

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def detect(self, images: np.ndarray) -> List[Dict]:
        """images (N, C, H, W) in [0,1] -> N per-request detection dicts."""
        n = images.shape[0]
        out: List[Dict] = []
        i = 0
        while i < n:
            b = self._bucket(n - i)
            take = min(b, n - i)
            chunk = images[i:i + take]
            if take < b:  # pad the final partial batch
                pad = np.zeros((b - take,) + images.shape[1:], images.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            res = self._fn(self.params, jnp.asarray(chunk))
            boxes, scores = jax.device_get((res["boxes"], res["scores"]))
            for j in range(take):
                keep = scores[j] >= self.threshold
                out.append({
                    "boxes": boxes[j][keep],
                    "scores": scores[j][keep],
                    "count": int(keep.sum()),
                })
            i += take
        return out


def _load_calibration(logdir: Optional[str]) -> Optional[dict]:
    if not logdir:
        return None
    import json
    import os
    path = os.path.join(logdir, "calibration.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def resolve_threshold(cli_value: Optional[float], logdir: Optional[str],
                      default: float = 0.5) -> float:
    """Presence-threshold precedence: explicit CLI > the run's stored
    calibration (<logdir>/calibration.json, written by
    ``eval --calibrate``) > 0.5 (the reference operating point)."""
    if cli_value is not None:
        return cli_value
    cal = _load_calibration(logdir)
    if cal is not None:
        return float(cal["pres_threshold"])
    return default


def resolve_nms(cli_value: Optional[float],
                logdir: Optional[str]) -> Optional[float]:
    """NMS precedence: explicit CLI (0 disables) > stored calibration >
    off."""
    if cli_value is not None:
        return None if cli_value == 0 else cli_value
    cal = _load_calibration(logdir)
    if cal is not None:
        return cal.get("nms_iou")
    return None


def main(argv=None):
    enable_persistent_cache()  # SPAIR_COMPILE_CACHE=0 opts out
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--logdir", default=None,
                   help="checkpoint to serve (default: fresh params)")
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--threshold", type=float, default=None,
                   help="presence threshold (default: the run's "
                        "calibration.json if present, else 0.5)")
    p.add_argument("--nms", type=float, default=None,
                   help="greedy NMS IoU threshold (suppresses duplicate "
                        "detections on overlapping scenes; default: the "
                        "run's calibration.json if present, else off; "
                        "pass 0 to force off)")
    p.add_argument("--quantize", default=None, choices=[None, "int8"],
                   help="post-training int8 quantization of every "
                        "linear/conv (ops/quant.py): int8 MXU matmuls + "
                        "halved weight traffic; A/B accuracy with "
                        "benchmarks/int8_serving.py before deploying")
    args = p.parse_args(argv)

    import os

    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import _generate_one
    from spair_pytorch_tpu.parallel import create_train_state

    cfg = PRESETS[args.preset]()
    state = create_train_state(cfg)
    if args.logdir:
        from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
        restored = mgr.restore(state, params_only=True)
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.logdir}")
        state = restored

    params = state.params
    if args.quantize == "int8":
        from spair_pytorch_tpu.ops.quant import quantize_params_int8
        params = quantize_params_int8(params)

    threshold = resolve_threshold(args.threshold, args.logdir)
    nms_iou = resolve_nms(args.nms, args.logdir)
    from_cal = (" (from calibration.json)"
                if args.threshold is None and args.nms is None
                and (threshold != 0.5 or nms_iou is not None) else "")
    print(f"presence threshold {threshold}, nms {nms_iou}{from_cal}")
    server = DetectorServer(cfg, params, batch_sizes=(args.batch,),
                            pres_threshold=threshold, nms_iou=nms_iou)
    server.warmup()

    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects)
    keys = jax.random.split(jax.random.PRNGKey(0), args.requests)
    x, _, counts = jax.vmap(lambda k: _generate_one(k, bank, dcfg))(keys)
    x = np.asarray(x)

    t0 = time.perf_counter()
    dets = server.detect(x)
    dt = time.perf_counter() - t0
    pred = np.array([d["count"] for d in dets])
    true = np.asarray(counts)[:, 0]
    print(f"served {args.requests} requests in {dt * 1e3:.1f} ms "
          f"({args.requests / dt:.0f} img/s, bucket {args.batch})")
    print(f"count accuracy vs generator labels: "
          f"{float((pred == true).mean()):.3f}")


if __name__ == "__main__":
    main()
