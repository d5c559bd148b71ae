"""Build a reference-schema scattered-digits HDF5 dataset file.

The reference expects ``spair/data/scattered_mnist_128x128_obj14x14.hdf5``
with group 'train/full' holding image/bbox/digit_count (reference
dataloader.py:13-31, train.py:38) — but that file was never published
("Data: Coming soon...", reference README.md:24). This writes one, from the
native C++ generator when available (multithreaded) or the numpy glyph
bank, so BOTH this framework (--hdf5 flag) and the original reference
implementation can train from disk.

Usage:
    python -m spair_pytorch_tpu.data.build_hdf5 \
        --out scattered_mnist_128x128_obj14x14.hdf5 --n 60000
"""

from __future__ import annotations

import argparse

import numpy as np

from spair_pytorch_tpu.data.scattered_mnist import DataConfig


def build(out: str, n: int, dcfg: DataConfig, seed: int = 0,
          group: str = "train/full", chunk: int = 512,
          digits: str = "auto"):
    import h5py

    from spair_pytorch_tpu.data.digits import digit_bank
    bank = digit_bank(digits, dcfg.patch_hw)
    try:
        from spair_pytorch_tpu.data.native import NativeScatteredDigits
        gen = NativeScatteredDigits(dcfg, batch=chunk, bank=bank, seed=seed)
    except Exception:  # no C++ toolchain: jit the on-device generator
        from spair_pytorch_tpu.data.scattered_mnist import (
            OnDeviceScatteredDigits)
        gen = OnDeviceScatteredDigits(dcfg, batch=chunk, bank=bank, seed=seed)

    ih, iw = dcfg.image_hw
    with h5py.File(out, "w") as f:
        g = f.create_group(group)
        d_img = g.create_dataset("image", (n, ih, iw), dtype="f4",
                                 chunks=(min(chunk, n), ih, iw))
        d_bbox = g.create_dataset("bbox", (n, dcfg.max_objects, 4),
                                  dtype="f4")
        d_cnt = g.create_dataset("digit_count", (n, 1), dtype="f4")
        written = 0
        for img, bbox, cnt in gen:
            img, bbox, cnt = map(np.asarray, (img, bbox, cnt))
            take = min(chunk, n - written)
            d_img[written:written + take] = img[:take, 0]
            d_bbox[written:written + take] = bbox[:take]
            d_cnt[written:written + take] = cnt[:take].reshape(-1, 1)
            written += take
            if written >= n:
                break
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=60000)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--patch", type=int, default=14)
    p.add_argument("--min-objects", type=int, default=1)
    p.add_argument("--max-objects", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--digits", default="auto",
                   choices=["auto", "mnist", "sklearn", "font"])
    args = p.parse_args(argv)
    dcfg = DataConfig(image_hw=(args.size, args.size),
                      patch_hw=(args.patch, args.patch),
                      min_objects=args.min_objects,
                      max_objects=args.max_objects)
    out = build(args.out, args.n, dcfg, seed=args.seed, digits=args.digits)
    print(f"wrote {args.n} scenes to {out}")


if __name__ == "__main__":
    main()
