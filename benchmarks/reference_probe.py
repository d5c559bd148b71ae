"""Measure the reference PyTorch SPAIR's training throughput on this host.

Runs the UNMODIFIED reference implementation (read-only at /root/reference)
on random data for a few optimizer steps and reports images/sec. The
reference publishes no benchmark numbers (SURVEY.md section 6) and its
dataset was never released, so this measured number is the denominator for
bench.py's vs_baseline. torch is CPU-only in this image; the reference
supports CPU via its default device (reference train.py:27-30).

Usage: python benchmarks/reference_probe.py [--steps 3] [--batch 32]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import contextlib
    import io
    import torch
    from tensorboardX import SummaryWriter

    from spair.models import SPAIR
    from spair import config as cfg

    writer = SummaryWriter("/tmp/ref_probe_logs")
    device = torch.device("cpu")
    torch.manual_seed(3)
    model = SPAIR(cfg.INPUT_IMAGE_SHAPE, writer, device)
    optim = torch.optim.Adam(model.parameters(), lr=1e-4)

    x = torch.rand(args.batch, *cfg.INPUT_IMAGE_SHAPE)

    def step(i):
        optim.zero_grad()
        # silence the reference's per-step loss printing (models.py:545-559)
        with contextlib.redirect_stdout(io.StringIO()):
            loss, out_img, z_where, z_pres = model(x, i)
            loss.backward(retain_graph=True)
        optim.step()
        return float(loss)

    for i in range(args.warmup):
        step(i)
    t0 = time.perf_counter()
    for i in range(args.steps):
        step(args.warmup + i)
    dt = time.perf_counter() - t0

    ips = args.batch * args.steps / dt
    print(json.dumps({
        "impl": "reference-pytorch-cpu",
        "batch": args.batch,
        "steps": args.steps,
        "seconds_per_step": dt / args.steps,
        "images_per_sec": ips,
    }))


if __name__ == "__main__":
    main()
