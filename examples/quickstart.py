"""Quickstart: train a small SPAIR and visualize detections.

Runs on CPU in a few minutes (or much faster on a TPU). Counterpart of the
reference's notebook walkthroughs (test_notebook.ipynb) as an executable
script.

    python examples/quickstart.py --steps 300 --out /tmp/spair_demo
"""

import argparse
import os

import jax
import numpy as np

from spair_pytorch_tpu.config import small_config
from spair_pytorch_tpu.eval import evaluate
from spair_pytorch_tpu.train import make_data, train
from spair_pytorch_tpu.utils.viz import render_analysis_figure


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--out", default="/tmp/spair_demo")
    args = p.parse_args()

    cfg = small_config(batch_size=16, learning_rate=3e-4)
    state = train(cfg, steps=args.steps, logdir=args.out,
                  checkpoint_every=0, metrics_every=0)

    result, aux, x = evaluate(cfg, state, batches=4,
                              data=make_data(cfg, seed=99))
    print("metrics:", {k: round(v, 4) for k, v in result.items()})

    aux = jax.device_get(aux)
    fig = render_analysis_figure(np.asarray(x), aux["recon"],
                                 aux["z_where"], aux["z_pres"],
                                 aux["z_depth"])
    path = os.path.join(args.out, "analysis.png")
    fig.savefig(path, dpi=120)
    print("wrote", path)


if __name__ == "__main__":
    main()
