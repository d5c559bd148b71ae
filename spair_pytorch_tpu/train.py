"""Training driver + CLI.

TPU-native counterpart of reference ``train.py:19-105``: run-dir layout,
Adam(1e-4), per-step scalar logging with the reference's tag names, bbox-AP
and count metrics every 5 steps after step 1000, checkpoints every 1000
steps — but as jitted steps over an optional device mesh, with on-device
data generation, real resume (the reference has none), and no per-step
host/device image churn unless asked for.

Usage:
    python -m spair_pytorch_tpu.train --preset paper128 --steps 2000
    python -m spair_pytorch_tpu.train --preset tpu_throughput --mesh data
    python -m spair_pytorch_tpu.train --hdf5 path/to/scattered_mnist.hdf5
"""

from __future__ import annotations

import argparse
import datetime
import os
import time
from typing import Optional

import jax
import numpy as np

from spair_pytorch_tpu.config import PRESETS, SpairConfig
from spair_pytorch_tpu.data import (DataConfig, OnDeviceScatteredDigits,
                                    ScatteredMNISTFile)
from spair_pytorch_tpu.models import forward
from spair_pytorch_tpu.parallel import (create_train_state, make_mesh,
                                        make_train_step, shard_batch,
                                        replicate)
from spair_pytorch_tpu.utils.compile_cache import enable_persistent_cache
from spair_pytorch_tpu.utils.logging import MetricWriter


def make_data(cfg: SpairConfig, hdf5: Optional[str] = None,
              max_objects: Optional[int] = None, seed: int = 0,
              source: str = "device", digits: str = "auto"):
    if max_objects is None:
        max_objects = cfg.max_scene_objects
    if hdf5:
        file = ScatteredMNISTFile(hdf5)

        def epochs():
            while True:
                yield from file.batches(cfg.batch_size)
        return epochs()
    _, ih, iw = cfg.image_shape
    patch = (14, 14) if ih >= 64 else (10, 10)
    dcfg = DataConfig(image_hw=(ih, iw), patch_hw=patch,
                      min_objects=cfg.min_scene_objects,
                      max_objects=max_objects, channels=cfg.n_channels)
    from spair_pytorch_tpu.data import digit_bank
    bank = digit_bank(digits, patch)
    if source == "native":
        from spair_pytorch_tpu.data.native import NativeScatteredDigits
        return NativeScatteredDigits(dcfg, cfg.batch_size, bank=bank,
                                     seed=seed)
    return OnDeviceScatteredDigits(dcfg, cfg.batch_size, bank=bank, seed=seed)


def train(cfg: SpairConfig,
          steps: int = 10000,
          logdir: Optional[str] = None,
          hdf5: Optional[str] = None,
          data_source: str = "device",
          use_mesh: bool = False,
          checkpoint_every: int = 1000,
          metrics_every: int = 5,
          log_images_every: int = 0,
          log_figures_every: int = 0,
          log_flush_every: int = 25,
          halt_on_nan: bool = True,
          resume: bool = True,
          verbose: bool = True,
          digits: str = "auto",
          eval_every: int = 0,
          eval_batches: int = 4,
          steps_per_call: int = 1,
          calibrate_at_end: bool = False):
    if logdir is None:
        # run-dir naming matching reference train.py:19-20:
        # logs_v2/<Mon-DD>-<coolname slug> (plus HMS so same-day runs
        # never collide — the reference relies on slug randomness alone)
        import random
        adjectives = ("amber", "brisk", "calm", "daring", "eager", "fuzzy",
                      "gentle", "hollow", "ivory", "jolly", "keen", "lucid",
                      "mellow", "nimble", "opal", "plucky", "quiet", "rustic",
                      "sunny", "tidy", "vivid", "witty")
        nouns = ("otter", "falcon", "maple", "comet", "harbor", "lantern",
                 "meadow", "pebble", "quill", "ridge", "sparrow", "thicket",
                 "violet", "walnut", "yarrow", "zephyr", "badger", "cinder",
                 "dune", "ember")
        rng = random.Random()
        slug = f"{rng.choice(adjectives)}-{rng.choice(nouns)}"
        stamp = datetime.datetime.now().strftime("%b-%d")
        hms = datetime.datetime.now().strftime("%H%M%S")
        logdir = os.path.join("logs_v2", f"{stamp}-{slug}-{hms}")
    # Bind end-of-run dependencies BEFORE the step loop: round 3 lost a
    # 100k-step run's calibration because the lazy end-of-run import pulled
    # a NEW eval.py into a process whose already-imported metrics module
    # predated it (source was edited mid-run) — the mixed-version call
    # crashed at the very last step. Importing here pins a consistent
    # module set at process start. (Function-level import: eval imports
    # train, so a module-level import would be circular.)
    calibrate_fn = None
    if calibrate_at_end:
        from spair_pytorch_tpu.eval import calibrate as calibrate_fn

    writer = MetricWriter(logdir)
    # persist the exact config so eval/export can reconstruct the run
    # without re-deriving preset+flags (eval.py prefers this file)
    from spair_pytorch_tpu.config import config_to_json
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "config.json"), "w") as f:
        f.write(config_to_json(cfg))

    mesh = make_mesh() if use_mesh else None
    state = create_train_state(cfg)

    ckpt = None
    if checkpoint_every:
        from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
        ckpt = CheckpointManager(os.path.join(logdir, "checkpoints"))
        restored = ckpt.restore(state) if resume else None
        if restored is not None:
            state = restored
            if verbose:
                print(f"resumed from step {int(state.step)}")
    if mesh is not None:
        state = replicate(mesh, state)

    # Fused mode: data generation + train step + detection metrics in ONE
    # jitted dispatch per step (BASELINE config 5's on-device generation).
    # Over the tunneled TPU link each dispatch costs milliseconds of
    # latency, so dispatch count per step is the driver's throughput bound.
    fused = hdf5 is None and data_source == "device"
    if fused:
        import jax.numpy as jnp
        from spair_pytorch_tpu.data import (DataConfig, digit_bank,
                                            resolve_source)
        _, ih, iw = cfg.image_shape
        patch = (14, 14) if ih >= 64 else (10, 10)
        dcfg = DataConfig(image_hw=(ih, iw), patch_hw=patch,
                          min_objects=cfg.min_scene_objects,
                          max_objects=cfg.max_scene_objects,
                          channels=cfg.n_channels)
        src = resolve_source(digits)
        if verbose:
            print(f"digit source: {src}")
        bank = jnp.asarray(digit_bank(src, patch))
        # steps_per_call > 1 folds K steps into one lax.scan dispatch
        # (bit-identical math, stacked per-step metrics) — amortizes the
        # tunnel's per-dispatch latency. Keep logging/checkpoint cadences
        # multiples of K so events land on their exact steps.
        spc = max(1, steps_per_call)
        if spc > 1:
            # mid-window cadence hits would label end-of-window state with a
            # non-round step (breaking `eval --step N`); catch it up front.
            for nm, every in (("checkpoint_every", checkpoint_every),
                              ("eval_every", eval_every),
                              ("log_images_every", log_images_every),
                              ("log_figures_every", log_figures_every)):
                if every and every % spc != 0:
                    raise ValueError(
                        f"{nm}={every} must be a multiple of "
                        f"steps_per_call={spc} (cadence hits must land on "
                        "dispatch boundaries)")
        step_fn = make_train_step(cfg, mesh, datagen=(dcfg, bank),
                                  steps_per_call=spc)
        rem_step_fn = None  # lazily-built remainder-window step
        data = None
    else:
        spc = 1
        step_fn = make_train_step(cfg, mesh, with_detection=True)
        data = iter(make_data(cfg, hdf5, source=data_source, digits=digits))
    eval_forward = jax.jit(
        lambda p, xx, s, r: forward(p, cfg, xx, s, r)[1])
    viz_data = None
    viz_extras_fn = None
    eval_set = None

    def write_scalars(pit, pvals):
        nonlocal last_loss
        # reference cadence for detection metrics: >1000, every 5 steps
        # (train.py:76-82); they are computed in-step, filtered here.
        if not (metrics_every and pit > 1000 and pit % metrics_every == 0):
            pvals = {k: v for k, v in pvals.items()
                     if not k.startswith("accuracy/")}
        writer.scalars(pit, pvals)
        if "losses/total" in pvals:
            last_loss = float(pvals["losses/total"])

    t_last = time.perf_counter()
    images_done = 0
    pending = []  # buffered (step, n, device-scalars) awaiting batched D2H
    last_loss = float("nan")
    it = int(state.step)  # host-side mirror; avoids a device sync per step
    done = 0
    while done < steps:
        if fused:
            if steps - done < spc:
                # remainder window: run exactly the steps asked for rather
                # than overshooting by up to K-1 (one extra compile, only
                # when steps is not a multiple of steps_per_call).
                if rem_step_fn is None or rem_step_fn[0] != steps - done:
                    rem_step_fn = (steps - done,
                                   make_train_step(cfg, mesh,
                                                   datagen=(dcfg, bank),
                                                   steps_per_call=steps
                                                   - done))
                n_sub = rem_step_fn[0]
                state, scalars = rem_step_fn[1](state)
            else:
                state, scalars = step_fn(state)
                n_sub = spc
        else:
            batch = next(data)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            state, scalars = step_fn(state, batch)
            n_sub = 1

        # Buffer per-step scalars ON DEVICE and flush in batches: a D2H
        # transfer over the tunneled TPU link costs ~40 ms regardless of
        # size, so per-step float()s would cap the loop at ~25 steps/s.
        # Every step is still logged (reference cadence, models.py:544-560)
        # — just transferred log_flush_every steps at a time. With
        # steps_per_call > 1 the scalars arrive stacked (K,) per call and
        # are unstacked host-side after the batched transfer.
        pending.append((it, n_sub, scalars))
        if sum(p[1] for p in pending) >= max(1, log_flush_every):
            host = jax.device_get(pending)
            for pit, n, pvals in host:
                if n == 1:
                    write_scalars(pit, pvals)
                else:
                    for j in range(n):
                        write_scalars(pit + j,
                                      {k: v[j] for k, v in pvals.items()})
            pending.clear()
            if halt_on_nan and not np.isfinite(last_loss):
                # the reference crashes via nan_hunter (debug_tools.py:245);
                # we stop cleanly — the last checkpoint predates the NaN, so
                # a resumed run (optionally with debugging enabled) can
                # continue from healthy state.
                print(f"NaN loss at step ~{it}; halting "
                      f"(resume from {logdir}/checkpoints)")
                break

        def window_hits(every, offset=0):
            # does any sub-step in [it, it+n_sub) hit the cadence?
            return bool(every) and any(
                (j + offset) % every == 0 for j in range(it, it + n_sub))

        needs_viz = (window_hits(log_images_every)
                     or window_hits(log_figures_every))
        if needs_viz:
            if viz_data is None:
                viz_data = iter(make_data(cfg, hdf5, seed=4242,
                                          source="device" if fused
                                          else data_source, digits=digits))
            x = next(viz_data)[0]
            aux = eval_forward(state.params, x, state.step, state.rng)

        if window_hits(log_images_every):
            writer.image_pair(it, "SPAIR input_output",
                              np.asarray(x[0]), np.asarray(aux["recon"][0]))

        # renderer-analysis panel cadence: reference debug_tools plots every
        # 50 steps (debug_tools.py:56)
        if window_hits(log_figures_every):
            from spair_pytorch_tpu.utils import viz
            if viz_extras_fn is None:
                from spair_pytorch_tpu.models.render import decode_objects
                from spair_pytorch_tpu.ops.stn import crop_glimpses
                from spair_pytorch_tpu.utils.debug import (
                    generative_grad_views)
                import jax.numpy as jnp

                @jax.jit
                def viz_extras_fn(params, xx, a):
                    b, _, gh, gw = a["z_pres"].shape

                    def flat(t):  # NCHW grid -> (B, N, D)
                        return jnp.transpose(t, (0, 2, 3, 1)).reshape(
                            b, gh * gw, -1)

                    color, alpha, imp = decode_objects(
                        params, cfg, flat(a["z_attr"]), flat(a["z_pres"]),
                        flat(a["z_depth"]))
                    glimpses = crop_glimpses(xx, flat(a["z_where"]),
                                             cfg.object_shape)
                    dec_grad, attr_grad = generative_grad_views(
                        params, cfg, xx, a["z_attr"], a["z_where"],
                        a["z_depth"], a["z_pres"])
                    return dict(color=color, alpha=alpha, importance=imp,
                                glimpses=glimpses, dec_grad=dec_grad,
                                attr_grad=attr_grad)

            lat = {k: aux[k] for k in ("z_attr", "z_where", "z_pres",
                                       "z_depth")}
            host_aux, ex = jax.device_get(
                (dict(lat, recon=aux["recon"]),
                 viz_extras_fn(state.params, x, lat)))
            xnp = np.asarray(x)
            writer.figure(it, "analysis/renderer",
                          viz.render_analysis_figure(
                              xnp, host_aux["recon"], host_aux["z_where"],
                              host_aux["z_pres"], host_aux["z_depth"]))
            # the reference's full debug surface, its tag names
            # (debug_tools.py:104,129,153,218,243)
            writer.figure(it, "renderer_analysis",
                          viz.prerender_components_figure(
                              ex["color"], ex["alpha"], ex["importance"],
                              host_aux["z_where"], host_aux["z_pres"],
                              host_aux["z_depth"], xnp))
            writer.figure(it, "debug_cropped_input_images",
                          viz.glimpse_grid_figure(ex["glimpses"]))
            writer.figure(it, "z_attr/heatmap",
                          viz.attr_stats_figure(host_aux["z_attr"]))
            gh_gw = host_aux["z_pres"].shape[-2:]
            writer.figure(it, "grad_visualization/decoder_out",
                          viz.decoder_grad_figure(ex["dec_grad"], gh_gw))
            writer.figure(it, "grad_visualization/z_attr",
                          viz.attr_stats_figure(ex["attr_grad"]))
            # reference _debug_logging tags (models.py:565-604)
            writer.latent_stats(it, host_aux["z_where"], host_aux["z_pres"],
                                host_aux["z_depth"])

        # held-out evaluation: a FIXED set of scenes from a seed disjoint
        # from the training stream (the reference only ever evaluates on
        # its training batches, train.py:76-82 — this is the corrected
        # protocol, logged under eval/* so both are available).
        if window_hits(eval_every, offset=1):
            if eval_set is None:
                gen = iter(make_data(cfg, hdf5, seed=99999,
                                     source="device" if fused
                                     else data_source, digits=digits))
                eval_set = [next(gen) for _ in range(eval_batches)]
            from spair_pytorch_tpu.eval import evaluate
            held, _, _ = evaluate(cfg, state, batches=len(eval_set),
                                  data=iter(eval_set))
            # label with the state's actual step (end of this dispatch
            # window) — with steps_per_call > 1 the evaluated state is at
            # it + n_sub, not it + 1.
            writer.scalars(it + n_sub,
                           {f"eval/{k}": v for k, v in held.items()
                            if k != "step"})
            if verbose:
                print(f"step {it + n_sub}: eval count_acc "
                      f"{held['count_exact_accuracy']:.3f} ap50 "
                      f"{held['ap_at_50']:.3f}")

        # state.step is already it+1 here; trigger on the POST-step count so
        # checkpoint labels land on round step numbers (step_1000, step_2000)
        # matching the reference's step_N naming and `eval --step N`.
        if ckpt and window_hits(checkpoint_every, offset=1):
            ckpt.save(state)

        images_done += cfg.batch_size * n_sub
        it += n_sub
        done += n_sub
        if verbose and it % 50 < n_sub:
            dt = time.perf_counter() - t_last
            ips = images_done / dt if dt > 0 else 0.0
            print(f"step {it}: loss {last_loss:.2f} ({ips:.1f} img/s)")
            t_last, images_done = time.perf_counter(), 0
    for pit, n, pvals in jax.device_get(pending):
        if n == 1:
            write_scalars(pit, pvals)
        else:
            for j in range(n):
                write_scalars(pit + j, {k: v[j] for k, v in pvals.items()})
    if ckpt:
        ckpt.save(state)
        ckpt.wait()
    calibration_error = None
    if calibrate_at_end and logdir:
        # leave the run serving-ready: sweep the detector presence
        # threshold on held-out scenes and store it next to the checkpoint
        # (serve.py resolves its threshold from calibration.json). Guarded:
        # a failure here must never take the run report with it — the
        # checkpoints and metrics above are already durable, so log the
        # error, finish cleanly, and surface it as a nonzero exit.
        import json
        try:
            # >= 512 scenes: a 256-scene calibration mis-picked the
            # threshold by 0.3 on a shifted score distribution (RESULTS.md
            # count-prior A/B side-observation); the sweep costs seconds
            cal = calibrate_fn(cfg, state,
                               batches=max(eval_batches,
                                           512 // cfg.batch_size),
                               digits=digits)
            with open(os.path.join(logdir, "calibration.json"), "w") as f:
                json.dump(cal, f, indent=2)
            if verbose:
                print(f"calibrated pres_threshold = {cal['pres_threshold']} "
                      f"({cal['scenes']} scenes) -> calibration.json")
        except Exception as e:  # noqa: BLE001 — deliberate catch-all guard
            calibration_error = e
            print(f"calibrate-at-end FAILED ({type(e).__name__}: {e}); "
                  f"checkpoints and metrics are intact under {logdir} — "
                  f"rerun via: python -m spair_pytorch_tpu.eval "
                  f"--logdir {logdir} --calibrate")
    writer.close()
    if calibration_error is not None:
        raise SystemExit(
            f"calibrate-at-end failed: {calibration_error!r} "
            f"(training artifacts under {logdir} are complete)")
    return state


def main(argv=None):
    enable_persistent_cache()  # SPAIR_COMPILE_CACHE=0 opts out
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--logdir", default=None)
    p.add_argument("--hdf5", default=None,
                   help="reference-schema scattered-MNIST file")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel over all visible devices")
    p.add_argument("--data", default="device", choices=["device", "native"],
                   help="on-device jitted generator or native C++ pipeline")
    p.add_argument("--digits", default="auto",
                   choices=["auto", "mnist", "sklearn", "font"],
                   help="digit patch source: local MNIST idx files, "
                        "sklearn's real handwritten digits, or the "
                        "procedural font (auto = best available)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--grad-clip", type=float, default=None,
                   help="global-norm gradient clipping (0/unset = off)")
    p.add_argument("--mode", default=None,
                   choices=["independent", "raster", "wavefront", "rowscan"])
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--eval-every", type=int, default=0,
                   help="evaluate on a fixed held-out scene set every N "
                        "steps (0 = off)")
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--calibrate-at-end", action="store_true",
                   help="after the final checkpoint, sweep the detector "
                        "presence threshold on held-out scenes and write "
                        "<logdir>/calibration.json (serve.py uses it)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="fold K steps into one device dispatch (fused "
                        "datagen mode only; bit-identical math, per-step "
                        "logging preserved). Keep cadences multiples of K.")
    p.add_argument("--render-mode", default=None,
                   choices=[None, "reference", "ordered"],
                   help="compositing semantics: the reference's "
                        "importance-normalized blend, or corrected "
                        "z-depth-ordered alpha-over (overlap-heavy scenes)")
    p.add_argument("--pres-gate", type=float, default=None,
                   help="presence-gate threshold for the compositor "
                        "(cfg.pres_gate_threshold): objects with relaxed "
                        "z_pres below it are skipped. Opt-in speed/quality "
                        "trade — gated objects get no reconstruction "
                        "gradient; A/B before adopting")
    p.add_argument("--render-topk", type=int, default=None,
                   help="ordered-mode compositor: composite only the K "
                        "highest-presence objects (cfg.render_topk). EXACT "
                        "with --pres-gate (zero-alpha objects are over-"
                        "operator identities; a cond falls back to the "
                        "full scan when any image's live count exceeds K) "
                        "— makes ordered compositing scale with live "
                        "objects instead of grid size")
    p.add_argument("--pres-entropy", type=float, default=None,
                   help="weight of the Bernoulli-entropy penalty on the "
                        "relaxed presence probabilities "
                        "(cfg.pres_entropy_weight): pushes borderline "
                        "scores out of the (0.2, 0.8) soft zone — the "
                        "measured cluttered-scene miscount mechanism "
                        "(benchmarks/cluttered_failure_modes.py). Engages "
                        "after the training wheel (step 1000). 0 = off")
    p.add_argument("--count-prior-end", type=float, default=None,
                   help="final annealed count-prior odds (reference: "
                        "0.0125, tuned for 1-6-object scenes; on dense "
                        "cluttered scenes the same pull is hypothesized "
                        "to drive the extreme-overlap merge undercount "
                        "-- see benchmarks/RESULTS.md residual anatomy)")
    p.add_argument("--slots", type=int, default=None,
                   help="objects inferred per grid cell "
                        "(cfg.n_object_slots; 1 = reference parity). "
                        "Model-level lever for the extreme-overlap merge "
                        "failure: two digits whose centers share a cell "
                        "can only ever produce one detection at slots=1")
    p.add_argument("--slot-coupling", default=None,
                   choices=["none", "stick"],
                   help="inter-slot presence coupling for --slots > 1: "
                        "'stick' = ordered stick-breaking (slot k fires "
                        "only if slots <k fire; breaks the permutation "
                        "symmetry that collapsed independent slots, "
                        "RESULTS.md round 4)")
    p.add_argument("--box-prior", default="reference",
                   choices=["reference", "free"],
                   help="'reference': the reference's N(7.0,0.5) h/w-logit "
                        "prior (boxes pinned near the anchor); 'free': "
                        "N(0,1) so boxes can shrink to the object "
                        "(config.free_box_priors)")
    args = p.parse_args(argv)

    overrides = {}
    if args.batch:
        overrides["batch_size"] = args.batch
    if args.mode:
        overrides["inference_mode"] = args.mode
    if args.grad_clip is not None:
        overrides["grad_clip_norm"] = args.grad_clip
    if args.render_mode:
        overrides["render_mode"] = args.render_mode
    if args.pres_gate is not None:
        overrides["pres_gate_threshold"] = args.pres_gate
    if args.render_topk is not None:
        overrides["render_topk"] = args.render_topk
    if args.pres_entropy is not None:
        overrides["pres_entropy_weight"] = args.pres_entropy
    if args.slots is not None:
        overrides["n_object_slots"] = args.slots
    if args.slot_coupling is not None:
        overrides["slot_coupling"] = args.slot_coupling
    if args.box_prior == "free":
        from spair_pytorch_tpu.config import free_box_priors
        overrides["priors"] = free_box_priors()
    if args.count_prior_end is not None:
        import dataclasses

        from spair_pytorch_tpu.config import COUNT_PRIOR
        overrides["count_prior"] = dataclasses.replace(
            COUNT_PRIOR, end=args.count_prior_end)
    cfg = PRESETS[args.preset](**overrides)
    train(cfg, steps=args.steps, logdir=args.logdir, hdf5=args.hdf5,
          data_source=args.data, use_mesh=args.mesh,
          resume=not args.no_resume, digits=args.digits,
          eval_every=args.eval_every, eval_batches=args.eval_batches,
          steps_per_call=args.steps_per_call,
          calibrate_at_end=args.calibrate_at_end)


if __name__ == "__main__":
    main()
