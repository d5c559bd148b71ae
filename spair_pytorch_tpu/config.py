"""Typed configuration for the TPU-native SPAIR framework.

Every hyperparameter of the reference (``/root/reference/spair/config.py:1-81``)
is preserved here as a field with the same default value, but packaged as a
frozen dataclass so that configs are hashable (usable as jit static args),
serializable, and composable into the five benchmark presets from
``BASELINE.json``.

Reference mapping (reference file:line -> field):
  config.py:3      BATCH_SIZE                  -> batch_size
  config.py:4      INPUT_IMAGE_SHAPE           -> image_shape (C, H, W)
  config.py:6      DEFAULT_MLP_TOPOLOGY        -> mlp_hidden
  config.py:7-14   DEFAULT_BACKBONE_TOPOLOGY   -> backbone_topology
  config.py:22     N_BACKBONE_FEATURES         -> n_backbone_features
  config.py:24     N_PASSTHROUGH_FEATURES      -> n_passthrough_features
  config.py:27     N_ATTRIBUTES                -> n_attributes
  config.py:31     N_LOOKBACK                  -> n_lookback
  config.py:33     OBJECT_SHAPE                -> object_shape
  config.py:34     ANCHORBOX_SHAPE             -> anchor_shape
  config.py:38-41  MAX_YX/MIN_YX/MAX_HW/MIN_HW -> box ranges
  config.py:45-52  PRIORS                      -> priors
  config.py:55     VAE_BETA                    -> vae_beta
  config.py:58-62  LATENT_VAR_TRAINING_WHEEL_PARAM -> training_wheel
  config.py:65-69  OBJ_PRES_COUNT_LOG_PRIOR    -> count_prior
  config.py:74-76  OBJ/ALPHA logit scale+bias  -> obj_logit_scale, alpha_*
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Exponential-decay schedule parameters (reference modules.py:191-213)."""

    start: float
    end: float
    decay_rate: float
    decay_step: float
    staircase: bool = False
    log_space: bool = False


# The reference training-wheel schedule is a hard cliff: value 1.0 for steps
# 0..999 (0**0 == 1 under staircase) and 0.0 from step 1000 on
# (reference config.py:58-62 and SURVEY.md quirk #5).
TRAINING_WHEEL = Schedule(start=1.0, end=0.0, decay_rate=0.0,
                          decay_step=1000.0, staircase=True)

# Count-prior log-odds anneal: log(1e6+1e-6)~=13.8 at step 0 down to
# log(0.0125) (reference config.py:65-69).
COUNT_PRIOR = Schedule(start=1000000.0, end=0.0125, decay_rate=0.1,
                       decay_step=1000.0, log_space=True)

# Gaussian priors per latent, {name: (mean, std)} (reference config.py:45-52).
PRIORS: Tuple[Tuple[str, Tuple[float, float]], ...] = (
    ("cy_logit", (0.0, 1.0)),
    ("cx_logit", (0.0, 1.0)),
    ("height_logit", (7.0, 0.5)),
    ("width_logit", (7.0, 0.5)),
    ("attr", (0.0, 1.0)),
    ("depth_logit", (0.0, 1.0)),
)


def free_box_priors(mean: float = 0.0, std: float = 1.0):
    """PRIORS with the h/w-logit prior relaxed to N(mean, std).

    The reference's N(7.0, 0.5) pins sigmoid(h_logit) ~ 0.999 — boxes stay
    anchor-sized (48 px on ~16 px digits), which is why strict AP@0.5 is
    ~0 even at 0.91 count accuracy (benchmarks/RESULTS.md round-2 table).
    N(0, 1) centers boxes at half the anchor with freedom to shrink to the
    digit. Opt-in (`--box-prior free`); the reference prior remains the
    fidelity default."""
    keep = {"height_logit", "width_logit"}
    return tuple((k, ((mean, std) if k in keep else v)) for k, v in PRIORS)

# (filters, kernel_size, stride) per conv layer; a final 1x1 conv to
# n_backbone_features is appended by the backbone builder
# (reference config.py:7-14, modules.py:43-66).
BACKBONE_TOPOLOGY: Tuple[Tuple[int, int, int], ...] = (
    (128, 4, 3),
    (128, 4, 2),
    (128, 4, 2),
    (128, 1, 1),
    (128, 1, 1),
    (128, 1, 1),
)


@dataclasses.dataclass(frozen=True)
class SpairConfig:
    # --- data / shapes ---
    image_shape: Tuple[int, int, int] = (1, 128, 128)  # (C, H, W)
    batch_size: int = 32
    object_shape: Tuple[int, int] = (28, 28)
    anchor_shape: Tuple[int, int] = (48, 48)

    # --- network topology ---
    backbone_topology: Tuple[Tuple[int, int, int], ...] = BACKBONE_TOPOLOGY
    n_backbone_features: int = 100
    n_passthrough_features: int = 100
    n_attributes: int = 50
    n_lookback: int = 1
    mlp_hidden: Tuple[int, ...] = (100, 100)
    encoder_hidden: Tuple[int, ...] = (256, 128)
    decoder_hidden: Tuple[int, ...] = (128, 256)

    # --- box parameterization ---
    max_yx: float = 1.5
    min_yx: float = -0.5
    max_hw: float = 1.0
    min_hw: float = 0.0

    # --- priors / loss ---
    priors: Tuple[Tuple[str, Tuple[float, float]], ...] = PRIORS
    vae_beta: float = 1.0
    training_wheel: Schedule = TRAINING_WHEEL
    count_prior: Schedule = COUNT_PRIOR

    # --- decoder logit conditioning (reference config.py:74-76) ---
    obj_logit_scale: float = 2.0
    alpha_logit_scale: float = 0.1
    alpha_logit_bias: float = 5.0

    # --- TPU-native knobs (no reference counterpart) ---
    # 'independent': no lateral context, every cell in parallel (config 1).
    # 'raster':      lax.scan over cells in raster order (reference-faithful
    #                dataflow, models.py:68).
    # 'wavefront':   scan over d=2h+w wavefronts; identical math, ~4x fewer
    #                sequential steps (see models/spair.py).
    # 'rowscan':     RELAXED context (non-reference): gh row-fronts of
    #                gw-wide lanes; rows above provide real context, the
    #                same-row west neighbor reads the edge element. Changes
    #                the function — opt-in, quality A/B in RESULTS.md.
    inference_mode: str = "wavefront"
    # bfloat16 matmuls on the MXU for the hot paths; params and loss stay f32.
    compute_dtype: str = "float32"
    # 'auto': the fused Pallas kernel on TPU, the XLA chunk-scan compositor
    # elsewhere (the kernel runs in interpret mode off-TPU — correct but
    # slow, so CPU/CI paths default to XLA). 'xla'/'pallas' force a
    # backend. Measured on v5e (benchmarks/render_ab.py, delta-timed):
    # pallas fwd+bwd 4.6 ms vs XLA 8.1 ms at b32/121 objects/128x128 —
    # the windowed in-kernel VJP is what flips it.
    render_backend: str = "auto"
    # 'reference': importance-normalized blend (reference models.py:524-537,
    # SURVEY quirk #7); 'ordered': corrected z-depth-ordered alpha-over.
    render_mode: str = "reference"
    # object appearance codec: 'mlp' (reference object_encoder/decoder,
    # models.py:148-165) or 'conv' — the conv codec the reference sketched
    # but left broken (models.py:606-665), implemented working
    # (ops/convcodec.py).
    object_codec: str = "mlp"
    # scan-free count-prior KL (models/kl.py::count_prior_kl_parallel):
    # mathematically identical, different float rounding; the sequential
    # scan stays the fidelity default.
    count_prior_parallel: bool = False
    # Unroll factor for the sequential lax.scan loops (wavefront/raster
    # inference and the sequential count-prior KL). Identical math; >1
    # amortizes per-iteration while-loop overhead (the dominant device-time
    # cost at batch 32) across unrolled bodies in both the forward and the
    # transposed backward scan.
    scan_unroll: int = 1
    # Rematerialize the inference-scan body: the backward scan then stores
    # only per-step inputs/outputs and replays the (FLOP-trivial) body,
    # instead of stacking every intermediate — at batch 32 the scans are
    # residual-traffic-bound, not compute-bound. Identical math.
    scan_remat: bool = True
    # Remat policy for the scan body: 'full' (default) replays
    # everything; 'dots' saves matmul outputs and replays only
    # elementwise ops (jax.checkpoint_policies.checkpoint_dots);
    # 'names' saves ONLY the tagged small activations (apply_mlp dense
    # outputs + cropped glimpses) and recomputes the rest — in
    # particular the bulky STN interpolation weights/intermediates
    # whose stacked-residual traffic is what makes both 'dots' and
    # remat=False lose (RESULTS.md round-3 remat A/B, round-4 'off'
    # arm). Identical math in every case. A round-3 perf_matrix run
    # measured 'dots' at 5.0 ms/step vs 'full' 8.5 — but the
    # interleaved discriminator (benchmarks/remat_ab.py, both arms
    # alternating in one process) showed dots 8.95 vs full 8.57: the
    # 5.0 was a fast tunnel window, and 'dots' is actually ~4% SLOWER
    # at b32. Measure with remat_ab.py before switching.
    scan_remat_policy: str = "full"
    # Presence-gated compositing (0 = off, reference parity). When > 0,
    # objects with relaxed z_pres below the threshold are skipped by the
    # compositor entirely (Pallas kernel branches past the paste; other
    # backends mask the glimpses). After the count prior engages (~step
    # 1000) only ~1-12 of the 121 cells are live, so the compositor's
    # per-object serial loop — the measured per-image time floor
    # (DESIGN.md "Compositor cost anatomy") — shrinks ~10x. APPROXIMATE
    # for training: gated-out objects receive no reconstruction gradient
    # (KL gradients remain), so presence must re-ignite through the count
    # prior; quality A/B before adopting. Exact for eval/serving renders.
    pres_gate_threshold: float = 0.0
    # Object-chunk size for the XLA compositor scan.
    render_chunk: int = 16
    # Top-K live-object selection for ordered compositing (0 = off).
    # Requires pres_gate_threshold > 0. The over operator is an exact
    # identity for zero-alpha objects (img += T*0*c; T *= 1-0), and the
    # gate zeroes sub-threshold alphas exactly, so compositing only the
    # K highest-presence objects is EXACT in real arithmetic — values
    # and gradients (measured: values bitwise, grads to ~4e-5 rel from
    # compile-level backward reassociation) — as long as every image's
    # live count is <= K; a lax.cond falls back to
    # the full n-object scan otherwise (e.g. the dense training-wheel
    # phase). Makes ordered-mode compositing scale with live objects
    # (~1-12) instead of grid size (121/256), the same lever the Pallas
    # skip gives the reference-mode kernel.
    # Also wired (exactly, den-floor-preserving) into the reference-mode
    # Pallas kernel, but there it is a MEASURED NEGATIVE: the gated
    # kernel already skips dead objects nearly for free, so compaction's
    # gather/scatter-VJP + cond overhead make it ~2x SLOWER at b128
    # (RESULTS.md round 5 "reference-kernel top-K compaction"). Promoted
    # only for ordered mode (cluttered presets).
    render_topk: int = 0
    # objects per block-diagonal chunk in the v3 compositor kernel
    # (render_backend='pallas_v3'; ops/pallas/composite_v3.py)
    render_chunk_k: int = 4
    # Emulate the reference's discarded Self_Attn call (models.py:120):
    # registers the SAGAN-block params AND computes it every forward with
    # the output discarded, exactly like the reference — full param-count
    # and compute-graph parity, zero effect on loss/gradients. Off by
    # default: it is dead compute by the reference's own construction.
    vestigial_self_attn: bool = False

    # Optional Bernoulli-entropy penalty on the relaxed presence
    # probabilities: weight * batch-mean of per-image summed
    # H(p) = -(p log p + (1-p) log(1-p)). No reference counterpart.
    # Motivation (benchmarks/cluttered_failure_modes.py): on cluttered
    # scenes, 65% of miscounted scenes carry a presence score in
    # (0.2, 0.8) vs 31% of all scenes — overlapping digits leave
    # borderline presences that threshold/rounding flips inconsistently.
    # The penalty pushes those scores out of the soft zone. 0 = off
    # (reference parity).
    pres_entropy_weight: float = 0.0

    # Objects inferred per grid cell (1 = reference parity: the reference's
    # one-object-per-cell assumption is structural, models.py:68 — one
    # z_where/z_what/z_depth/z_pres tuple per cell, 12 px pitch per
    # modules.py:68-105). The measured residual failure on cluttered
    # scenes is MERGES at extreme overlap (two digits -> one detection;
    # benchmarks/cluttered_failure_modes.py: 5+-overlap-pair stratum at
    # 0.58-0.60 exact count acc while 0-overlap sits at 0.95+), which a
    # finer grid only partially fixes — two digit centers can share any
    # cell at any pitch. n_object_slots = S gives every cell S independent
    # (box, attr, depth, pres) tuples: slot-specific box-head weights break
    # the symmetry, the encoder/z/obj nets are weight-shared across slots,
    # the lateral-context element carries all S tuples (S*56 dims), and
    # downstream code sees a virtual (gh, gw*S) grid so the renderer, KLs,
    # metrics and detector are unchanged. The count prior's support scales
    # to S*HW slots in raster order (cell-major, slot-minor).
    n_object_slots: int = 1

    # Inter-slot presence coupling (only meaningful for n_object_slots > 1).
    # 'none' = independent slots. The measured failure of independent S=2
    # (RESULTS.md round 4 "n_object_slots=2") is mixture collapse: the
    # slot-to-digit assignment is permutation-symmetric, one slot's
    # presence dies (slot share 0.5%/99.5%) and its KL pressure degrades
    # calibration. 'stick' removes the symmetry with an ordered
    # stick-breaking construction: slot k's effective presence is
    # prod_{j<=k} sigmoid(logit_j) (a later slot can only fire if every
    # earlier slot fires), plus a constant -2 logit offset per later slot
    # so secondaries start off. The coupled probabilities are still valid
    # per-virtual-cell marginals for the count prior; S = 1 is unaffected
    # (cumprod over a singleton axis, offset 0 for slot 0).
    slot_coupling: str = "none"

    # Pack multi-head MLP output layers into one GEMM (ops/mlp.apply_mlp).
    # Measured perf-neutral (RESULTS.md "wavefront-scan levers", arm
    # 'nopack'); kept as a jit-static field so the A/B harness can flip it
    # without a module global invisible to jit cache keys.
    packed_heads: bool = True

    # --- data/scene ---
    # object count range per generated scene (bbox slots); the cluttered
    # preset (BASELINE config 4) uses 9..12
    min_scene_objects: int = 1
    max_scene_objects: int = 6

    # --- training ---
    learning_rate: float = 1e-4
    # optional global-norm gradient clipping (no reference counterpart —
    # the reference trains unclipped and NaN-crashes on loss explosions).
    # Healthy global grad norms measured ~6e4 on the paper config; 1e6
    # only engages during blow-ups. None = off (reference parity).
    grad_clip_norm: float = 0.0  # 0 = disabled
    seed: int = 3  # reference train.py:39

    def __post_init__(self):
        # Fail loudly on typo'd enum-like fields (hand-edited config.json or
        # programmatic construction would otherwise silently train with
        # independent slots; inference_mode already raises at
        # inference_schedule).
        if self.slot_coupling not in ("none", "stick"):
            raise ValueError(
                f"unknown slot_coupling {self.slot_coupling!r}; "
                "expected 'none' or 'stick'")

    @property
    def n_channels(self) -> int:
        return self.image_shape[0]

    @property
    def context_neighbors(self) -> int:
        """Number of lateral-context neighbor cells (reference models.py:26)."""
        return (self.n_lookback * 2 + 1) ** 2 // 2

    @property
    def context_elem_dim(self) -> int:
        """Per-neighbor context vector: box(4)+attr+depth(1)+pres(1),
        per object slot (reference: one slot, 56 dims, models.py:26)."""
        return (4 + self.n_attributes + 1 + 1) * self.n_object_slots

    @property
    def context_dim(self) -> int:
        return self.context_neighbors * self.context_elem_dim


def config_to_json(cfg: SpairConfig) -> str:
    """Serialize a config for run-dir persistence (train writes
    <logdir>/config.json; eval prefers it over CLI reconstruction)."""
    import json
    return json.dumps(dataclasses.asdict(cfg), indent=1)


def config_from_json(text: str) -> SpairConfig:
    """Inverse of config_to_json. JSON turns tuples into lists and nested
    Schedule dataclasses into dicts; coerce both back so the result is the
    same hashable frozen dataclass."""
    import json

    def coerce(v):
        if isinstance(v, list):
            return tuple(coerce(x) for x in v)
        if isinstance(v, dict):  # nested dataclass (Schedule)
            return Schedule(**{k: coerce(x) for k, x in v.items()})
        return v

    return SpairConfig(**{k: coerce(v) for k, v in json.loads(text).items()})


def paper_config(**overrides) -> SpairConfig:
    """BASELINE config 2: 128x128 scattered-MNIST, reference hyperparams."""
    return SpairConfig(**overrides)


def small_config(**overrides) -> SpairConfig:
    """BASELINE config 1: 4x4 grid on 48x48, independent per-cell inference.

    The reference backbone topology (strides 3,2,2 => 12px cells) yields a
    4x4 grid on a 48x48 input with the same receptive-field padding math.
    """
    kw = dict(image_shape=(1, 48, 48), inference_mode="independent",
              anchor_shape=(24, 24), object_shape=(14, 14))
    kw.update(overrides)
    return SpairConfig(**kw)


def sequential_config(**overrides) -> SpairConfig:
    """BASELINE config 3: autoregressive lateral-conditioning scan."""
    kw = dict(inference_mode="raster")
    kw.update(overrides)
    return SpairConfig(**kw)


def cluttered_config(**overrides) -> SpairConfig:
    """BASELINE config 4: cluttered scenes (9+ digits), depth compositing."""
    kw = dict(inference_mode="wavefront", min_scene_objects=9,
              max_scene_objects=12, grad_clip_norm=1e6)
    kw.update(overrides)
    return SpairConfig(**kw)


# Finer-grid backbone for dense scenes: strides (2,2,2) -> 8px cells,
# 16x16 grid (256 cells) on 128x128, receptive field 22px, pads (7,7,7,7)
# (closed-form via ops/backbone.py::grid_geometry). Rationale: SPAIR is
# one-object-per-cell; two digits stacked at high IoU have centers < 12px
# apart and land in the SAME reference-topology cell, forcing a merge.
# The residual cluttered failure mode is exactly those merges and it did
# not respond to prior relief (benchmarks/RESULTS.md count-prior A/B), so
# cell pitch is the model-level lever.
FINE_BACKBONE_TOPOLOGY: Tuple[Tuple[int, int, int], ...] = (
    (128, 4, 2),
    (128, 4, 2),
    (128, 4, 2),
    (128, 1, 1),
    (128, 1, 1),
    (128, 1, 1),
)


def cluttered_fine_config(**overrides) -> SpairConfig:
    """Cluttered scenes on the finer 8px-cell grid (no reference
    counterpart — a capacity variant for extreme-overlap scenes).

    Ships with presence-gated top-K compositing on: at 256 cells the
    ordered compositor's full scan costs 47 ms fwd+bwd vs 7.9 ms for
    gate+topk32 (5.9x, benchmarks/RESULTS.md round-4 "ordered-compositor
    top-K"), and the gate's training-quality parity was established by the
    round-3 50k A/B. Set pres_gate_threshold=0 to get the exact ungated
    semantics back."""
    kw = dict(backbone_topology=FINE_BACKBONE_TOPOLOGY,
              pres_gate_threshold=0.01, render_topk=32)
    kw.update(overrides)
    return cluttered_config(**kw)


def tpu_throughput_config(**overrides) -> SpairConfig:
    """BASELINE config 5: large-batch data-parallel TPU training."""
    kw = dict(batch_size=256, inference_mode="independent",
              compute_dtype="bfloat16", count_prior_parallel=True)
    kw.update(overrides)
    return SpairConfig(**kw)


def quality_config(**overrides) -> SpairConfig:
    """Every measured quality winner in one preset (the recommended
    recipe for dense/overlapping scenes; benchmarks/RESULTS.md):

      * 16x16 fine grid        (calibrated count acc 0.826 -> 0.840)
      * free box priors        (boxes shrink to the ink; AP@0.5 0.995+
                                vs 0.73-class with the anchor-pinned
                                reference prior on cluttered scenes)
      * ordered compositing    (corrected z-depth alpha-over; the
                                measured winner on overlap-heavy scenes)
      * presence-gated top-K   (5.9x compositor time at quality parity)

    Train with --calibrate-at-end so the run ships its detector operating
    point (threshold x NMS calibration added another +0.09 exact count
    accuracy on cluttered scenes at zero training cost). The reference
    contrast: its entire config surface is one --gpu flag (train.py:24-30).
    """
    kw = dict(priors=free_box_priors(), render_mode="ordered")
    kw.update(overrides)
    return cluttered_fine_config(**kw)


PRESETS = {
    "small48": small_config,
    "paper128": paper_config,
    "sequential": sequential_config,
    "cluttered": cluttered_config,
    "cluttered_fine": cluttered_fine_config,
    "tpu_throughput": tpu_throughput_config,
    "quality": quality_config,
}
