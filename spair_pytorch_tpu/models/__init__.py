from spair_pytorch_tpu.models.spair import (  # noqa: F401
    init_params,
    forward,
    loss_and_metrics,
    geometry,
    inference_schedule,
)
from spair_pytorch_tpu.models.kl import independent_kl, count_prior_kl  # noqa: F401
from spair_pytorch_tpu.models.render import render, decode_objects  # noqa: F401
from spair_pytorch_tpu.models.latents import (  # noqa: F401
    cell_step,
    sample_noise,
    freeze_learning,
)
