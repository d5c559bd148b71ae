from spair_pytorch_tpu.ops.schedules import exponential_decay  # noqa: F401
from spair_pytorch_tpu.ops.math import (  # noqa: F401
    latent_to_mean_std,
    clamped_sigmoid,
    safe_log,
    gaussian_kl,
    bernoulli_kl,
    binary_cross_entropy_sum,
    logistic_noise,
)
from spair_pytorch_tpu.ops.stn import (  # noqa: F401
    crop_glimpses,
    paste_glimpses,
    crop_weights,
    paste_weights,
)
from spair_pytorch_tpu.ops.backbone import (  # noqa: F401
    grid_geometry,
    init_backbone,
    apply_backbone,
)
from spair_pytorch_tpu.ops.mlp import init_mlp, apply_mlp, apply_mlp1  # noqa: F401
