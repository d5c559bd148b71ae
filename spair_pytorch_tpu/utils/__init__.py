from spair_pytorch_tpu.utils.logging import MetricWriter  # noqa: F401
from spair_pytorch_tpu.utils.debug import (  # noqa: F401
    Benchmark,
    enable_debug_nans,
    enable_nan_hunter,
    nan_hunter,
)
