from spair_pytorch_tpu.data.scattered_mnist import (  # noqa: F401
    DataConfig,
    OnDeviceScatteredDigits,
    ScatteredMNISTFile,
    generate_batch,
    glyph_bank,
)
from spair_pytorch_tpu.data.digits import (  # noqa: F401
    digit_bank,
    find_mnist_file,
    load_mnist_idx,
    mnist_bank,
    resolve_source,
    sklearn_digit_bank,
)
