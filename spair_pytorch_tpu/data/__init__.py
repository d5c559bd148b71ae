from spair_pytorch_tpu.data.scattered_mnist import (  # noqa: F401
    DataConfig,
    OnDeviceScatteredDigits,
    ScatteredMNISTFile,
    generate_batch,
    glyph_bank,
)
