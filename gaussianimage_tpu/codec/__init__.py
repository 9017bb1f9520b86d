from gaussianimage_tpu.codec.quantizers import (
    fake_quantize_half,
    UniformQuantizer,
    UniformQuantizerState,
)
from gaussianimage_tpu.codec.vq import ResidualVQ, ResidualVQState

__all__ = [
    "fake_quantize_half",
    "UniformQuantizer",
    "UniformQuantizerState",
    "ResidualVQ",
    "ResidualVQState",
]
