from gaussianimage_tpu.models.base import ModelConfig, TrainState
from gaussianimage_tpu.models.cholesky import GaussianImageCholesky
from gaussianimage_tpu.models.rs import GaussianImageRS

MODEL_REGISTRY = {}


def register_models():
    """Populate the registry lazily (some variants import heavier deps)."""
    global MODEL_REGISTRY
    from gaussianimage_tpu.models.cholesky import GaussianImageCholesky
    from gaussianimage_tpu.models.rs import GaussianImageRS

    MODEL_REGISTRY.update({
        "GaussianImage_Cholesky": GaussianImageCholesky,
        "GaussianImage_RS": GaussianImageRS,
    })
    try:
        from gaussianimage_tpu.models.cholesky_mask import GaussianImageCholeskyMask
        MODEL_REGISTRY["GaussianImage_Cholesky_wMask"] = GaussianImageCholeskyMask
    except ImportError:
        pass
    try:
        from gaussianimage_tpu.models.gs3d import Gaussian3D
        MODEL_REGISTRY["3DGS"] = Gaussian3D
    except ImportError:
        pass
    return MODEL_REGISTRY


__all__ = ["ModelConfig", "TrainState", "GaussianImageCholesky",
           "GaussianImageRS", "register_models", "MODEL_REGISTRY"]
