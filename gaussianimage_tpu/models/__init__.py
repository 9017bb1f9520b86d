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


def make_model(model_name: str, **config_kwargs):
    """Factory: model name (reference naming, train.py:103-123) + config."""
    registry = register_models()
    if model_name not in registry:
        raise ValueError(
            f"unknown model {model_name}; options: {sorted(registry)}")
    cfg = ModelConfig(**config_kwargs)
    return registry[model_name](cfg)


__all__ = ["ModelConfig", "TrainState", "GaussianImageCholesky",
           "GaussianImageRS", "register_models", "make_model",
           "MODEL_REGISTRY"]
