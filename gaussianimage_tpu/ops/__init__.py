from gaussianimage_tpu.ops.rasterize_sum import rasterize_gaussians_sum, RasterizeConfig

__all__ = ["rasterize_gaussians_sum", "RasterizeConfig"]
