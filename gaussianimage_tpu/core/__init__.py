from gaussianimage_tpu.core.covariance import (
    cov2d_from_cholesky,
    cov2d_from_scale_rot,
    conic_from_cov2d,
    radius_from_cov2d,
    ndc_to_pixel,
)
from gaussianimage_tpu.core.project import (
    project_gaussians_2d,
    project_gaussians_2d_scale_rot,
)
from gaussianimage_tpu.core.render_ref import render_sum_dense

__all__ = [
    "cov2d_from_cholesky",
    "cov2d_from_scale_rot",
    "conic_from_cov2d",
    "radius_from_cov2d",
    "ndc_to_pixel",
    "project_gaussians_2d",
    "project_gaussians_2d_scale_rot",
    "render_sum_dense",
]
