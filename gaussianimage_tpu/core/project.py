"""Gaussian projection — the TPU-native equivalent of gsplat's
``project_gaussians_2d`` / ``project_gaussians_2d_scale_rot`` CUDA kernels
(reference call sites: gaussianimage_cholesky.py:77, gaussianimage_rs.py:75).

At the Gaussian counts this workload runs (N <= ~100k) projection is a tiny
elementwise map, so it is pure jnp: XLA fuses it into a single VPU pass and
autodiff gives the analytic backward for free — no Pallas kernel is needed
here (the hot op is rasterization, see ops/rasterize_sum.py).

Returns the same 5-tuple contract as the reference:
``(xys [N,2] px, depths [N], radii [N], conics [N,3], num_tiles_hit [N])``.
``depths`` are zeros (no z in 2D) and ``num_tiles_hit`` counts tile-bbox
overlaps, matching the observable semantics of the CUDA kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gaussianimage_tpu.core.covariance import (
    conic_from_cov2d,
    cov2d_from_cholesky,
    cov2d_from_scale_rot,
    ndc_to_pixel,
    radius_from_cov2d,
)

Projected = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _finish_projection(
    means: jnp.ndarray,
    cov: jnp.ndarray,
    H: int,
    W: int,
    tile_bounds: Tuple[int, int, int],
    block: Tuple[int, int] = (16, 16),
) -> Projected:
    xys = ndc_to_pixel(means, H, W)
    conics = conic_from_cov2d(cov)
    radii = radius_from_cov2d(cov)
    depths = jnp.zeros(means.shape[:-1], dtype=means.dtype)

    # Tile-overlap count: number of BLOCK x BLOCK tiles whose bbox intersects
    # the radius square around the center (performance metadata only).
    bh, bw = block
    tx, ty = tile_bounds[0], tile_bounds[1]
    x0 = jnp.clip(jnp.floor((xys[..., 0] - radii) / bw), 0, tx)
    x1 = jnp.clip(jnp.floor((xys[..., 0] + radii) / bw) + 1, 0, tx)
    y0 = jnp.clip(jnp.floor((xys[..., 1] - radii) / bh), 0, ty)
    y1 = jnp.clip(jnp.floor((xys[..., 1] + radii) / bh) + 1, 0, ty)
    num_tiles_hit = ((x1 - x0) * (y1 - y0)).astype(jnp.int32)
    return xys, depths, radii, conics, num_tiles_hit


def project_gaussians_2d(
    means: jnp.ndarray,
    cholesky: jnp.ndarray,
    H: int,
    W: int,
    tile_bounds: Tuple[int, int, int],
) -> Projected:
    """Project 2D Gaussians with Cholesky covariance parameterization.

    means: [N, 2] in NDC [-1, 1]; cholesky: [N, 3] = (l11, l21, l22), already
    offset by the model's cholesky bound.
    """
    cov = cov2d_from_cholesky(cholesky)
    return _finish_projection(means, cov, H, W, tile_bounds)


def project_gaussians_2d_scale_rot(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    rotation: jnp.ndarray,
    H: int,
    W: int,
    tile_bounds: Tuple[int, int, int],
) -> Projected:
    """Project 2D Gaussians with rotation-scale covariance parameterization.

    means: [N, 2] NDC; scales: [N, 2] (positive); rotation: [N, 1] radians.
    """
    cov = cov2d_from_scale_rot(scales, rotation)
    return _finish_projection(means, cov, H, W, tile_bounds)
