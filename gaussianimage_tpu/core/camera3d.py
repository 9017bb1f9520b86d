"""3D Gaussian projection (EWA splatting) — TPU-native equivalent of gsplat's
``project_gaussians`` (reference contract: gaussiansplatting_3d.py:105-106:
means3d, scales, glob_scale, quats, viewmat, projmat, fx, fy, cx, cy, H, W,
tile_bounds -> xys, depths, radii, conics, num_tiles_hit, cov3d).

Pure jnp, differentiable. Standard pipeline: quaternion -> rotation,
Sigma3D = R diag(s)^2 R^T, camera transform, perspective Jacobian,
cov2d = J W Sigma W^T J^T (+0.3 px low-pass on the diagonal, the classic 3DGS
anti-aliasing bias), conic = inv(cov2d), radius = 3 sigma_max.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gaussianimage_tpu.core.covariance import conic_from_cov2d, radius_from_cov2d

# XLA's dot/einsum default on TPU is bf16 accumulation for f32 inputs; at
# camera-space coordinate magnitudes that rounds positions/covariances by
# ~2^-8 relative — visible pixel error and a training-quality tax. Every
# contraction here pins full f32.
_HI = jax.lax.Precision.HIGHEST


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] (w, x, y, z) -> [N, 3, 3]; normalizes internally."""
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    glob_scale: float,
    quats: jnp.ndarray,
    viewmat: jnp.ndarray,
    projmat: jnp.ndarray,  # unused (kept for reference signature parity)
    fx: float, fy: float, cx: float, cy: float,
    H: int, W: int,
    tile_bounds: Tuple[int, int, int],
    clip_near: float = 0.01,
    block: Tuple[int, int] = (16, 16),
) -> Tuple[jnp.ndarray, ...]:
    R_g = quat_to_rotmat(quats)  # [N, 3, 3]
    S = scales * glob_scale
    # Sigma3D = (R S) (R S)^T
    M = R_g * S[:, None, :]
    cov3d = jnp.einsum("nij,nkj->nik", M, M, precision=_HI)

    Rv = viewmat[:3, :3]
    tv = viewmat[:3, 3]
    # camera-space positions [N, 3]
    t = jnp.matmul(means3d, Rv.T, precision=_HI) + tv
    tz = jnp.maximum(t[:, 2], clip_near)
    in_front = t[:, 2] > clip_near

    xys = jnp.stack([fx * t[:, 0] / tz + cx, fy * t[:, 1] / tz + cy], -1)
    depths = t[:, 2]

    # perspective Jacobian [N, 2, 3]
    zeros = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz, zeros, -fx * t[:, 0] / (tz * tz)], -1),
        jnp.stack([zeros, fy / tz, -fy * t[:, 1] / (tz * tz)], -1),
    ], axis=1)
    JW = jnp.einsum("nij,jk->nik", J, Rv, precision=_HI)
    cov2d_m = jnp.einsum("nij,njk,nlk->nil", JW, cov3d, JW, precision=_HI)
    cov2d = jnp.stack([cov2d_m[:, 0, 0] + 0.3, cov2d_m[:, 0, 1],
                       cov2d_m[:, 1, 1] + 0.3], -1)

    conics = conic_from_cov2d(cov2d)
    radii = jnp.where(in_front, radius_from_cov2d(cov2d), 0.0)

    bh, bw = block
    tx, ty = tile_bounds[0], tile_bounds[1]
    x0 = jnp.clip(jnp.floor((xys[:, 0] - radii) / bw), 0, tx)
    x1 = jnp.clip(jnp.floor((xys[:, 0] + radii) / bw) + 1, 0, tx)
    y0 = jnp.clip(jnp.floor((xys[:, 1] - radii) / bh), 0, ty)
    y1 = jnp.clip(jnp.floor((xys[:, 1] + radii) / bh) + 1, 0, ty)
    num_tiles_hit = ((x1 - x0) * (y1 - y0)).astype(jnp.int32)
    num_tiles_hit = jnp.where(in_front, num_tiles_hit, 0)
    return xys, depths, radii, conics, num_tiles_hit, cov3d
