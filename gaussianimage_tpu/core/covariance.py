"""2D Gaussian covariance math, pure jnp.

Semantics match the reference contract (see SURVEY.md §2.2):

- ``project_gaussians_2d`` consumes lower-triangular Cholesky elements
  ``(l11, l21, l22)`` (reference call site: gaussianimage_cholesky.py:74,77 —
  raw params plus the bound offset ``[0.5, 0, 0.5]``) and treats the resulting
  covariance as being in *pixel* units.
- ``project_gaussians_2d_scale_rot`` consumes per-axis scales ``s in R^2`` and a
  rotation angle theta (reference: gaussianimage_rs.py:54-60,75), with
  ``Sigma = R(theta) diag(s)^2 R(theta)^T``.
- Means live in NDC ``[-1, 1]`` and map to pixel centers with the gsplat
  convention ``px = 0.5 * ((x + 1) * W - 1)``.

All functions are elementwise over the leading N axis and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def ndc_to_pixel(means: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Map NDC means [N, 2] (x, y in [-1, 1]) to pixel coordinates [N, 2].

    Pixel centers sit at integer coordinates 0 .. W-1 / 0 .. H-1; NDC -1 maps to
    -0.5 (left edge of pixel 0) and +1 to W-0.5 (right edge of pixel W-1).
    """
    wh = jnp.asarray([W, H], dtype=means.dtype)
    return 0.5 * ((means + 1.0) * wh - 1.0)


def cov2d_from_cholesky(chol: jnp.ndarray) -> jnp.ndarray:
    """Covariance [N, 3] = (s11, s12, s22) from Cholesky elements [N, 3].

    L = [[l11, 0], [l21, l22]], Sigma = L @ L^T:
      s11 = l11^2, s12 = l11*l21, s22 = l21^2 + l22^2.
    """
    l11, l21, l22 = chol[..., 0], chol[..., 1], chol[..., 2]
    s11 = l11 * l11
    s12 = l11 * l21
    s22 = l21 * l21 + l22 * l22
    return jnp.stack([s11, s12, s22], axis=-1)


def cov2d_from_scale_rot(scales: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Covariance [N, 3] from scales [N, 2] and rotation angle [N] or [N, 1].

    Sigma = R(theta) diag(s)^2 R(theta)^T with
    R = [[cos, -sin], [sin, cos]].
    """
    if theta.ndim == scales.ndim:
        theta = theta[..., 0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    sx2 = scales[..., 0] * scales[..., 0]
    sy2 = scales[..., 1] * scales[..., 1]
    s11 = c * c * sx2 + s * s * sy2
    s12 = c * s * (sx2 - sy2)
    s22 = s * s * sx2 + c * c * sy2
    return jnp.stack([s11, s12, s22], axis=-1)


def conic_from_cov2d(cov: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Conic (inverse covariance) [N, 3] = (a, b, c) from covariance [N, 3].

    q(d) = a*dx^2 + 2*b*dx*dy + c*dy^2 is the Mahalanobis quadratic form.
    eps floors the determinant: quantization-aware training can dequantize a
    Cholesky diagonal to ~0, and with a 1e-12 floor the d(conic)/d(cov)
    chain reaches ~1/det^2 = 1e24 and overflows f32 into NaNs (observed
    after ~2k QAT iters from a converged fit). 1e-6 bounds the chain at
    ~1e12 while leaving any non-degenerate gaussian untouched; max() zeroes
    the det gradient below the floor.
    """
    s11, s12, s22 = cov[..., 0], cov[..., 1], cov[..., 2]
    det = s11 * s22 - s12 * s12
    inv_det = 1.0 / jnp.maximum(det, eps)
    return jnp.stack([s22 * inv_det, -s12 * inv_det, s11 * inv_det], axis=-1)


def radius_from_cov2d(cov: jnp.ndarray, sigma_mult: float = 3.0) -> jnp.ndarray:
    """Conservative pixel radius [N] = ceil(sigma_mult * sqrt(lambda_max)).

    lambda_max is the largest eigenvalue of the 2x2 covariance.
    """
    s11, s12, s22 = cov[..., 0], cov[..., 1], cov[..., 2]
    mid = 0.5 * (s11 + s22)
    det = s11 * s22 - s12 * s12
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    lam_max = jnp.maximum(mid + disc, 1e-12)
    return jnp.ceil(sigma_mult * jnp.sqrt(lam_max))
