"""Dense oracle renderer — pure jnp accumulated-summation rasterization.

Computes, for every pixel p and Gaussian i (the blending rule of the paper's
``rasterize_gaussians_sum`` kernel, reference contract at
gaussianimage_cholesky.py:81-82; no depth sort, no transmittance, background
not composited, clamping left to the caller):

    out[p] = sum_i color_i * opacity_i * exp(-0.5 * d^T conic_i d),  d = p - xy_i

This is the *oracle* every Pallas kernel is tested against, and a functional
fallback renderer for CPU tests. Differentiable with jax.grad; memory is kept
bounded by scanning over Gaussian chunks with rematerialization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _pixel_grid(H: int, W: int, dtype) -> jnp.ndarray:
    """[H*W, 2] pixel center coordinates (x, y)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return jnp.stack([xs, ys], axis=-1).reshape(H * W, 2).astype(dtype)


def render_sum_dense(
    xys: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    H: int,
    W: int,
    radii: Optional[jnp.ndarray] = None,
    chunk: int = 1024,
    q_cut: Optional[float] = None,
) -> jnp.ndarray:
    """Render [H, W, C] by dense summation over all Gaussians.

    xys: [N, 2] pixel coords; conics: [N, 3] = (a, b, c); colors: [N, C];
    opacities: [N, 1] or [N]. If ``radii`` is given, contributions beyond the
    radius box are cut off; if ``q_cut`` is given, contributions with
    Mahalanobis q > q_cut are cut off (exactly matching the Pallas kernel's
    3-sigma cutoff when q_cut=9); otherwise the full tail is accumulated.
    """
    N = xys.shape[0]
    C = colors.shape[-1]
    dtype = jnp.promote_types(xys.dtype, jnp.float32)
    opac = opacities.reshape(N, 1).astype(dtype)
    pix = _pixel_grid(H, W, dtype)  # [HW, 2]

    chunk = int(min(chunk, N)) if N > 0 else 1
    pad = (-N) % chunk
    if pad:
        xys = jnp.concatenate([xys, jnp.zeros((pad, 2), xys.dtype)], axis=0)
        conics = jnp.concatenate([conics, jnp.ones((pad, 3), conics.dtype)], axis=0)
        colors = jnp.concatenate([colors, jnp.zeros((pad, C), colors.dtype)], axis=0)
        opac = jnp.concatenate([opac, jnp.zeros((pad, 1), opac.dtype)], axis=0)
        if radii is not None:
            radii = jnp.concatenate([radii, jnp.zeros((pad,), radii.dtype)], axis=0)
    n_chunks = (N + pad) // chunk

    def chunk_contrib(carry, args):
        if radii is None:
            cxys, cconics, ccolors, copac = args
            crad = None
        else:
            cxys, cconics, ccolors, copac, crad = args
        d = pix[:, None, :] - cxys[None, :, :].astype(dtype)  # [HW, chunk, 2]
        dx, dy = d[..., 0], d[..., 1]
        a, b, c = (cconics[:, 0].astype(dtype), cconics[:, 1].astype(dtype),
                   cconics[:, 2].astype(dtype))
        # same q >= 0 clamp as the Pallas kernels (f32 cancellation can go
        # negative for near-degenerate conics, overflowing exp)
        q = jnp.maximum(
            a[None] * dx * dx + 2.0 * b[None] * dx * dy + c[None] * dy * dy,
            0.0)
        w = jnp.exp(-0.5 * q) * copac[:, 0][None]  # [HW, chunk]
        if q_cut is not None:
            w = jnp.where(q <= q_cut, w, 0.0)
        if crad is not None:
            inside = (jnp.abs(dx) <= crad[None]) & (jnp.abs(dy) <= crad[None])
            w = jnp.where(inside, w, 0.0)
        return carry + jnp.dot(w, ccolors.astype(dtype),
                               precision=jax.lax.Precision.HIGHEST), None

    xs = [xys.reshape(n_chunks, chunk, 2), conics.reshape(n_chunks, chunk, 3),
          colors.reshape(n_chunks, chunk, C), opac.reshape(n_chunks, chunk, 1)]
    if radii is not None:
        xs.append(radii.reshape(n_chunks, chunk))

    init = jnp.zeros((H * W, C), dtype)
    out, _ = jax.lax.scan(jax.checkpoint(chunk_contrib), init, tuple(xs))
    return out.reshape(H, W, C)
