"""Accumulated-summation Gaussian rasterizer — the paper's core kernel
(reference contract: gsplat ``rasterize_gaussians_sum``, call site
gaussianimage_cholesky.py:81-82) as Pallas TPU forward + backward kernels with
analytic gradients, wired through ``jax.custom_vjp``.

TPU-first design (v2, gather-based — matches the CUDA design's work
complexity while staying MXU-shaped):

- XLA builds per-tile gaussian index lists (ops/tiles.py, sort-free chunked
  binning) and gathers each listed gaussian's *tile-local* quadratic-form
  features psi = (a, c, 2b, gx, gy, g0, 0, 0) such that the Mahalanobis form
  at tile-local pixel (x, y) is q = psi . phi(x, y) with
  phi = (x^2, y^2, xy, x, y, 1, 0, 0). Tile-local coordinates keep every term
  bounded by ~conic * (radius + tile)^2, so the f32 matmul stays accurate
  (global coordinates would lose ~1e-1 absolute in q at x ~ 10^3).
- The kernel processes a batch of tiles per grid step:
    q   = psi [TB*K, 8] @ phi^T [8, P]          (MXU)
    w   = where(q <= q_cut, exp(-0.5 q), 0)      (VPU, the irreducible cost)
    out = cm [TB, 8, K] @ w [TB, K, P] (batched) (MXU)
  Each output tile is written exactly once: no revisiting, no atomics, no
  scalar prefetch — grid order is irrelevant and reductions are deterministic
  by construction.
- Backward has the same grid: per-(tile, slot) gradients d_psi / d_cm are
  computed by the transposed matmuls, and XLA's gather-VJP scatter-adds them
  back onto the N gaussians (deterministic segment reduction — the TPU
  replacement for CUDA atomicAdd).
- Contributions are cut at q > q_cut (default 9 = 3 sigma); since the 3-sigma
  bbox used for binning contains the q<=9 ellipse, the kernel result equals
  the cutoff-oracle sum exactly (core.render_ref.render_sum_dense(q_cut=9)),
  up to per-tile capacity overflow which is zero-filled and reported in aux.

Channel layout: cm rows = (o*r, o*g, o*b, o, 0..0) so channel 3 yields the
accumulated alpha map for free; output image is produced in tiled layout
[T, 8, tile_px^2] and rearranged in XLA.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianimage_tpu.ops.tiles import bin_gaussians_per_tile

_C = 8  # padded channel count: rgb + alpha + 4 pad (sublane-aligned)
_F = 8  # quadratic-form feature count (6 used + 2 pad)


class RasterizeConfig(NamedTuple):
    tile_px: int = 16        # square image tile side (reference BLOCK 16x16)
    max_per_tile: int = 192  # per-tile gaussian capacity (overflow -> aux)
    tiles_per_step: int = 8  # tiles per kernel grid step
    q_cut: float = 9.0       # mahalanobis cutoff (3 sigma)
    gauss_chunk: int = 1024  # binning scan chunk
    interpret: Optional[bool] = None  # None => interpret iff not on TPU


def _use_interpret(cfg: RasterizeConfig) -> bool:
    if cfg.interpret is not None:
        return cfg.interpret
    if os.environ.get("GITPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() not in ("tpu",)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _phi(tile_px: int):
    """Constant [8, P] tile-local pixel features (x^2, y^2, xy, x, y, 1, 0, 0)."""
    P = tile_px * tile_px
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    x = (pidx % tile_px).astype(jnp.float32)
    y = (pidx // tile_px).astype(jnp.float32)
    rows = [x * x, y * y, x * y, x, y, jnp.ones_like(x), jnp.zeros_like(x),
            jnp.zeros_like(x)]
    return jnp.concatenate(rows, axis=0)  # [8, P]


def _weights(psi_flat, tile_px, q_cut):
    phi = _phi(tile_px)
    q = jax.lax.dot_general(psi_flat, phi, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return jnp.where(q <= q_cut, jnp.exp(-0.5 * q), 0.0)  # [TB*K, P]


def _fwd_kernel(psi_ref, cm_ref, out_ref, *, tile_px, q_cut, tb, k):
    P = tile_px * tile_px
    w = _weights(psi_ref[:], tile_px, q_cut).reshape(tb, k, P)
    out_ref[:] = jax.lax.dot_general(
        cm_ref[:], w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [TB, C, P]


def _bwd_kernel(psi_ref, cm_ref, g_ref, dpsi_ref, dcm_ref,
                *, tile_px, q_cut, tb, k):
    P = tile_px * tile_px
    psi = psi_ref[:]
    w = _weights(psi, tile_px, q_cut)  # [TB*K, P]
    w3 = w.reshape(tb, k, P)
    G = g_ref[:]  # [TB, C, P]
    # dL/dw[t,k,p] = sum_c cm[t,c,k] G[t,c,p]
    dw = jax.lax.dot_general(cm_ref[:], G, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # [TB,K,P]
    dq = (-0.5) * w * dw.reshape(tb * k, P)  # cutoff already folded into w
    phi = _phi(tile_px)
    dpsi_ref[:] = jax.lax.dot_general(
        dq, phi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [TB*K, 8]
    dcm_ref[:] = jax.lax.dot_general(
        G, w3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [TB, C, K]


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp core
# ---------------------------------------------------------------------------


def _fwd_pallas(static, psi_flat, cm_tiles):
    tile_px, K, TB, q_cut, T, interpret = static
    P = tile_px * tile_px
    n_steps = T // TB
    kern = functools.partial(_fwd_kernel, tile_px=tile_px, q_cut=q_cut,
                             tb=TB, k=K)
    return pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((TB * K, _F), lambda t: (t, 0)),
            pl.BlockSpec((TB, _C, K), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, _C, P), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, _C, P), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=T * K * P * 2 * (_F + _C),
            bytes_accessed=T * (K * (_F + _C) + _C * P) * 4,
            transcendentals=T * K * P,
        ),
    )(psi_flat, cm_tiles)


def _bwd_pallas(static, psi_flat, cm_tiles, g):
    tile_px, K, TB, q_cut, T, interpret = static
    P = tile_px * tile_px
    n_steps = T // TB
    kern = functools.partial(_bwd_kernel, tile_px=tile_px, q_cut=q_cut,
                             tb=TB, k=K)
    return pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((TB * K, _F), lambda t: (t, 0)),
            pl.BlockSpec((TB, _C, K), lambda t: (t, 0, 0)),
            pl.BlockSpec((TB, _C, P), lambda t: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TB * K, _F), lambda t: (t, 0)),
            pl.BlockSpec((TB, _C, K), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T * K, _F), jnp.float32),
            jax.ShapeDtypeStruct((T, _C, K), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=T * K * P * 4 * (_F + _C),
            bytes_accessed=T * (2 * K * (_F + _C) + _C * P) * 4,
            transcendentals=T * K * P,
        ),
    )(psi_flat, cm_tiles, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rasterize_core(static, psi_flat, cm_tiles):
    return _fwd_pallas(static, psi_flat, cm_tiles)


def _core_fwd(static, psi_flat, cm_tiles):
    return _fwd_pallas(static, psi_flat, cm_tiles), (psi_flat, cm_tiles)


def _core_bwd(static, res, g):
    psi_flat, cm_tiles = res
    return _bwd_pallas(static, psi_flat, cm_tiles, g)


_rasterize_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------


def _radii_from_conics(conics: jnp.ndarray, sigma_mult: float = 3.0) -> jnp.ndarray:
    """radius = ceil(sigma_mult * sqrt(lambda_max(cov))) from the conic."""
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - (a * c - b * b), 0.0))
    lam_min = jnp.maximum(mid - disc, 1e-12)
    return jnp.ceil(sigma_mult / jnp.sqrt(lam_min))


def rasterize_gaussians_sum(
    xys: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    H: int,
    W: int,
    radii: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Render by accumulated summation (no sorting, no compositing).

    xys [N,2] pixel coords, conics [N,3], colors [N,3] (any per-point values),
    opacities [N,1] or [N]. Returns (img [H,W,3], alpha [H,W], aux) where
    alpha is the sum of plain opacity-weighted gaussian weights and aux
    carries the per-tile capacity overflow counter. No clamping, no
    background compositing (reference semantics: the model clamps,
    gaussianimage_cholesky.py:83-84).
    """
    cfg = config
    N = xys.shape[0]
    tp = cfg.tile_px
    K = cfg.max_per_tile
    tiles_x = -(-W // tp)
    tiles_y = -(-H // tp)
    T_real = tiles_x * tiles_y
    TB = cfg.tiles_per_step
    pad_t = (-T_real) % TB
    T = T_real + pad_t
    P = tp * tp

    opac = opacities.reshape(N).astype(jnp.float32)
    xys = xys.astype(jnp.float32)
    conics = conics.astype(jnp.float32)
    colors = colors.astype(jnp.float32)
    if radii is None:
        radii = _radii_from_conics(jax.lax.stop_gradient(conics))
    radii = jax.lax.stop_gradient(radii.astype(jnp.float32))

    bins = bin_gaussians_per_tile(
        jax.lax.stop_gradient(xys), radii, tiles_x, tiles_y, tp, K,
        gauss_chunk=cfg.gauss_chunk)
    idx = bins.index  # [T_real, K], -1 empty
    if pad_t:
        idx = jnp.concatenate(
            [idx, jnp.full((pad_t, K), -1, jnp.int32)], axis=0)
    live = idx >= 0
    safe = jnp.maximum(idx, 0)

    # gather + tile-local quadratic-form features (differentiable; the
    # gather's VJP scatter-adds slot grads back onto the N gaussians)
    g_xy = xys[safe]      # [T, K, 2]
    g_con = conics[safe]  # [T, K, 3]
    g_col = colors[safe]  # [T, K, 3]
    g_op = jnp.where(live, opac[safe], 0.0)  # [T, K]

    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = ((tids % tiles_x) * tp).astype(jnp.float32)
    ty0 = ((tids // tiles_x) * tp).astype(jnp.float32)
    xr = g_xy[..., 0] - tx0[:, None]  # tile-local centers [T, K]
    yr = g_xy[..., 1] - ty0[:, None]
    a, b, c = g_con[..., 0], g_con[..., 1], g_con[..., 2]
    psi = jnp.stack([
        a, c, 2.0 * b,
        -2.0 * (a * xr + b * yr),
        -2.0 * (c * yr + b * xr),
        a * xr * xr + 2.0 * b * xr * yr + c * yr * yr,
        jnp.zeros_like(a), jnp.zeros_like(a),
    ], axis=-1)  # [T, K, 8]
    psi_flat = psi.reshape(T * K, _F)

    cm = jnp.stack([
        g_col[..., 0] * g_op, g_col[..., 1] * g_op, g_col[..., 2] * g_op,
        g_op, jnp.zeros_like(g_op), jnp.zeros_like(g_op),
        jnp.zeros_like(g_op), jnp.zeros_like(g_op),
    ], axis=1)  # [T, 8, K]

    static = (tp, K, TB, float(cfg.q_cut), T, _use_interpret(cfg))
    out_tiled = _rasterize_core(static, psi_flat, cm)  # [T, 8, P]

    img_full = (out_tiled[:T_real]
                .reshape(tiles_y, tiles_x, _C, tp, tp)
                .transpose(2, 0, 3, 1, 4)
                .reshape(_C, tiles_y * tp, tiles_x * tp))[:, :H, :W]
    img = img_full[:3].transpose(1, 2, 0)  # [H, W, 3]
    alpha = img_full[3]  # [H, W]
    aux = {"n_dropped": bins.n_dropped, "max_per_tile_used": bins.counts.max(),
           # legacy keys kept for monitoring call sites
           "n_dropped_fwd": bins.n_dropped, "n_dropped_bwd": bins.n_dropped}
    return img, alpha, aux
