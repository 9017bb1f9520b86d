"""Accumulated-summation Gaussian rasterizer — the paper's core kernel
(reference contract: gsplat ``rasterize_gaussians_sum``, call site
gaussianimage_cholesky.py:81-82) as Pallas TPU forward + backward kernels with
analytic gradients, wired through ``jax.custom_vjp``.

TPU-first design (v3, packed-gather + whole-op custom VJP):

- XLA builds per-tile gaussian index lists (ops/tiles.py: instance expansion,
  one packed int32 sort, searchsorted, gather — ~0.1 ms/frame at 10k points).
- All per-gaussian quantities are packed into ONE [N, 16] feature matrix and
  gathered per (tile, slot) in a single row gather [T, K, 16]. Packing
  matters: separate narrow gathers compile to XLA's serialized 1-D
  scoped-memory gather path (~2 ms each, plus a process-wide dispatch
  slowdown on the axon runtime), while the 16-wide row gather stays on the
  fast vectorized path (~0.03 ms).
- The gathered rows are turned into tile-local quadratic-form features
  psi = (a, c, 2b, gx, gy, g0, 0, 0) such that the Mahalanobis form at
  tile-local pixel (x, y) is q = psi . phi(x, y) with
  phi = (x^2, y^2, xy, x, y, 1, 0, 0). Tile-local coordinates keep every
  term bounded by ~conic * (radius + tile)^2 so the f32 matmul stays
  accurate (global coordinates would lose ~1e-1 absolute in q at x ~ 10^3).
- The kernel processes a batch of tiles per grid step:
    q   = psi [TB*K, 8] @ phi^T [8, P]          (MXU)
    w   = where(q <= q_cut, exp(-0.5 q), 0)      (VPU, the irreducible cost)
    out = cm [TB, 8, K] @ w [TB, K, P] (batched) (MXU)
  Each output tile is written exactly once: no revisiting, no atomics —
  grid order is irrelevant and reductions are deterministic by construction.
- custom_vjp wraps the WHOLE rasterize (gathers + kernel + untiling), not
  just the pallas call: backward recomputes the cheap gather, runs the
  transposed-matmul pallas kernel for per-slot gradients, applies the
  analytic slot->parameter chain rule, and scatter-adds slot grads onto the
  N gaussians with one segment-sum (the TPU replacement for CUDA atomicAdd;
  deterministic).
- Contributions are cut at q > q_cut (default 9 = 3 sigma); since the
  3-sigma bbox used for binning contains the q<=9 ellipse, the kernel result
  equals the cutoff-oracle sum exactly
  (core.render_ref.render_sum_dense(q_cut=9)), up to per-tile capacity
  overflow which is zero-filled and reported in aux.

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

_C = 8   # padded channel count: rgb + alpha + 4 pad (sublane-aligned)
_F = 8   # quadratic-form feature count (6 used + 2 pad)
_FW = 16  # packed per-gaussian feature width (9 used + 7 pad, lane-friendly)


class RasterizeConfig(NamedTuple):
    tile_px: int = 16        # square image tile side (reference BLOCK 16x16)
    max_per_tile: int = 192  # per-tile gaussian capacity (overflow -> aux)
    tiles_per_step: int = 8  # tiles per kernel grid step
    q_cut: float = 9.0       # mahalanobis cutoff (3 sigma)
    max_tiles_per_gauss: int = 64  # per-gaussian binning instance cap
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
    w = _weights(psi_ref[:].reshape(tb * k, _F), tile_px, q_cut).reshape(
        tb, k, P)
    out_ref[:] = jax.lax.dot_general(
        cm_ref[:], w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [TB, C, P]


def _bwd_kernel(psi_ref, cm_ref, g_ref, dpsi_ref, dcm_ref,
                *, tile_px, q_cut, tb, k):
    P = tile_px * tile_px
    psi = psi_ref[:].reshape(tb * k, _F)
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
        precision=jax.lax.Precision.HIGHEST).reshape(tb, k, _F)
    dcm_ref[:] = jax.lax.dot_general(
        G, w3, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [TB, C, K]


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
            pl.BlockSpec((TB, K, _F), lambda t: (t, 0, 0)),
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
            pl.BlockSpec((TB, K, _F), lambda t: (t, 0, 0)),
            pl.BlockSpec((TB, _C, K), lambda t: (t, 0, 0)),
            pl.BlockSpec((TB, _C, P), lambda t: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TB, K, _F), lambda t: (t, 0, 0)),
            pl.BlockSpec((TB, _C, K), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, K, _F), jnp.float32),
            jax.ShapeDtypeStruct((T, _C, K), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=T * K * P * 4 * (_F + _C),
            bytes_accessed=T * (2 * K * (_F + _C) + _C * P) * 4,
            transcendentals=T * K * P,
        ),
    )(psi_flat, cm_tiles, g)


# ---------------------------------------------------------------------------
# packed gather + tile features (shared by fwd and bwd recompute)
# ---------------------------------------------------------------------------


def _grid_geom(static):
    tile_px, K, TB, q_cut, interpret, H, W = static
    tiles_x = -(-W // tile_px)
    tiles_y = -(-H // tile_px)
    T_real = tiles_x * tiles_y
    T = T_real + ((-T_real) % TB)
    return tiles_x, tiles_y, T_real, T


def _slot_features(static, idx, feat):
    """Gather packed rows and build (psi [T*K, 8], cm [T, 8, K], slot geom)."""
    tile_px, K, TB, q_cut, interpret, H, W = static
    tiles_x, tiles_y, T_real, T = _grid_geom(static)
    live = idx >= 0
    safe = jnp.maximum(idx, 0)
    g = feat[safe]  # [T, K, 16] — ONE wide row gather (fast path)
    gx, gy = g[..., 0], g[..., 1]
    a, b, c = g[..., 2], g[..., 3], g[..., 4]
    col = g[..., 5:8]
    op = jnp.where(live, g[..., 8], 0.0)

    tids = jnp.arange(T, dtype=jnp.int32)
    tx0 = ((tids % tiles_x) * tile_px).astype(jnp.float32)
    ty0 = ((tids // tiles_x) * tile_px).astype(jnp.float32)
    xr = gx - tx0[:, None]  # tile-local centers [T, K]
    yr = gy - ty0[:, None]

    psi = jnp.stack([
        a, c, 2.0 * b,
        -2.0 * (a * xr + b * yr),
        -2.0 * (c * yr + b * xr),
        a * xr * xr + 2.0 * b * xr * yr + c * yr * yr,
        jnp.zeros_like(a), jnp.zeros_like(a),
    ], axis=-1)  # [T, K, 8]
    z = jnp.zeros_like(op)
    cm = jnp.stack([col[..., 0] * op, col[..., 1] * op, col[..., 2] * op,
                    op, z, z, z, z], axis=1)  # [T, 8, K]
    geom = (live, safe, a, b, c, col, op, xr, yr)
    return psi, cm, geom  # psi [T, K, 8] (kept 3-D: a flat reshape here
    # propagates up through XLA and turns the row gathers into slow 1-D ones)


def _pack_feat(xys, conics, colors, opac):
    N = xys.shape[0]
    return jnp.concatenate([
        xys.astype(jnp.float32),
        conics.astype(jnp.float32),
        colors.astype(jnp.float32),
        opac.reshape(N, 1).astype(jnp.float32),
        jnp.zeros((N, _FW - 9), jnp.float32),
    ], axis=1)  # [N, 16]


def _untile(static, out_tiled):
    tile_px, K, TB, q_cut, interpret, H, W = static
    tiles_x, tiles_y, T_real, T = _grid_geom(static)
    tp = tile_px
    img_full = (out_tiled[:T_real]
                .reshape(tiles_y, tiles_x, _C, tp, tp)
                .transpose(2, 0, 3, 1, 4)
                .reshape(_C, tiles_y * tp, tiles_x * tp))[:, :H, :W]
    return img_full[:3].transpose(1, 2, 0), img_full[3]  # img [H,W,3], alpha


def _tile_cotangent(static, d_img, d_alpha):
    """Inverse of _untile: scatter (d_img, d_alpha) into [T, 8, P] tiles."""
    tile_px, K, TB, q_cut, interpret, H, W = static
    tiles_x, tiles_y, T_real, T = _grid_geom(static)
    tp = tile_px
    Hp, Wp = tiles_y * tp, tiles_x * tp
    buf = jnp.zeros((_C, Hp, Wp), jnp.float32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.concatenate([d_img.transpose(2, 0, 1),
                              d_alpha[None]], axis=0), (0, 0, 0))
    G = (buf.reshape(_C, tiles_y, tp, tiles_x, tp)
         .transpose(1, 3, 0, 2, 4)
         .reshape(T_real, _C, tp * tp))
    if T != T_real:
        G = jnp.concatenate(
            [G, jnp.zeros((T - T_real, _C, tp * tp), jnp.float32)], axis=0)
    return G


# ---------------------------------------------------------------------------
# custom_vjp over the whole rasterize
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster(static, idx, feat):
    out, _ = _raster_fwd(static, idx, feat)
    return out


def _raster_fwd(static, idx, feat):
    tile_px, K, TB, q_cut, interpret, H, W = static
    _, _, _, T = _grid_geom(static)
    psi, cm, _ = _slot_features(static, idx, feat)
    kstatic = (tile_px, K, TB, q_cut, T, interpret)
    out_tiled = _fwd_pallas(kstatic, psi, cm)  # [T, 8, P]
    img, alpha = _untile(static, out_tiled)
    return (img, alpha), (idx, feat)


def _raster_bwd(static, res, g):
    idx, feat = res
    d_img, d_alpha = g
    tile_px, K, TB, q_cut, interpret, H, W = static
    _, _, _, T = _grid_geom(static)
    N = feat.shape[0]

    psi, cm, geom = _slot_features(static, idx, feat)  # cheap recompute
    live, safe, a, b, c, col, op, xr, yr = geom
    G = _tile_cotangent(static, d_img.astype(jnp.float32),
                        d_alpha.astype(jnp.float32))
    kstatic = (tile_px, K, TB, q_cut, T, interpret)
    dpsi, dcm = _bwd_pallas(kstatic, psi, cm, G)
    d0, d1, d2 = dpsi[..., 0], dpsi[..., 1], dpsi[..., 2]
    d3, d4, d5 = dpsi[..., 3], dpsi[..., 4], dpsi[..., 5]

    # analytic slot -> parameter chain rule (dead slots: cm = 0 => dpsi = 0;
    # dcolors scale by op = 0; dop masked by live explicitly)
    da = d0 - 2.0 * xr * d3 + xr * xr * d5
    db = 2.0 * d2 - 2.0 * yr * d3 - 2.0 * xr * d4 + 2.0 * xr * yr * d5
    dc = d1 - 2.0 * yr * d4 + yr * yr * d5
    dgx = -2.0 * a * d3 - 2.0 * b * d4 + (2.0 * a * xr + 2.0 * b * yr) * d5
    dgy = -2.0 * b * d3 - 2.0 * c * d4 + (2.0 * b * xr + 2.0 * c * yr) * d5
    dcol0 = dcm[:, 0, :] * op
    dcol1 = dcm[:, 1, :] * op
    dcol2 = dcm[:, 2, :] * op
    dop = jnp.where(live, dcm[:, 0, :] * col[..., 0]
                    + dcm[:, 1, :] * col[..., 1]
                    + dcm[:, 2, :] * col[..., 2] + dcm[:, 3, :], 0.0)

    z = jnp.zeros_like(dop)
    dslots = jnp.stack([dgx, dgy, da, db, dc, dcol0, dcol1, dcol2, dop,
                        z, z, z, z, z, z, z], axis=-1)  # [T, K, 16]
    dslots = jnp.where(live[..., None], dslots, 0.0)
    dfeat = jnp.zeros((N, _FW), jnp.float32).at[safe].add(dslots)
    d_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return d_idx, dfeat


_raster.defvjp(_raster_fwd, _raster_bwd)


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
    tp = cfg.tile_px
    K = cfg.max_per_tile
    tiles_x = -(-W // tp)
    tiles_y = -(-H // tp)
    T_real = tiles_x * tiles_y
    TB = cfg.tiles_per_step

    if radii is None:
        radii = _radii_from_conics(jax.lax.stop_gradient(conics))
    radii = jax.lax.stop_gradient(radii.astype(jnp.float32))

    bins = bin_gaussians_per_tile(
        jax.lax.stop_gradient(xys).astype(jnp.float32), radii,
        tiles_x, tiles_y, tp, K, max_tiles_per_gauss=cfg.max_tiles_per_gauss)
    idx = bins.index  # [T_real, K], -1 empty
    pad_t = (-T_real) % TB
    if pad_t:
        idx = jnp.concatenate(
            [idx, jnp.full((pad_t, K), -1, jnp.int32)], axis=0)

    feat = _pack_feat(xys, conics, colors, opacities)
    static = (tp, K, TB, float(cfg.q_cut), _use_interpret(cfg), H, W)
    img, alpha = _raster(static, idx, feat)

    aux = {"n_dropped": bins.n_dropped, "max_per_tile_used": bins.counts.max(),
           # legacy keys kept for monitoring call sites
           "n_dropped_fwd": bins.n_dropped, "n_dropped_bwd": bins.n_dropped}
    return img, alpha, aux
