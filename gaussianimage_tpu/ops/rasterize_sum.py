"""Accumulated-summation Gaussian rasterizer — the paper's core kernel
(reference contract: gsplat ``rasterize_gaussians_sum``, call site
gaussianimage_cholesky.py:81-82) as Pallas TPU forward + backward kernels with
analytic gradients, wired through ``jax.custom_vjp``.

Design (TPU-first, not a CUDA translation):

- Blending is a commutative sum => no depth sort, no per-tile key sorting, no
  atomics. Work is expressed as flattened (image-tile, gaussian-block) pairs
  (ops/tiles.py); both kernels accumulate into a VMEM-resident output block
  across consecutive grid steps (Pallas output revisiting), so reductions are
  deterministic by construction.
- The Mahalanobis form q = a*dx^2 + 2b*dx*dy + c*dy^2 is evaluated elementwise
  on the VPU in exact pixel-delta coordinates (a global quadratic-form matmul
  would lose ~1e-1 absolute precision in f32 at x ~ 10^3 px). The color
  accumulation out[c,p] = sum_b cm[c,b] * w[b,p] is an MXU matmul.
- Contributions are cut at q > q_cut (default 9 = 3 sigma); since the 3-sigma
  bbox used for tile pairing contains the q<=9 ellipse, the kernel result is
  *exactly* the cutoff-oracle sum — testable to float tolerance against
  core.render_ref.render_sum_dense(q_cut=9).

Layouts (lane-dim friendly): gaussian params gp [N, 8] = (x, y, a, b, c, 0,0,0);
premultiplied colors cm [8, N] = (o*r, o*g, o*b, o, 0..); output image in tiled
layout [num_tiles, 8, tile_px^2].
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

from gaussianimage_tpu.ops.tiles import (
    PairList,
    block_hit_matrix,
    build_pairs,
    spatial_sort_order,
    unpack_col,
    unpack_row,
)

_C = 8  # padded channel count: rgb + alpha + 4 pad (sublane-aligned)


class RasterizeConfig(NamedTuple):
    tile_px: int = 16          # square image tile side (reference BLOCK 16x16)
    block_g: int = 128         # gaussians per block (culling granularity)
    q_cut: float = 9.0         # mahalanobis cutoff (3 sigma)
    pair_factor: int = 24      # hit budget = min(T*nb, factor * num_tiles);
                               # when the exact bound T*nb fits, truncation is
                               # structurally impossible
    spatial_sort: bool = True  # sort gaussians by center tile each call
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


def _pixel_deltas(gp_blk, t, tiles_x, tile_px, P):
    """dx, dy [B, P]: pixel-center minus gaussian-center, exact in f32."""
    tx = (t % tiles_x) * tile_px
    ty = (t // tiles_x) * tile_px
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pidx % tile_px + tx).astype(jnp.float32)
    py = (pidx // tile_px + ty).astype(jnp.float32)
    xi = gp_blk[:, 0:1]
    yi = gp_blk[:, 1:2]
    return px - xi, py - yi


def _weights(gp_blk, dx, dy, q_cut):
    a = gp_blk[:, 2:3]
    b = gp_blk[:, 3:4]
    c = gp_blk[:, 4:5]
    q = a * dx * dx + 2.0 * b * (dx * dy) + c * dy * dy
    return jnp.where(q <= q_cut, jnp.exp(-0.5 * q), 0.0)


def _fwd_kernel(pairs_ref, gp_ref, cm_ref, _init_ref, out_ref,
                *, tiles_x, tile_px, q_cut, col_bits):
    p = pl.program_id(0)
    word = pairs_ref[p]
    valid = (word & 1) != 0
    first = (word & 2) != 0
    P = tile_px * tile_px

    @pl.when(first)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(valid)
    def _():
        t = unpack_row(word, col_bits)
        dx, dy = _pixel_deltas(gp_ref[:], t, tiles_x, tile_px, P)
        w = _weights(gp_ref[:], dx, dy, q_cut)  # [B, P]
        contrib = jax.lax.dot_general(
            cm_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [C, P]
        out_ref[0] = out_ref[0] + contrib


def _bwd_kernel(pairs_ref, gp_ref, cm_ref, g_ref, _init1_ref, _init2_ref,
                dgp_ref, dcm_ref, *, tiles_x, tile_px, q_cut, col_bits):
    p = pl.program_id(0)
    word = pairs_ref[p]
    valid = (word & 1) != 0
    first = (word & 2) != 0
    P = tile_px * tile_px

    @pl.when(first)
    def _():
        dgp_ref[:] = jnp.zeros_like(dgp_ref)
        dcm_ref[:] = jnp.zeros_like(dcm_ref)

    @pl.when(valid)
    def _():
        gp = gp_ref[:]
        t = unpack_col(word, col_bits)
        dx, dy = _pixel_deltas(gp, t, tiles_x, tile_px, P)
        w = _weights(gp, dx, dy, q_cut)  # [B, P]
        G = g_ref[0]  # [C, P]

        # d out[c,p] / d w[b,p] = cm[c,b]  =>  dL/dw = cm^T G
        dw = jax.lax.dot_general(
            cm_ref[:], G, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [B, P]
        dq = -0.5 * w * dw

        a = gp[:, 2:3]
        b = gp[:, 3:4]
        c = gp[:, 4:5]
        d_a = jnp.sum(dq * dx * dx, axis=1, keepdims=True)
        d_b = jnp.sum(2.0 * dq * dx * dy, axis=1, keepdims=True)
        d_c = jnp.sum(dq * dy * dy, axis=1, keepdims=True)
        d_xi = jnp.sum(dq * -(2.0 * a * dx + 2.0 * b * dy), axis=1, keepdims=True)
        d_yi = jnp.sum(dq * -(2.0 * b * dx + 2.0 * c * dy), axis=1, keepdims=True)

        lane = jax.lax.broadcasted_iota(jnp.int32, (gp.shape[0], 8), 1)
        dgp_blk = (d_xi * (lane == 0) + d_yi * (lane == 1) + d_a * (lane == 2)
                   + d_b * (lane == 3) + d_c * (lane == 4))
        dgp_ref[:] = dgp_ref[:] + dgp_blk
        # dL/dcm[c,b] = sum_p G[c,p] w[b,p]
        dcm_ref[:] = dcm_ref[:] + jax.lax.dot_general(
            G, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp core
# ---------------------------------------------------------------------------


def _fwd_pallas(static, gp, cm, pairs):
    tile_px, block_g, q_cut, T, tiles_x, col_bits, _bwd_bits, interpret = static
    P = tile_px * tile_px
    n_pairs = pairs.shape[0]
    kern = functools.partial(_fwd_kernel, tiles_x=tiles_x, tile_px=tile_px,
                             q_cut=q_cut, col_bits=col_bits)
    row = lambda v: v >> (2 + col_bits)
    col = lambda v: (v >> 2) & ((1 << col_bits) - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((block_g, 8), lambda p, pr: (col(pr[p]), 0)),
            pl.BlockSpec((_C, block_g), lambda p, pr: (0, col(pr[p]))),
            # zero buffer aliased to the output so tiles whose pairs were
            # truncated read as 0, never as garbage memory; constant index
            # map => staged once, not per step
            pl.BlockSpec((1, _C, P), lambda p, pr: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _C, P), lambda p, pr: (row(pr[p]), 0, 0)),
    )
    zeros = jnp.zeros((T, _C, P), jnp.float32)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, _C, P), jnp.float32),
        interpret=interpret,
        input_output_aliases={3: 0},  # counts scalar-prefetch args first
        cost_estimate=pl.CostEstimate(
            flops=n_pairs * block_g * P * 12,
            bytes_accessed=n_pairs * (block_g * 8 + _C * block_g + _C * P) * 4,
            transcendentals=n_pairs * block_g * P,
        ),
    )(pairs, gp, cm, zeros)


def _bwd_pallas(static, gp, cm, g, pairs):
    tile_px, block_g, q_cut, T, tiles_x, _fwd_bits, col_bits, interpret = static
    P = tile_px * tile_px
    Npad = gp.shape[0]
    n_pairs = pairs.shape[0]
    kern = functools.partial(_bwd_kernel, tiles_x=tiles_x, tile_px=tile_px,
                             q_cut=q_cut, col_bits=col_bits)
    # bwd pairs: row = gaussian block (output accumulate), col = tile
    row = lambda v: v >> (2 + col_bits)
    col = lambda v: (v >> 2) & ((1 << col_bits) - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((block_g, 8), lambda p, pr: (row(pr[p]), 0)),
            pl.BlockSpec((_C, block_g), lambda p, pr: (0, row(pr[p]))),
            pl.BlockSpec((1, _C, P), lambda p, pr: (col(pr[p]), 0, 0)),
            # zero buffers aliased to the two grad outputs (see _fwd_pallas)
            pl.BlockSpec((block_g, 8), lambda p, pr: (0, 0)),
            pl.BlockSpec((_C, block_g), lambda p, pr: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_g, 8), lambda p, pr: (row(pr[p]), 0)),
            pl.BlockSpec((_C, block_g), lambda p, pr: (0, row(pr[p]))),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Npad, 8), jnp.float32),
            jax.ShapeDtypeStruct((_C, Npad), jnp.float32),
        ],
        interpret=interpret,
        input_output_aliases={4: 0, 5: 1},  # counts scalar-prefetch args first
        cost_estimate=pl.CostEstimate(
            flops=n_pairs * block_g * P * 24,
            bytes_accessed=n_pairs * (block_g * 8 * 2 + _C * block_g * 2 + _C * P) * 4,
            transcendentals=n_pairs * block_g * P,
        ),
    )(pairs, gp, cm, g, jnp.zeros((Npad, 8), jnp.float32),
      jnp.zeros((_C, Npad), jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _rasterize_core(static, gp, cm, fwd_pairs, bwd_pairs):
    return _fwd_pallas(static, gp, cm, fwd_pairs)


def _core_fwd(static, gp, cm, fwd_pairs, bwd_pairs):
    out = _fwd_pallas(static, gp, cm, fwd_pairs)
    return out, (gp, cm, bwd_pairs)


def _core_bwd(static, res, g):
    gp, cm, bwd_pairs = res
    dgp, dcm = _bwd_pallas(static, gp, cm, g, bwd_pairs)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dgp, dcm, f0(bwd_pairs), f0(bwd_pairs))


_rasterize_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------


def _radii_from_conics(conics: jnp.ndarray, sigma_mult: float = 3.0) -> jnp.ndarray:
    """radius = ceil(sigma_mult / sqrt(lambda_min(conic)))."""
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
    alpha = sum of plain weights (colors==1 channel) and aux carries pair-list
    overflow counters. No clamping, no background compositing (reference
    semantics: clamp happens in the model, gaussianimage_cholesky.py:83-84).
    """
    cfg = config
    N = xys.shape[0]
    B = cfg.block_g
    tp = cfg.tile_px
    tiles_x = -(-W // tp)
    tiles_y = -(-H // tp)
    T = tiles_x * tiles_y
    P = tp * tp

    opac = opacities.reshape(N, 1).astype(jnp.float32)
    xys = xys.astype(jnp.float32)
    conics = conics.astype(jnp.float32)
    colors = colors.astype(jnp.float32)
    if radii is None:
        radii = _radii_from_conics(jax.lax.stop_gradient(conics))
    radii = jax.lax.stop_gradient(radii.astype(jnp.float32))
    xys_ng = jax.lax.stop_gradient(xys)

    if cfg.spatial_sort:
        order = spatial_sort_order(xys_ng, jnp.ones((N,), bool), tiles_x,
                                   tiles_y, tp)
        xys, conics, colors, opac = (x[order] for x in (xys, conics, colors, opac))
        radii = radii[order]
        xys_ng = xys_ng[order]

    pad = (-N) % B
    Npad = N + pad
    valid = jnp.arange(Npad) < N

    def padded(x, width):
        return jnp.concatenate(
            [x, jnp.zeros((pad, width), jnp.float32)], axis=0) if pad else x

    gp = jnp.concatenate(
        [padded(xys, 2), padded(conics, 3), jnp.zeros((Npad, 3), jnp.float32)],
        axis=1)  # [Npad, 8]
    cm_rows = jnp.concatenate(
        [padded(colors * opac, 3), padded(opac, 1),
         jnp.zeros((Npad, 4), jnp.float32)], axis=1)  # [Npad, 8]
    cm = cm_rows.T  # [8, Npad]

    xys_pad = padded(xys_ng, 2)
    radii_pad = jnp.concatenate(
        [radii, jnp.zeros((pad,), jnp.float32)]) if pad else radii
    hit = block_hit_matrix(xys_pad, radii_pad, valid, tiles_x, tiles_y, tp, B)

    nb = Npad // B
    # one hit budget for both directions: fwd and bwd lists enumerate the SAME
    # hit set, so sizing them together means they drop together or never. When
    # the exact bound T*nb is affordable, dropping is impossible.
    budget = min(T * nb, T * cfg.pair_factor)
    max_fwd = budget + T    # + per-tile dummies
    max_bwd = budget + nb   # + per-block dummies
    pf = build_pairs(hit, max_fwd)
    pb = build_pairs(hit.T, max_bwd)

    static = (tp, B, float(cfg.q_cut), T, tiles_x, pf.col_bits, pb.col_bits,
              _use_interpret(cfg))
    out_tiled = _rasterize_core(static, gp, cm, pf.packed, pb.packed)

    img_full = (out_tiled
                .reshape(tiles_y, tiles_x, _C, tp, tp)
                .transpose(2, 0, 3, 1, 4)
                .reshape(_C, tiles_y * tp, tiles_x * tp))[:, :H, :W]
    img = img_full[:3].transpose(1, 2, 0)  # [H, W, 3]
    alpha = img_full[3]  # [H, W]
    aux = {"n_dropped_fwd": pf.n_dropped, "n_dropped_bwd": pb.n_dropped,
           "n_pairs_fwd": jnp.minimum(hit.sum() + (hit.sum(1) == 0).sum(), max_fwd),
           "max_pairs_fwd": max_fwd, "max_pairs_bwd": max_bwd}
    return img, alpha, aux
