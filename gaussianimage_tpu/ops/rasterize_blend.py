"""Depth-sorted alpha-blend rasterizer — the TPU-native equivalent of
gsplat's 3D ``rasterize_gaussians`` (reference contract at
gaussiansplatting_3d.py:117-118: front-to-back compositing
c += T * alpha * rgb, T *= (1 - alpha), background composited with the final
transmittance, returns (img, alpha)).

Two implementations:

- ``rasterize_gaussians_blend`` (default): Pallas instance-stream kernels
  sharing the sum rasterizer's architecture (ops/rasterize_sum.py): tile-
  sorted instance stream with DEPTH order inside each tile, per-tile
  data-dependent trip counts, packed [N+1, 16] feature rows, one row gather,
  whole-op custom_vjp with a hand-written backward and one segment
  scatter-add. The order-dependent part — transmittance — is carried in LOG
  space: per chunk, exclusive prefix sums of log(1 - alpha) via a
  strictly-triangular matmul give every instance's T exactly (the CUDA
  back-to-front division trick, gsplat's bwd, underflows f32 at ~e^-87;
  log-space does not). Backward walks chunks in REVERSE, reconstructing
  T_k = exp(logT_fin - suffix) and the suffix color sums with the mirrored
  triangular matmul.
- ``rasterize_gaussians_blend_xla``: the pure-XLA scan version (exact
  autodiff through compositing) — kept as the differentiable oracle the
  Pallas kernels are tested against.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianimage_tpu.ops import stream_common as sc
from gaussianimage_tpu.ops.rasterize_sum import (_read_chunk_T as _read_chunk,
                                                 _stream_spec)
from gaussianimage_tpu.ops.tiles import bin_gaussians_per_tile

_C = 8   # padded channels: rgb + T_fin + logT_fin + 3 pad
_FW = 16


class BlendConfig(NamedTuple):
    tile_px: int = 16
    tiles_per_step: int = 8      # tiles per kernel grid step
    block_inst: int = 64         # instances per inner chunk (BK)
    max_tiles_per_gauss: int = 64  # 3DGS gaussians can span 8x8 tiles at 16px
    max_instances: Optional[int] = None  # stream cap (None -> auto from N)
    flat_stream_limit: int = 65536  # flat [I,16] stream below this many
    #   instances; larger scenes use BK-aligned transposed blocks (see
    #   ops/rasterize_sum.py — the flat layout pads lanes 8x in VMEM)
    alpha_clip: float = 0.999
    alpha_min: float = 1.0 / 255.0
    early_stop_T: float = 1e-4  # stop compositing a tile once EVERY pixel's
    #   transmittance falls below this (the CUDA rasterizer's per-pixel
    #   T < eps early-out, done per tile-chunk here so the loop stays
    #   uniform); the forward records how many chunks it consumed and the
    #   backward walks exactly those. 0 disables.
    interpret: Optional[bool] = None
    fused_prep: bool = False  # inference: ONE Pallas pass for projection +
    #   SH + packing + binning keys (ops/splat_prep3d.py) instead of the
    #   [N]-column XLA fusions; flat-stream packed-key regime only
    # XLA-oracle knobs (rasterize_gaussians_blend_xla only)
    max_per_tile: int = 256
    tile_chunk: int = 32


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _tri(bk: int, kind: str):
    """Constant [BK, BK] triangular 0/1 matrices for prefix/suffix sums."""
    r = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 1)
    if kind == "lower_strict":   # (M @ x)[k] = sum_{j<k} x[j]
        m = c < r
    elif kind == "upper_strict":  # (M @ x)[k] = sum_{j>k} x[j]
        m = c > r
    else:
        raise ValueError(kind)
    return m.astype(jnp.bfloat16)


def _tri_dot(m01, b):
    """m01 @ b for an EXACT-in-bf16 0/1 matrix m01 and f32 b: two bf16 MXU
    passes on the split b = hi + lo (hi = bf16(b)), f32 accumulation.

    f32 HIGHEST costs 6 MXU passes and dominated the blend kernels' device
    time (the [BK, BK] x [BK, P] prefix/suffix sums are the kernels' FLOP
    bulk). The 0/1 side loses nothing to bf16; the split side keeps ~17
    mantissa bits, so the per-element error is <= |b| 2^-18 and a
    within-early-stop-range transmittance sum (|logT| <= |log early_stop_T|
    ~ 9.2) carries error < 4e-5 — far inside the 1e-4 oracle-parity
    envelope. Mosaic has no 3-pass Precision.HIGH; this is the manual
    2-pass equivalent specialized to an exact multiplicand."""
    hi = b.astype(jnp.bfloat16)
    lo = (b - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    return (jax.lax.dot_general(m01, hi, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(m01, lo, dims,
                                  preferred_element_type=jnp.float32))


def _alpha_terms(gT, tx0, ty0, X, Y, count, ci, bk, alpha_clip, alpha_min):
    """alpha [BK, P] (clipped/cut/masked), plus intermediates for bwd."""
    gx = (gT[0] - tx0)[:, None]
    gy = (gT[1] - ty0)[:, None]
    a, b, c = gT[2][:, None], gT[3][:, None], gT[4][:, None]
    op = gT[8][:, None]
    dx = X - gx
    dy = Y - gy
    q = jnp.maximum(a * dx * dx + 2.0 * b * dx * dy + c * dy * dy, 0.0)
    slot = ci * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
    live = slot < count
    w = jnp.exp(-0.5 * q)
    raw = op * w
    in_range = live & (raw >= alpha_min) & (raw <= alpha_clip)
    alpha = jnp.where(live & (raw >= alpha_min),
                      jnp.minimum(raw, alpha_clip), 0.0)
    return alpha, in_range, w, q, dx, dy, (a, b, c, op)


def _blend_fwd_kernel(starts_ref, counts_ref, gfeat_ref, out_ref,
                      *, tile_px, tb, bk, tiles_x, alpha_clip, alpha_min,
                      aligned, log_stop):
    P = tile_px * tile_px
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    X = (pidx % tile_px).astype(jnp.float32)
    Y = (pidx // tile_px).astype(jnp.float32)
    Ls = _tri(bk, "lower_strict")
    g0 = pl.program_id(0)

    def tile_body(i, _):
        t = g0 * tb + i
        start = starts_ref[t]
        blk0 = start // bk
        count = counts_ref[t]
        nch = (count + bk - 1) // bk
        tx0 = ((t % tiles_x) * tile_px).astype(jnp.float32)
        ty0 = ((t // tiles_x) * tile_px).astype(jnp.float32)

        def chunk_cond(carry):
            # the CUDA early-out: stop once every pixel's transmittance is
            # below the threshold (later gaussians can only contribute
            # < early_stop_T of their color)
            ci, logT, _ = carry
            return jnp.logical_and(ci < nch, jnp.max(logT) > log_stop)

        def chunk_body(carry):
            ci, logT, acc = carry  # [1, P], [8, P]
            gT = _read_chunk(gfeat_ref, blk0, ci, start + ci * bk, bk,
                             aligned)
            alpha, _, _, _, _, _, _ = _alpha_terms(
                gT, tx0, ty0, X, Y, count, ci, bk, alpha_clip, alpha_min)
            l1m = jnp.log1p(-alpha)  # [BK, P], in [log(1-clip), 0]
            excl = _tri_dot(Ls, l1m)  # prefix sums (exclusive)
            T_k = jnp.exp(logT + excl)
            vis = alpha * T_k  # [BK, P]
            col0, col1, col2 = gT[5][:, None], gT[6][:, None], gT[7][:, None]
            z = jnp.zeros_like(gT[5])[:, None]
            colT = jnp.concatenate(
                [col0, col1, col2, z, z, z, z, z], axis=1).T  # [8, BK]
            acc = acc + jax.lax.dot_general(
                colT, vis, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            logT = logT + jnp.sum(l1m, axis=0, keepdims=True)
            return (ci + 1, logT, acc)

        nch_used, logT, acc = jax.lax.while_loop(
            chunk_cond, chunk_body,
            (jnp.int32(0), jnp.zeros((1, P), jnp.float32),
             jnp.zeros((_C, P), jnp.float32)))
        # rows: 0-2 premultiplied rgb, 3 T_fin, 4 logT_fin (stable bwd),
        # 5 chunks consumed (the backward walks exactly these)
        out_ref[i] = jnp.concatenate(
            [acc[0:3], jnp.exp(logT), logT,
             jnp.full((1, P), nch_used.astype(jnp.float32)),
             jnp.zeros((_C - 6, logT.shape[1]), jnp.float32)], axis=0)
        return 0

    jax.lax.fori_loop(0, tb, tile_body, 0)


def _blend_bwd_kernel(starts_ref, counts_ref, gfeat_ref, out_ref, g_ref,
                      dgfeat_ref, *, tile_px, tb, bk, tiles_x, alpha_clip,
                      alpha_min, aligned, log_stop):
    P = tile_px * tile_px
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    X = (pidx % tile_px).astype(jnp.float32)
    Y = (pidx // tile_px).astype(jnp.float32)
    Us = _tri(bk, "upper_strict")
    g0 = pl.program_id(0)

    @pl.when(g0 == 0)
    def _init():
        dgfeat_ref[:] = jnp.zeros_like(dgfeat_ref)

    def tile_body(i, _):
        t = g0 * tb + i
        start = starts_ref[t]
        blk0 = start // bk
        count = counts_ref[t]
        tx0 = ((t % tiles_x) * tile_px).astype(jnp.float32)
        ty0 = ((t // tiles_x) * tile_px).astype(jnp.float32)
        G = g_ref[i]          # [C, P]: 0-2 d_img, 3 = cot(T_fin)
        logTfin = out_ref[i][4:5]  # [1, P]
        Tfin_cot = G[3:4]     # [1, P]
        # walk exactly the chunks the forward consumed (early stop):
        # logT_fin is THEIR product, and later chunks contributed nothing
        nch = out_ref[i][5, 0].astype(jnp.int32)

        def chunk_body(rci, carry):
            ci = nch - 1 - rci
            logR, S = carry   # suffix log-prod, suffix sum of (G.c) vis
            off = start + ci * bk
            gT = _read_chunk(gfeat_ref, blk0, ci, off, bk, aligned)
            alpha, in_range, w, q, dx, dy, parts = _alpha_terms(
                gT, tx0, ty0, X, Y, count, ci, bk, alpha_clip, alpha_min)
            a, b, c, op = parts
            col0, col1, col2 = gT[5][:, None], gT[6][:, None], gT[7][:, None]
            l1m = jnp.log1p(-alpha)
            # log T_k = logT_fin - (suffix within later chunks) - (suffix
            # incl. self within this chunk); all near-exact sums, no division
            suf_in_chunk = _tri_dot(Us, l1m) + l1m
            logT_k = logTfin - logR - suf_in_chunk
            T_k = jnp.exp(logT_k)
            vis = alpha * T_k
            gdotc = col0 * G[0] + col1 * G[1] + col2 * G[2]  # [BK, P]
            gv = gdotc * vis
            s_k = S + _tri_dot(Us, gv)
            inv1m = jnp.exp(-l1m)  # 1/(1-alpha), bounded by 1/(1-clip)
            Tfin = jnp.exp(logTfin)
            dalpha = gdotc * T_k - (s_k + Tfin_cot * Tfin) * inv1m
            dalpha = jnp.where(in_range, dalpha, 0.0)
            # alpha = op * w in range; w = exp(-0.5 q)
            dop_kp = dalpha * w
            dw = dalpha * op
            dq = jnp.where(q > 0.0, -0.5 * w * dw, 0.0)
            dqdx = dq * dx
            dqdy = dq * dy
            da = jnp.sum(dqdx * dx, axis=1)
            db = 2.0 * jnp.sum(dqdx * dy, axis=1)
            dc = jnp.sum(dqdy * dy, axis=1)
            s_x = jnp.sum(dqdx, axis=1, keepdims=True)
            s_y = jnp.sum(dqdy, axis=1, keepdims=True)
            dgx = (-2.0 * a * s_x - 2.0 * b * s_y)[:, 0]
            dgy = (-2.0 * b * s_x - 2.0 * c * s_y)[:, 0]
            dop = jnp.sum(dop_kp, axis=1)
            # dcol[c,k] = sum_p G[c,p] vis[k,p]
            dcolT = jax.lax.dot_general(
                G, vis, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [C, BK]
            z = jnp.zeros_like(da)
            dgT = jnp.stack([dgx, dgy, da, db, dc,
                             dcolT[0], dcolT[1], dcolT[2],
                             dop, z, z, z, z, z, z, z], axis=0)  # [16, BK]
            live_row = (ci * bk + jax.lax.broadcasted_iota(
                jnp.int32, (1, bk), 1)) < count
            if aligned:
                dgfeat_ref[blk0 + ci] = jnp.where(live_row, dgT, 0.0)
            else:
                dg = jnp.where(live_row, dgT, 0.0).T  # [BK, 16]
                dgfeat_ref[pl.ds(off, bk), :] = (
                    dgfeat_ref[pl.ds(off, bk), :] + dg)
            logR = logR + jnp.sum(l1m, axis=0, keepdims=True)
            S = S + jnp.sum(gv, axis=0, keepdims=True)
            return (logR, S)

        jax.lax.fori_loop(
            0, nch, chunk_body,
            (jnp.zeros((1, P), jnp.float32), jnp.zeros((1, P), jnp.float32)))
        return 0

    jax.lax.fori_loop(0, tb, tile_body, 0)


def _blend_fwd_pallas(static, starts, counts, gfeat):
    (tile_px, TB, BK, tiles_x, T, interpret, H, W, I, a_clip, a_min,
     aligned, log_stop) = static
    P = tile_px * tile_px
    kern = functools.partial(_blend_fwd_kernel, tile_px=tile_px, tb=TB,
                             bk=BK, tiles_x=tiles_x, alpha_clip=a_clip,
                             alpha_min=a_min, aligned=aligned,
                             log_stop=log_stop)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // TB,),
        in_specs=[_stream_spec(I, BK, aligned)],
        out_specs=pl.BlockSpec((TB, _C, P), lambda g, s, c: (g, 0, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, _C, P), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=I * P * 3 * BK // max(BK, 1),
            bytes_accessed=(I * _FW + T * _C * P) * 4,
            transcendentals=2 * I * P,
        ),
    )(starts, counts, gfeat)


def _blend_bwd_pallas(static, starts, counts, gfeat, out_tiled, g):
    (tile_px, TB, BK, tiles_x, T, interpret, H, W, I, a_clip, a_min,
     aligned, log_stop) = static
    P = tile_px * tile_px
    kern = functools.partial(_blend_bwd_kernel, tile_px=tile_px, tb=TB,
                             bk=BK, tiles_x=tiles_x, alpha_clip=a_clip,
                             alpha_min=a_min, aligned=aligned,
                             log_stop=log_stop)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // TB,),
        in_specs=[
            _stream_spec(I, BK, aligned),
            pl.BlockSpec((TB, _C, P), lambda g_, s, c: (g_, 0, 0)),
            pl.BlockSpec((TB, _C, P), lambda g_, s, c: (g_, 0, 0)),
        ],
        out_specs=_stream_spec(I, BK, aligned),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((I // BK, _FW, BK), jnp.float32)
                   if aligned else
                   jax.ShapeDtypeStruct((I + BK, _FW), jnp.float32)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=I * P * 6 * BK // max(BK, 1),
            bytes_accessed=(2 * I * _FW + 2 * T * _C * P) * 4,
            transcendentals=4 * I * P,
        ),
    )(starts, counts, gfeat, out_tiled, g)


# ---------------------------------------------------------------------------
# XLA glue + custom_vjp
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend(static, gids, starts, counts, feat):
    out, _ = _blend_fwd(static, gids, starts, counts, feat)
    return out


def _gather(static, gids, feat):
    BK, aligned = static[2], static[11]
    interpret = static[5]
    if aligned:
        return sc.gather_stream_blocks(gids, feat, BK, interpret=interpret)
    return sc.gather_stream(gids, feat, BK)


def _blend_fwd(static, gids, starts, counts, feat):
    tile_px, tiles_x = static[0], static[3]
    H, W = static[6], static[7]
    gfeat = _gather(static, gids, feat)
    out_tiled = _blend_fwd_pallas(static, starts, counts, gfeat)
    full = sc.untile_channels(out_tiled, tile_px, tiles_x, H, W)
    rgb, tfin = full[:3].transpose(1, 2, 0), full[3]
    return (rgb, tfin), (gids, starts, counts, feat, out_tiled)


def _blend_bwd(static, res, g):
    tile_px, tiles_x, T = static[0], static[3], static[4]
    aligned = static[11]
    H, W = static[6], static[7]
    gids, starts, counts, feat, out_tiled = res
    d_rgb, d_tfin = g
    gfeat = _gather(static, gids, feat)
    G = sc.tile_cotangent(
        jnp.concatenate([d_rgb.astype(jnp.float32).transpose(2, 0, 1),
                         d_tfin.astype(jnp.float32)[None]], axis=0),
        tile_px, tiles_x, T, H, W)
    dgrads = _blend_bwd_pallas(static, starts, counts, gfeat, out_tiled, G)
    if aligned:
        dfeat = sc.scatter_block_grads(dgrads, gids, feat,
                                       interpret=static[5])
    else:
        dfeat = sc.scatter_stream_grads(dgrads, gids, feat)
    return (sc.float0_like(gids), sc.float0_like(starts),
            sc.float0_like(counts), dfeat)


_blend.defvjp(_blend_fwd, _blend_bwd)


def _depth_order(depths: jnp.ndarray) -> jnp.ndarray:
    """Front-to-back order as ONE single-key int32 sort.

    jnp.argsort(stable=True) pair-sorts (key, iota) — ~10x slower on TPU.
    Instead pack a monotonic integer transform of the (positive) depth into
    the high bits and the index into the low bits: ties break by index
    (stable), and depths closer than the dropped low mantissa bits are
    visually interchangeable. Exact argsort when N needs more than 14 bits.
    """
    n = depths.shape[0]
    id_bits = max(int(n - 1).bit_length(), 1)
    if id_bits > 14:
        # keeping fewer than sign+8 exponent+8 mantissa depth bits would
        # reorder genuinely different depths; fall back to exact argsort
        return jnp.argsort(depths, stable=True).astype(jnp.int32)
    d = jnp.maximum(depths.astype(jnp.float32), 0.0)
    # monotonic int transform of a non-negative float: its bit pattern
    key_f = jax.lax.bitcast_convert_type(d, jnp.int32) >> (id_bits + 1)
    key = (key_f << id_bits) | jnp.arange(n, dtype=jnp.int32)
    skey = jnp.sort(key, stable=False)
    return (skey & ((1 << id_bits) - 1)).astype(jnp.int32)


def rasterize_gaussians_blend(
    xys: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    H: int,
    W: int,
    background: Optional[jnp.ndarray] = None,
    config: BlendConfig = BlendConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Front-to-back alpha compositing (Pallas). Returns (img [H,W,3],
    alpha [H,W], aux). Differentiable w.r.t. xys/conics/colors/opacities."""
    cfg = config
    N = xys.shape[0]
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    # Depth ordering is applied ONCE to the packed [N+1, 16] feature rows
    # (one row gather; its VJP scatters gradients back), and the binning
    # geometry is reordered the same way — the stream's ranks then index
    # the ordered rows directly. The alternative (prepare_stream's
    # order= remap) materializes ordered[gids], an [I]-length int gather
    # that measured ~265 us/frame at I=40k on v5e (TPU 1-D gathers pay
    # per element, not per row).
    order = _depth_order(jax.lax.stop_gradient(depths))
    order_pad = jnp.concatenate([order, jnp.asarray([N], jnp.int32)])
    sp = sc.prepare_stream(
        jnp.take(jax.lax.stop_gradient(xys).astype(jnp.float32), order,
                 axis=0),
        jnp.take(jax.lax.stop_gradient(radii).astype(jnp.float32), order,
                 axis=0),
        H, W, cfg)
    gids, starts, counts = sp.gids, sp.starts, sp.counts

    feat = sc.pack_feat(xys, conics, colors, opacities)[order_pad]
    # log-space early-stop threshold; 0 disables (log 0 = -inf: the while
    # condition on max(logT) then never trips before the chunk count does)
    log_stop = (float(np.log(cfg.early_stop_T)) if cfg.early_stop_T > 0
                else float("-inf"))
    static = (cfg.tile_px, cfg.tiles_per_step, cfg.block_inst, sp.tiles_x,
              sp.T, sc.use_interpret(cfg), H, W, sp.I,
              float(cfg.alpha_clip), float(cfg.alpha_min), sp.aligned,
              log_stop)
    rgb, tfin = _blend(static, gids, starts, counts, feat)
    img = rgb + tfin[..., None] * background[None, None]
    alpha = 1.0 - tfin

    T_real = sp.tiles_x * (-(-H // cfg.tile_px))
    aux = {"n_dropped": sp.n_dropped,
           "max_count": counts[:T_real].max()}
    return img, alpha, aux


def rasterize_blend_from_keys_chw(
    feat: jnp.ndarray,
    keys: jnp.ndarray,
    trunc: jnp.ndarray,
    n_total: jnp.ndarray,
    H: int,
    W: int,
    background: Optional[jnp.ndarray],
    config: BlendConfig,
    max_instances: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Inference blend from PRE-PACKED inputs (ops/splat_prep3d.py fused
    prep): ``feat`` [N+1, 16] DEPTH-ORDERED rows, ``keys`` packed
    (tile << id_bits) | rank sort keys. One non-stable sort + compare-reduce
    bounds + stream gather + forward kernel; returns CHANNEL-MAJOR
    (img [3, H, W], alpha [H, W], aux) — no HWC round trip (the model's
    [H,W,3]->[3,H,W] epilogue would cancel it anyway). Not differentiable."""
    cfg = config
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    N = feat.shape[0] - 1
    tp = cfg.tile_px
    TB = cfg.tiles_per_step
    tiles_x = -(-W // tp)
    tiles_y = -(-H // tp)
    T_real = tiles_x * tiles_y
    T = T_real + ((-T_real) % TB)
    I = max_instances
    id_bits = max(int(N - 1).bit_length(), 1)
    assert (T_real + 1) * (1 << id_bits) < 2 ** 31, (
        "rasterize_blend_from_keys_chw requires the packed-key regime")

    keys = jax.lax.optimization_barrier(keys)
    skey = jnp.sort(keys, stable=False)[:I]
    srank = (skey & ((1 << id_bits) - 1)).astype(jnp.int32)
    dead = skey == jnp.int32(2 ** 31 - 1)
    gids = jnp.where(dead, N, srank)
    queries = jnp.arange(T_real + 1, dtype=jnp.int32) << id_bits
    from gaussianimage_tpu.ops.tiles import sorted_window_bounds
    bounds = sorted_window_bounds(skey, queries)  # [T_real+1], <= I
    starts = (jnp.concatenate(
        [bounds, jnp.full((T - T_real,), bounds[-1], jnp.int32)])
        if T > T_real else bounds)
    counts = starts[1:] - starts[:-1]

    log_stop = (float(np.log(cfg.early_stop_T)) if cfg.early_stop_T > 0
                else float("-inf"))
    static = (tp, TB, cfg.block_inst, tiles_x, T, sc.use_interpret(cfg),
              H, W, I, float(cfg.alpha_clip), float(cfg.alpha_min), False,
              log_stop)
    gfeat = sc.gather_stream(gids, feat, cfg.block_inst)
    out_tiled = _blend_fwd_pallas(static, starts, counts, gfeat)
    full = sc.untile_channels(out_tiled, tp, tiles_x, H, W)
    rgb, tfin = full[:3], full[3]
    img = rgb + tfin[None] * background[:, None, None]
    alpha = 1.0 - tfin
    n_dropped = (trunc + jnp.maximum(n_total - I, 0)).astype(jnp.int32)
    aux = {"n_dropped": n_dropped, "max_count": counts[:T_real].max()}
    return img, alpha, aux


# ---------------------------------------------------------------------------
# XLA oracle (exact autodiff through compositing) — used by tests
# ---------------------------------------------------------------------------


def rasterize_gaussians_blend_xla(
    xys: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    H: int,
    W: int,
    background: Optional[jnp.ndarray] = None,
    config: BlendConfig = BlendConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Pure-XLA compositing scan; autodiff gives exact gradients."""
    cfg = config
    tp = cfg.tile_px
    tiles_x, tiles_y = -(-W // tp), -(-H // tp)
    T = tiles_x * tiles_y
    K = cfg.max_per_tile
    P = tp * tp
    N = xys.shape[0]
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    order = jnp.argsort(jax.lax.stop_gradient(depths), stable=True)
    order = order.astype(jnp.int32)
    bins = bin_gaussians_per_tile(
        jax.lax.stop_gradient(xys).astype(jnp.float32),
        jax.lax.stop_gradient(radii).astype(jnp.float32),
        tiles_x, tiles_y, tp, K, order=order,
        max_tiles_per_gauss=cfg.max_tiles_per_gauss)
    table, counts, dropped = bins.index, bins.counts, bins.n_dropped

    opac = opacities.reshape(N)
    tc = cfg.tile_chunk
    pad_t = (-T) % tc
    table_p = jnp.concatenate(
        [table, jnp.full((pad_t, K), -1, jnp.int32)]) if pad_t else table
    n_tchunks = (T + pad_t) // tc

    tile_ids_all = jnp.arange(T + pad_t, dtype=jnp.int32)

    def blend_chunk(_, args):
        tids, tbl = args  # [tc], [tc, K]
        safe = jnp.maximum(tbl, 0)
        g_xy = xys[safe]          # [tc, K, 2]
        g_con = conics[safe]      # [tc, K, 3]
        g_col = colors[safe]      # [tc, K, 3]
        g_op = jnp.where(tbl >= 0, opac[safe], 0.0)  # [tc, K]

        px0 = (tids % tiles_x) * tp
        py0 = (tids // tiles_x) * tp
        pidx = jnp.arange(P, dtype=jnp.int32)
        px = (px0[:, None] + pidx[None] % tp).astype(jnp.float32)  # [tc, P]
        py = (py0[:, None] + pidx[None] // tp).astype(jnp.float32)

        dx = px[:, None, :] - g_xy[..., 0:1]  # [tc, K, P]
        dy = py[:, None, :] - g_xy[..., 1:2]
        q = (g_con[..., 0:1] * dx * dx + 2 * g_con[..., 1:2] * dx * dy
             + g_con[..., 2:3] * dy * dy)
        w = jnp.exp(-0.5 * jnp.maximum(q, 0.0))
        alpha = jnp.minimum(cfg.alpha_clip, g_op[..., None] * w)
        alpha = jnp.where(alpha < cfg.alpha_min, 0.0, alpha)  # [tc, K, P]

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)  # inclusive transmittance products
        T_excl = jnp.concatenate(
            [jnp.ones_like(alpha[:, :1]), cum[:, :-1]], axis=1)
        vis = alpha * T_excl  # [tc, K, P]
        rgb = jnp.einsum("ckp,cke->cpe", vis, g_col,
                         precision=jax.lax.Precision.HIGHEST)
        t_final = cum[:, -1]  # [tc, P]
        img = rgb + t_final[..., None] * background[None, None]
        return None, (img, 1.0 - t_final)

    _, (tiles_img, tiles_alpha) = jax.lax.scan(
        jax.checkpoint(blend_chunk), None,
        (tile_ids_all.reshape(n_tchunks, tc), table_p.reshape(n_tchunks, tc, K)))

    img = (tiles_img.reshape(tiles_y * tiles_x + pad_t, tp, tp, 3)
           [:T].reshape(tiles_y, tiles_x, tp, tp, 3)
           .transpose(0, 2, 1, 3, 4)
           .reshape(tiles_y * tp, tiles_x * tp, 3))[:H, :W]
    alpha = (tiles_alpha.reshape(-1, tp, tp)[:T]
             .reshape(tiles_y, tiles_x, tp, tp)
             .transpose(0, 2, 1, 3)
             .reshape(tiles_y * tp, tiles_x * tp))[:H, :W]
    aux = {"n_dropped": dropped, "max_count": counts.max()}
    return img, alpha, aux
