"""Accumulated-summation Gaussian rasterizer — the paper's core kernel
(reference contract: gsplat ``rasterize_gaussians_sum``, call site
gaussianimage_cholesky.py:81-82) as Pallas TPU forward + backward kernels with
analytic gradients, wired through ``jax.custom_vjp``.

TPU-first design (v4, instance-stream kernel — the CUDA pipeline's shape,
re-derived for a sequential-grid vector machine):

- XLA builds a tile-sorted instance stream (ops/tiles.py): expand each
  gaussian into the tiles overlapped by its EXACT anisotropic bbox
  (rx = sqrt(q_cut*cov_xx), ry = sqrt(q_cut*cov_yy) — strictly tighter than
  the 3-sigma circle, same rendered pixels), ONE packed-int32 non-stable
  sort, unrolled-searchsorted window bounds per tile. No scatter, no
  histogram. The per-gaussian span cap adapts to the stream budget
  (stream_common.prepare_stream) so the sort is O(3 * stream cap).
- ONE row gather feat[N+1, 16] -> gfeat[I, 16] puts every instance's packed
  features (xy, conic, PREMULTIPLIED colors o*rgb, opacity) in stream
  order; rows 5..8 are the kernel's color matrix directly, and the
  premult chain rule to raw colors/opacity lives in pack_feat's VJP. The
  zero row at index N absorbs dead slots. All other per-slot work happens
  INSIDE the kernel — XLA-side per-slot elementwise/stack ops compile to
  [T*K, 1]-shaped fusions with 1/128 lane utilization (~2.5 ms/frame
  measured on v5e), which is why v3 was memory-glue-bound.
- The kernel (PrefetchScalarGridSpec, per-tile window bounds in SMEM) walks
  each tile's [starts[t], starts[t+1]) window with a DATA-DEPENDENT
  fori_loop trip count: work is proportional to the instances that actually
  exist, not to a per-tile capacity. Per chunk of BK instances:
    q[BK, P] = a dx^2 + 2b dx dy + c dy^2 on tile-local offsets (VPU; no
               cancellation — dx, dy are tile-small)
    w  = where(q <= q_cut & live, exp(-0.5 q), 0)     (VPU)
    acc[4, P] += cm^T [4, BK] . w [BK, P]  (MXU, contraction BK)
- No sorting by depth, no atomics: the sum is commutative, each output tile
  is written once, per-instance gradients go to disjoint stream rows, and
  the one segment scatter-add back onto the N gaussians is a deterministic
  XLA reduction (the TPU replacement for CUDA atomicAdd).
- custom_vjp wraps the WHOLE rasterize: backward re-gathers gfeat (cheap),
  runs the mirrored kernel (transposed matmuls), applies the analytic
  slot->parameter chain rule in-kernel, writes per-instance grads to the
  stream, and one .at[gids].add scatters them onto the gaussians.
- Contributions are cut at q > q_cut (default 9 = 3 sigma); the 3-sigma
  binning bbox contains the q<=9 ellipse, so the kernel equals the
  cutoff-oracle sum (core.render_ref.render_sum_dense(q_cut=9)) exactly,
  up to instance-stream overflow which is reported in aux.

Channel layout: cm rows = (o*r, o*g, o*b, o) so channel 3 yields the
accumulated alpha map for free; the image is produced in tiled layout
[T, 4, tile_px^2] and rearranged in XLA.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussianimage_tpu.ops import stream_common as sc

_C = 4   # output channel count: rgb + alpha (half the HBM traffic of the
#   sublane-aligned 8; Mosaic pads the 4-sublane tiles in VMEM but the HBM
#   image/cotangent buffers stay compact)
_F = 8   # quadratic-form feature count (6 used + 2 pad)
_FW = 16  # packed per-gaussian feature width (9 used + 7 pad, lane-friendly)


class RasterizeConfig(NamedTuple):
    tile_px: int = 32        # square image tile side (32 sweeps ~15% faster
    #   than the reference's 16 on v5e: fewer tiles/chunks, same math)
    tiles_per_step: int = 8  # tiles per kernel grid step
    block_inst: int = 64     # instances processed per inner-loop chunk (BK)
    q_cut: float = 9.0       # mahalanobis cutoff (3 sigma)
    max_tiles_per_gauss: int = 25  # per-gaussian binning instance cap
    max_instances: Optional[int] = None  # stream cap (None -> auto from N)
    flat_stream_limit: int = 65536  # use the flat [I,16] stream below this
    #   many instances (fastest glue); larger scenes switch to BK-aligned
    #   transposed blocks whose VMEM footprint is exact (the flat layout
    #   pads 16 -> 128 lanes, 8x, and stops fitting around ~50k gaussians)
    interpret: Optional[bool] = None  # None => interpret iff not on TPU
    fused_prep: bool = False  # decode path: ONE Pallas pass for
    #   dequantize + projection + feature packing + binning keys
    #   (ops/splat_prep.py) instead of ~10 small XLA fusions; inference
    #   only, flat-stream packed-key regime only (falls back otherwise)

    @staticmethod
    def serving(num_points: int, **overrides) -> "RasterizeConfig":
        """Inference-tuned config: fused prep + a tight instance stream.

        Fitted scenes occupy ~2.5 tiles/gaussian on average (measured,
        stream_common.auto_max_instances docstring), so serving caps the
        stream at 3N (vs the training default's 4N headroom) and the
        per-gaussian span at 9: the binning sort and the [T+1, I] window
        bounds shrink ~25% (both are O(stream size), PROFILE_r04: sort
        45.8 us + bounds 55.0 us of the 403 us fused decode frame).
        Overflow is still counted in aux["n_dropped"] — callers serving
        scenes denser than 3 tiles/gaussian should pass a bigger
        ``max_instances`` override.

        Inference also raises the flat-stream ceiling to 196608 instances
        (the batched path's VMEM-budget bound, batched.py: I*512 B padded
        ~= 96 MiB; proven on hardware by the B=6 x 10k batched decode's
        180k-instance flat stream). The 65536 default protects the
        TRAINING backward, which carries gradient scratch on top of the
        stream; forward-only serving has no such pressure, and staying on
        the flat layout through the reference's full 10k-70k sweep avoids
        the ~2.5x aligned-block-layout penalty (results/fps_vs_n.json:
        544 -> ~1200 FPS class at 20k points)."""
        cap = min(-(-3 * num_points // 64) * 64, 196608)
        kw = dict(fused_prep=True, max_instances=cap, max_tiles_per_gauss=9,
                  flat_stream_limit=196608)
        kw.update(overrides)
        return RasterizeConfig(**kw)


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


def _tile_origin(t, tiles_x, tile_px):
    tx0 = ((t % tiles_x) * tile_px).astype(jnp.float32)
    ty0 = ((t // tiles_x) * tile_px).astype(jnp.float32)
    return tx0, ty0


def _read_chunk(gfeat_ref, blk0, ci, off, bk, aligned):
    """One chunk of packed features as [BK, 16] (instances on sublanes —
    the flat path reads its rows with NO transpose; per-instance scalars are
    cheap [BK, 1] lane slices and both matmuls contract natively in this
    orientation). The aligned path stores transposed [16, BK] blocks and
    pays one in-block transpose per chunk."""
    if aligned:
        return gfeat_ref[blk0 + ci].T          # [NB, 16, BK] block
    return gfeat_ref[pl.ds(off, bk), :]        # flat [I+BK, 16] rows


def _read_chunk_T(gfeat_ref, blk0, ci, off, bk, aligned):
    """One chunk as [16, BK] feature rows (the blend kernel's sequential
    compositing works row-wise; the aligned path's stored layout is already
    transposed so it reads blocks directly)."""
    if aligned:
        return gfeat_ref[blk0 + ci]
    return gfeat_ref[pl.ds(off, bk), :].T


def _chunk_geom(g, tx0, ty0):
    """Per-instance columns from a [BK, 16] chunk: tile-local centers,
    conic terms, premultiplied color matrix [BK, 4]."""
    gx = g[:, 0:1] - tx0
    gy = g[:, 1:2] - ty0
    a, b, c = g[:, 2:3], g[:, 3:4], g[:, 4:5]
    cm = g[:, 5:5 + _C]
    return gx, gy, a, b, c, cm


def _tile_acc(starts_ref, counts_ref, gfeat_ref, t, X, Y,
              *, tile_px, bk, q_cut, tiles_x, aligned):
    """Accumulated [C, P] sum for one tile."""
    P = tile_px * tile_px
    start = starts_ref[t]
    blk0 = start // bk
    count = counts_ref[t]
    nch = (count + bk - 1) // bk
    tx0, ty0 = _tile_origin(t, tiles_x, tile_px)

    def chunk_body(ci, acc):
        g = _read_chunk(gfeat_ref, blk0, ci, start + ci * bk, bk,
                        aligned)
        gx, gy, a, b, c, cm = _chunk_geom(g, tx0, ty0)
        # direct quadratic form on pixel offsets (pure VPU, no
        # cancellation: dx, dy are tile-small)
        dx = X - gx  # [BK, P]
        dy = Y - gy
        # clamp: for near-degenerate conics (QAT can quantize a
        # Cholesky diagonal to ~1e-4) the f32 form cancels ~1e11-scale
        # terms and can go spuriously negative, which would pass the
        # q_cut gate and overflow exp()
        q = jnp.maximum(
            a * dx * dx + 2.0 * b * dx * dy + c * dy * dy, 0.0)
        slot = ci * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
        live = slot < count
        w = jnp.where(live & (q <= q_cut), jnp.exp(-0.5 * q), 0.0)
        return acc + jax.lax.dot_general(
            cm, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [C, P]

    return jax.lax.fori_loop(
        0, nch, chunk_body, jnp.zeros((_C, P), jnp.float32))


def _fwd_kernel(starts_ref, counts_ref, gfeat_ref, out_ref,
                *, tile_px, tb, bk, q_cut, tiles_x, aligned):
    P = tile_px * tile_px
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    X = (pidx % tile_px).astype(jnp.float32)  # [1, P] tile-local pixel x
    Y = (pidx // tile_px).astype(jnp.float32)
    g0 = pl.program_id(0)

    def tile_body(i, _):
        out_ref[i] = _tile_acc(starts_ref, counts_ref, gfeat_ref,
                               g0 * tb + i, X, Y, tile_px=tile_px, bk=bk,
                               q_cut=q_cut, tiles_x=tiles_x,
                               aligned=aligned)
        return 0

    jax.lax.fori_loop(0, tb, tile_body, 0)


def _bwd_chunk_store(gfeat_ref, dgfeat_ref, G, blk0, start, ci, count,
                     tx0, ty0, X, Y, phi_m, *, bk, q_cut, aligned):
    """One backward chunk: recompute weights, analytic slot gradients via
    the pixel-moment contraction, store [16, BK] into the grad stream.
    Shared by _bwd_kernel and _fused_l2_kernel (one copy of the math)."""
    off = start + ci * bk
    g = _read_chunk(gfeat_ref, blk0, ci, off, bk, aligned)
    gx, gy, a, b, c, cm = _chunk_geom(g, tx0, ty0)
    dx = X - gx
    dy = Y - gy
    q = jnp.maximum(a * dx * dx + 2.0 * b * dx * dy + c * dy * dy, 0.0)
    slot = ci * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
    live = slot < count
    w = jnp.where(live & (q <= q_cut), jnp.exp(-0.5 * q), 0.0)
    # dL/dw[k,p] = sum_c cm[k,c] G[c,p] — 4 rank-1 VPU updates (faster than
    # a contraction-4 f32 MXU pass at HIGHEST precision)
    dw = (cm[:, 0:1] * G[0:1] + cm[:, 1:2] * G[1:2]
          + cm[:, 2:3] * G[2:3] + cm[:, 3:4] * G[3:4])  # [BK, P]
    dq = (-0.5) * w * dw  # cutoff + live already folded into w
    # pixel moments m = [m0, mx, my, mxx, mxy, myy] of dq; tile-local
    # coordinates keep the recombination cancellation-safe in f32
    m = jax.lax.dot_general(
        dq, phi_m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [BK, 8]
    m0, mx, my = m[:, 0:1], m[:, 1:2], m[:, 2:3]
    mxx, mxy, myy = m[:, 3:4], m[:, 4:5], m[:, 5:6]
    cx = mx - gx * m0   # [BK, 1] sum_p dq * (x - gx)
    cy = my - gy * m0
    da = mxx - 2.0 * gx * mx + gx * gx * m0
    db = 2.0 * (mxy - gx * my - gy * mx + gx * gy * m0)
    dc = myy - 2.0 * gy * my + gy * gy * m0
    dgx = -2.0 * a * cx - 2.0 * b * cy
    dgy = -2.0 * b * cx - 2.0 * c * cy
    # dcm[k,c] = sum_p w[k,p] G[c,p] (contraction over P -> MXU). Columns
    # 0..3 are the gradients w.r.t. the premultiplied packed entries
    # (ro, go, bo, o); the chain rule to raw colors/opacity lives in
    # pack_feat's VJP.
    dcm = jax.lax.dot_general(
        w, G, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [BK, 4]
    dg = jnp.concatenate(
        [dgx, dgy, da, db, dc, dcm,
         jnp.zeros((bk, _FW - 9), jnp.float32)], axis=1)  # [BK, 16]
    dg = jnp.where(live, dg, 0.0)
    if aligned:
        # aligned windows: each block belongs to exactly one tile —
        # a plain full-block store is collision-free
        dgfeat_ref[blk0 + ci] = dg.T
    else:
        # a tile's last chunk overlaps the NEXT tile's window; the
        # masked += keeps neighbours intact (sequential grid)
        dgfeat_ref[pl.ds(off, bk), :] = (
            dgfeat_ref[pl.ds(off, bk), :] + dg)


def _bwd_kernel(starts_ref, counts_ref, gfeat_ref, g_ref, dgfeat_ref,
                *, tile_px, tb, bk, q_cut, tiles_x, aligned):
    P = tile_px * tile_px
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    X = (pidx % tile_px).astype(jnp.float32)
    Y = (pidx // tile_px).astype(jnp.float32)
    # shared pixel-moment basis: one MXU contraction replaces five
    # per-instance lane reductions (sum_p dq * {1, x, y, x^2, xy, y^2})
    phi_m = jnp.concatenate(
        [jnp.ones_like(X), X, Y, X * X, X * Y, Y * Y,
         jnp.zeros_like(X), jnp.zeros_like(X)], axis=0)  # [8, P]
    g0 = pl.program_id(0)

    @pl.when(g0 == 0)
    def _init():
        dgfeat_ref[:] = jnp.zeros_like(dgfeat_ref)

    def tile_body(i, _):
        t = g0 * tb + i
        start = starts_ref[t]
        blk0 = start // bk
        count = counts_ref[t]
        nch = (count + bk - 1) // bk
        tx0, ty0 = _tile_origin(t, tiles_x, tile_px)
        G = g_ref[i]  # [C, P]

        def chunk_body(ci, _):
            _bwd_chunk_store(gfeat_ref, dgfeat_ref, G, blk0, start, ci,
                             count, tx0, ty0, X, Y, phi_m, bk=bk,
                             q_cut=q_cut, aligned=aligned)
            return 0

        jax.lax.fori_loop(0, nch, chunk_body, 0)
        return 0

    jax.lax.fori_loop(0, tb, tile_body, 0)


def _stream_spec(I, BK, aligned):
    if aligned:
        return pl.BlockSpec((I // BK, _FW, BK), lambda g, s, c: (0, 0, 0))
    return pl.BlockSpec((I + BK, _FW), lambda g, s, c: (0, 0))


def _fwd_pallas(static, starts, counts, gfeat):
    tile_px, TB, BK, q_cut, tiles_x, T, interpret, H, W, I, aligned = static
    P = tile_px * tile_px
    kern = functools.partial(_fwd_kernel, tile_px=tile_px, tb=TB, bk=BK,
                             q_cut=q_cut, tiles_x=tiles_x, aligned=aligned)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // TB,),
        in_specs=[_stream_spec(I, BK, aligned)],
        out_specs=pl.BlockSpec((TB, _C, P), lambda g, s, c: (g, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, _C, P), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=I * P * 2 * (_F + _C),
            bytes_accessed=(I * _FW + T * _C * P) * 4,
            transcendentals=I * P,
        ),
    )(starts, counts, gfeat)


def _fwd_full(static, starts, counts, gfeat):
    """Forward returning the full [C, H, W] image: the [T, C, P] kernel +
    XLA untile. A direct [C, H, W]-layout kernel (round 4) is NOT possible:
    the epilogue needs a lane->sublane split (`[C, P] -> [C, tp, tp]`
    with tp < 128 lanes) that Mosaic cannot lower (`infer-vector-layout:
    unsupported shape cast`), for any store granularity — full-block,
    lane-sliced, or pl.ds variants all fail to compile (probed on v5e,
    round 5). The XLA untile is a measured ~60 us/frame at 768x512
    (PROFILE_r04 decode: reshape + copy_bitcast + slice_clamp), which is
    the true relayout cost wherever it runs."""
    tile_px, tiles_x, H, W = static[0], static[4], static[7], static[8]
    out_tiled = _fwd_pallas(static, starts, counts, gfeat)
    return sc.untile_channels(out_tiled, tile_px, tiles_x, H, W, n_chan=_C)


def _bwd_pallas(static, starts, counts, gfeat, g):
    tile_px, TB, BK, q_cut, tiles_x, T, interpret, H, W, I, aligned = static
    P = tile_px * tile_px
    kern = functools.partial(_bwd_kernel, tile_px=tile_px, tb=TB, bk=BK,
                             q_cut=q_cut, tiles_x=tiles_x, aligned=aligned)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // TB,),
        in_specs=[
            _stream_spec(I, BK, aligned),
            pl.BlockSpec((TB, _C, P), lambda g_, s, c: (g_, 0, 0)),
        ],
        out_specs=_stream_spec(I, BK, aligned),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((I // BK, _FW, BK), jnp.float32)
                   if aligned else
                   jax.ShapeDtypeStruct((I + BK, _FW), jnp.float32)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=I * P * 4 * (_F + _C),
            bytes_accessed=(2 * I * _FW + T * _C * P) * 4,
            transcendentals=I * P,
        ),
    )(starts, counts, gfeat, g)


# ---------------------------------------------------------------------------
# XLA-side glue (pack, untile) + custom_vjp over the whole rasterize
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster(static, gids, starts, counts, feat):
    out, _ = _raster_fwd(static, gids, starts, counts, feat)
    return out


def _gather(static, gids, feat):
    BK, interpret, aligned = static[2], static[6], static[10]
    if aligned:
        return sc.gather_stream_blocks(gids, feat, BK, interpret=interpret)
    return sc.gather_stream(gids, feat, BK)


def _raster_fwd(static, gids, starts, counts, feat):
    """CHW-native: forward emits [3, H, W] straight from the untile (no HWC
    transpose) and the backward's cotangent tiling consumes channel-major
    directly. The public entry transposes to the reference's HWC contract —
    a transpose the models' own [H,W,3]->[3,H,W] epilogue cancels."""
    gfeat = _gather(static, gids, feat)
    full = _fwd_full(static, starts, counts, gfeat)
    return (full[:3], full[3]), (gids, starts, counts, feat)


def _raster_bwd(static, res, g):
    tile_px, TB, BK, q_cut, tiles_x, T, interpret, H, W, I, aligned = static
    gids, starts, counts, feat = res
    d_img, d_alpha = g  # d_img [3, H, W]
    gfeat = _gather(static, gids, feat)  # cheap recompute
    G = sc.tile_cotangent(
        jnp.concatenate([d_img, d_alpha[None]], axis=0),
        tile_px, tiles_x, T, H, W, n_chan=_C)
    dgrads = _bwd_pallas(static, starts, counts, gfeat, G)
    if aligned:
        dfeat = sc.scatter_block_grads(dgrads, gids, feat,
                                       interpret=static[6])
    else:
        dfeat = sc.scatter_stream_grads(dgrads, gids, feat)
    return (sc.float0_like(gids), sc.float0_like(starts),
            sc.float0_like(counts), dfeat)


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


def _axis_radii(conics, radii, q_cut):
    """Exact per-axis extents (rx, ry) of the q <= q_cut ellipse for binning.

    cov = conic^-1, extent_x = sqrt(q_cut * cov_xx) = sqrt(q_cut * c / det).
    Strictly tighter than the lambda_max circle for anisotropic gaussians
    (identical pixels survive the kernel's q <= q_cut gate either way).
    ``radii`` (the projection's 3-sigma circle) is kept as cull gate and
    upper bound so radii == 0 still means "skip this gaussian".
    """
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    det = jnp.maximum(a * c - b * b, 1e-12)
    rx = jnp.sqrt(q_cut * jnp.maximum(c, 0.0) / det)
    ry = jnp.sqrt(q_cut * jnp.maximum(a, 0.0) / det)
    live = radii > 0
    return (jnp.where(live, jnp.minimum(rx, radii), 0.0),
            jnp.where(live, jnp.minimum(ry, radii), 0.0))


def rasterize_gaussians_sum(
    xys: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    H: int,
    W: int,
    radii: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
    band: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Render by accumulated summation (no sorting, no compositing).

    xys [N,2] pixel coords, conics [N,3], colors [N,3] (any per-point values),
    opacities [N,1] or [N]. Returns (img [H,W,3], alpha [H,W], aux) where
    alpha is the sum of plain opacity-weighted gaussian weights and aux
    carries the instance-stream overflow counter. No clamping, no
    background compositing (reference semantics: the model clamps,
    gaussianimage_cholesky.py:83-84). ``band`` restricts each gaussian to an
    inclusive tile-row range (batched.py stacks frames vertically).
    """
    cfg = config
    if radii is None:
        radii = _radii_from_conics(jax.lax.stop_gradient(conics))
    radii = jax.lax.stop_gradient(radii.astype(jnp.float32))
    rxy = _axis_radii(jax.lax.stop_gradient(conics), radii, cfg.q_cut)
    sp = sc.prepare_stream(jax.lax.stop_gradient(xys).astype(jnp.float32),
                           rxy, H, W, cfg, band=band)
    gids, starts, counts = sp.gids, sp.starts, sp.counts

    feat = sc.pack_feat(xys, conics, colors, opacities, premultiply=True)
    static = (cfg.tile_px, cfg.tiles_per_step, cfg.block_inst,
              float(cfg.q_cut), sp.tiles_x, sp.T,
              sc.use_interpret(cfg), H, W, sp.I, sp.aligned)
    img_chw, alpha = _raster(static, gids, starts, counts, feat)
    img = img_chw.transpose(1, 2, 0)  # reference HWC contract; models that
    # immediately transpose back to [3, H, W] get both cancelled by XLA

    aux = {"n_dropped": sp.n_dropped,
           "max_per_tile_used": counts.max(),
           # legacy keys kept for monitoring call sites
           "n_dropped_fwd": sp.n_dropped,
           "n_dropped_bwd": sp.n_dropped}
    return img, alpha, aux


def rasterize_gaussians_sum_chw(
    xys: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    H: int,
    W: int,
    radii: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
    band: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Inference-only rasterize returning channel-major [3, H, W] (+ alpha
    [H, W]) — skips the HWC transpose the differentiable entry pays, for
    consumers that want CHW anyway (batched decode, [1,3,H,W] outputs).
    Not differentiable (no custom_vjp); use rasterize_gaussians_sum for
    training paths."""
    cfg = config
    if radii is None:
        radii = _radii_from_conics(jax.lax.stop_gradient(conics))
    radii = jax.lax.stop_gradient(radii.astype(jnp.float32))
    rxy = _axis_radii(jax.lax.stop_gradient(conics), radii, cfg.q_cut)
    sp = sc.prepare_stream(jax.lax.stop_gradient(xys).astype(jnp.float32),
                           rxy, H, W, cfg, band=band)
    feat = sc.pack_feat(xys, conics, colors, opacities, premultiply=True)
    static = (cfg.tile_px, cfg.tiles_per_step, cfg.block_inst,
              float(cfg.q_cut), sp.tiles_x, sp.T,
              sc.use_interpret(cfg), H, W, sp.I, sp.aligned)
    gfeat = _gather(static, sp.gids, feat)
    full = _fwd_full(static, sp.starts, sp.counts, gfeat)
    aux = {"n_dropped": sp.n_dropped,
           "max_per_tile_used": sp.counts.max()}
    return full[:3], full[3], aux


def rasterize_from_keys_chw(
    feat: jnp.ndarray,
    keys: jnp.ndarray,
    trunc: jnp.ndarray,
    n_total: jnp.ndarray,
    H: int,
    W: int,
    config: RasterizeConfig,
    max_instances: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Inference rasterize from PRE-PACKED inputs: ``feat`` [N+1, 16]
    premultiplied rows and ``keys`` the flat packed int32 sort keys
    ``(tile << id_bits) | gaussian_id`` with INT32_MAX dead slots (the
    ops/splat_prep.py fused prep emits both in one Pallas pass). Performs
    the remaining binning (one non-stable sort + compare-reduce bounds),
    stream gather, and forward kernel. Flat-stream layout only.

    ``trunc``/``n_total`` are the prep's per-gaussian accounting sums;
    n_dropped = trunc + max(n_total - I, 0) matches prepare_stream's.
    """
    cfg = config
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
        "rasterize_from_keys_chw requires the packed-key regime")

    # ops/tiles.py _sorted_stream packed branch, from precomputed keys
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

    static = (tp, TB, cfg.block_inst, float(cfg.q_cut), tiles_x, T,
              sc.use_interpret(cfg), H, W, I, False)
    gfeat = _gather(static, gids, feat)
    full = _fwd_full(static, starts, counts, gfeat)
    n_dropped = (trunc + jnp.maximum(n_total - I, 0)).astype(jnp.int32)
    aux = {"n_dropped": n_dropped, "max_per_tile_used": counts.max()}
    return full[:3], full[3], aux


# ---------------------------------------------------------------------------
# fused render + L2 loss + backward (the canonical training step's hot path)
# ---------------------------------------------------------------------------


def _fused_l2_kernel(starts_ref, counts_ref, gfeat_ref, gt_ref,
                     loss_ref, dgfeat_ref,
                     *, tile_px, tb, bk, q_cut, tiles_x, aligned,
                     H, W, clamp, gscale):
    """Per tile: forward accumulate -> clip -> L2 cotangent in VMEM ->
    analytic backward. One kernel per train step instead of fwd pallas +
    XLA image/loss/cotangent round-trips + bwd pallas."""
    P = tile_px * tile_px
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    X = (pidx % tile_px).astype(jnp.float32)
    Y = (pidx // tile_px).astype(jnp.float32)
    phi_m = jnp.concatenate(
        [jnp.ones_like(X), X, Y, X * X, X * Y, Y * Y,
         jnp.zeros_like(X), jnp.zeros_like(X)], axis=0)  # [8, P]
    g0 = pl.program_id(0)

    @pl.when(g0 == 0)
    def _init():
        dgfeat_ref[:] = jnp.zeros_like(dgfeat_ref)

    def tile_body(i, sse):
        t = g0 * tb + i
        start = starts_ref[t]
        blk0 = start // bk
        count = counts_ref[t]
        nch = (count + bk - 1) // bk
        tx0, ty0 = _tile_origin(t, tiles_x, tile_px)

        def fwd_chunk(ci, acc):
            g = _read_chunk(gfeat_ref, blk0, ci, start + ci * bk, bk,
                            aligned)
            gx, gy, a, b, c, cm = _chunk_geom(g, tx0, ty0)
            dx = X - gx
            dy = Y - gy
            q = jnp.maximum(
                a * dx * dx + 2.0 * b * dx * dy + c * dy * dy, 0.0)
            slot = ci * bk + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
            live = slot < count
            w = jnp.where(live & (q <= q_cut), jnp.exp(-0.5 * q), 0.0)
            return acc + jax.lax.dot_general(
                cm, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        acc = jax.lax.fori_loop(
            0, nch, fwd_chunk, jnp.zeros((_C, P), jnp.float32))

        pxv = ((tx0 + X) < W) & ((ty0 + Y) < H)  # [1, P] in-image mask
        img = acc[0:3]
        if clamp:
            imgc = jnp.clip(img, 0.0, 1.0)
            gmask = (img > 0.0) & (img < 1.0)
        else:
            imgc = img
            gmask = jnp.full(img.shape, True)
        diff = jnp.where(pxv, imgc - gt_ref[i][0:3], 0.0)  # [3, P]
        sse = sse + jnp.sum(diff * diff)
        Gtop = gscale * jnp.where(gmask, diff, 0.0)
        G = jnp.concatenate(
            [Gtop, jnp.zeros((_C - 3, P), jnp.float32)], axis=0)

        def bwd_chunk(ci, _):
            _bwd_chunk_store(gfeat_ref, dgfeat_ref, G, blk0, start, ci,
                             count, tx0, ty0, X, Y, phi_m, bk=bk,
                             q_cut=q_cut, aligned=aligned)
            return 0

        jax.lax.fori_loop(0, nch, bwd_chunk, 0)
        return sse

    sse = jax.lax.fori_loop(0, tb, tile_body, jnp.float32(0.0))
    row = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    loss_ref[:] = jnp.where((row == 0) & (lane == 0), sse, 0.0)


def _fused_l2_pallas(static2, starts, counts, gfeat, gt_tiles):
    (tile_px, TB, BK, q_cut, tiles_x, T, interpret, H, W, I, aligned,
     clamp) = static2
    P = tile_px * tile_px
    gscale = 2.0 / (3.0 * H * W)
    kern = functools.partial(_fused_l2_kernel, tile_px=tile_px, tb=TB,
                             bk=BK, q_cut=q_cut, tiles_x=tiles_x,
                             aligned=aligned, H=H, W=W, clamp=clamp,
                             gscale=gscale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // TB,),
        in_specs=[
            _stream_spec(I, BK, aligned),
            pl.BlockSpec((TB, _C, P), lambda g_, s, c: (g_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda g_, s, c: (g_, 0, 0)),
            _stream_spec(I, BK, aligned),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T // TB, 8, 128), jnp.float32),
            (jax.ShapeDtypeStruct((I // BK, _FW, BK), jnp.float32)
             if aligned else
             jax.ShapeDtypeStruct((I + BK, _FW), jnp.float32)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=I * P * 6 * (_F + _C),
            bytes_accessed=(2 * I * _FW + T * _C * P) * 4,
            transcendentals=2 * I * P,
        ),
    )(starts, counts, gfeat, gt_tiles)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_l2(static2, gids, starts, counts, feat, gt_tiles):
    out, _ = _raster_l2_fwd(static2, gids, starts, counts, feat, gt_tiles)
    return out


def _raster_l2_fwd(static2, gids, starts, counts, feat, gt_tiles):
    BK, aligned = static2[2], static2[10]
    H, W = static2[7], static2[8]
    gfeat = (sc.gather_stream_blocks(gids, feat, BK, interpret=static2[6])
             if aligned else sc.gather_stream(gids, feat, BK))
    loss_parts, dgfeat = _fused_l2_pallas(static2, starts, counts, gfeat,
                                          gt_tiles)
    mse = loss_parts.sum() / (3.0 * H * W)
    return mse, (gids, starts, counts, feat, dgfeat, gt_tiles)


def _raster_l2_bwd(static2, res, gbar):
    aligned = static2[10]
    gids, starts, counts, feat, dgfeat, gt_tiles = res
    dfeat = (sc.scatter_block_grads(dgfeat, gids, feat,
                                    interpret=static2[6]) if aligned
             else sc.scatter_stream_grads(dgfeat, gids, feat))
    return (sc.float0_like(gids), sc.float0_like(starts),
            sc.float0_like(counts), gbar * dfeat,
            jnp.zeros_like(gt_tiles))


_raster_l2.defvjp(_raster_l2_fwd, _raster_l2_bwd)


def rasterize_gaussians_sum_l2(
    xys: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    gt_chw: jnp.ndarray,
    H: int,
    W: int,
    radii: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
    clamp: bool = True,
) -> Tuple[jnp.ndarray, dict]:
    """Fused train objective: mse = mean((clip(render) - gt)^2) with the
    analytic backward computed in the same kernel pass. Numerically equal to
    ``loss_fn(clip(rasterize(...)), gt, "L2")`` but one pallas call per step
    (no image materialization, no XLA-side cotangent tiling).

    gt_chw: [3, H, W]. Differentiable w.r.t. the four gaussian inputs.
    """
    cfg = config
    if radii is None:
        radii = _radii_from_conics(jax.lax.stop_gradient(conics))
    radii = jax.lax.stop_gradient(radii.astype(jnp.float32))
    rxy = _axis_radii(jax.lax.stop_gradient(conics), radii, cfg.q_cut)
    sp = sc.prepare_stream(jax.lax.stop_gradient(xys).astype(jnp.float32),
                           rxy, H, W, cfg)
    gids, starts, counts = sp.gids, sp.starts, sp.counts

    feat = sc.pack_feat(xys, conics, colors, opacities, premultiply=True,
                        inplace=True)
    gt_tiles = sc.tile_cotangent(gt_chw.astype(jnp.float32),
                                 cfg.tile_px, sp.tiles_x, sp.T, H, W,
                                 n_chan=_C)
    static2 = (cfg.tile_px, cfg.tiles_per_step, cfg.block_inst,
               float(cfg.q_cut), sp.tiles_x, sp.T,
               sc.use_interpret(cfg), H, W, sp.I, sp.aligned, bool(clamp))
    mse = _raster_l2(static2, gids, starts, counts, feat, gt_tiles)
    aux = {"n_dropped": sp.n_dropped,
           "max_per_tile_used": counts.max()}
    return mse, aux
