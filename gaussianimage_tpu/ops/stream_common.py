"""Shared glue for the instance-stream Pallas rasterizers
(ops/rasterize_sum.py and ops/rasterize_blend.py): packed feature rows,
stream gather/scatter, tiled-layout <-> image conversions. Kept in one place
so a fix to the feature layout or the segment-scatter epilogue applies to
both kernels."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

C = 8    # padded channel count in the tiled kernel output (sublane-aligned)
FW = 16  # packed per-gaussian feature width (9 used + 7 pad, lane-friendly)


def use_interpret(cfg) -> bool:
    """cfg.interpret tri-state: None => interpret iff not running on TPU."""
    if cfg.interpret is not None:
        return cfg.interpret
    if os.environ.get("GITPU_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() not in ("tpu",)


def auto_max_instances(n: int, cfg) -> int:
    """Instance-stream capacity: explicit cfg.max_instances, or 4N headroom
    tapering to 2N + 40k above 20k gaussians — measured per-gaussian tile
    occupancy FALLS with N (2.5 at 10k pts, 1.66 at 40k on fitted
    768x512 scenes) because dense fits use smaller gaussians. Overflow is
    counted in aux['n_dropped'] and warned per training chunk. Rounded up
    to the chunk size."""
    if cfg.max_instances is not None:
        cap = cfg.max_instances
    else:
        cap = max(16384, min(4 * n, 2 * n + 40000))
    cap = min(cap, n * cfg.max_tiles_per_gauss)
    return -(-cap // cfg.block_inst) * cfg.block_inst


def stream_caps(n: int, cfg):
    """(I0, m_span, aligned): the instance-stream capacity, the per-gaussian
    tile-span cap, and the flat-vs-aligned layout decision — the ONE
    implementation shared by prepare_stream and the fused decode prep (the
    two must agree or their key arrays describe different streams)."""
    I0 = auto_max_instances(n, cfg)
    if cfg.max_instances is not None:
        m_span = cfg.max_tiles_per_gauss
    else:
        m_span = min(cfg.max_tiles_per_gauss, max(8, -(-3 * I0 // max(n, 1))))
    return I0, m_span, I0 > cfg.flat_stream_limit


def pack_feat(xys, conics, colors, opac, premultiply: bool = False,
              inplace: bool = False):
    """[N+1, 16] rows (xy, conic a b c, rgb, opacity, pad); the zero row at
    index N absorbs dead-slot reads and dead-slot gradient scatters.

    premultiply=True stores opacity-premultiplied colors (the sum kernel's cm
    rows) so rows 5..12 ARE the kernel's [8, BK] color matrix — a contiguous
    sublane slice instead of an in-kernel stack + multiply. The row-gradient
    chain rule back to raw (colors, opacity) then happens automatically in
    this function's VJP. The blend kernel needs raw colors (compositing
    multiplies by alpha, not opacity) and packs with premultiply=False."""
    N = xys.shape[0]
    op = opac.reshape(N, 1).astype(jnp.float32)
    cols = colors.astype(jnp.float32)
    if premultiply:
        cols = cols * op
    if inplace:
        # static-slice updates rather than a concatenate: inside the
        # training scan XLA lays the concat row-major and it costs
        # ~48 us/step; update-slices fuse into one in-place build
        # (-80 us/step measured). The render/decode executables prefer
        # the concat (XLA picks col-major there, ~2 us).
        feat = jnp.zeros((N + 1, FW), jnp.float32)
        feat = feat.at[:N, 0:2].set(xys.astype(jnp.float32))
        feat = feat.at[:N, 2:5].set(conics.astype(jnp.float32))
        feat = feat.at[:N, 5:8].set(cols)
        feat = feat.at[:N, 8:9].set(op)
        return feat
    return jnp.concatenate([
        jnp.concatenate([
            xys.astype(jnp.float32),
            conics.astype(jnp.float32),
            cols,
            op,
            jnp.zeros((N, FW - 9), jnp.float32),
        ], axis=1),
        jnp.zeros((1, FW), jnp.float32),
    ], axis=0)


def gather_stream(gids, feat, bk: int):
    """[I + BK, 16] feature rows in stream order; BK padding rows keep the
    kernel's fixed-size dynamic slices in bounds (a clamped pl.ds start
    would silently shift the window)."""
    N = feat.shape[0] - 1
    safe = jnp.concatenate([gids, jnp.full((bk,), N, jnp.int32)])
    return feat[safe]


def scatter_stream_grads(dgfeat, gids, feat):
    """Per-instance gradient rows -> per-gaussian sums: one deterministic
    segment scatter-add (the TPU replacement for CUDA atomicAdd). Returns
    the cotangent for ``feat`` (row N, the dead-slot sink, zeroed)."""
    N = feat.shape[0] - 1
    I = gids.shape[0]
    safe = jnp.concatenate([gids, jnp.full((dgfeat.shape[0] - I,), N,
                                           jnp.int32)])
    dfeat = jnp.zeros_like(feat).at[safe].add(
        dgfeat, mode="promise_in_bounds")
    return dfeat.at[N].set(0.0)


def float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def untile_channels(out_tiled, tile_px: int, tiles_x: int, H: int, W: int,
                    n_chan: int = C):
    """[T, n_chan, P] tile blocks -> [n_chan, H, W] channels (crop pad)."""
    tp = tile_px
    tiles_y = -(-H // tp)
    T_real = tiles_x * tiles_y
    return (out_tiled[:T_real]
            .reshape(tiles_y, tiles_x, n_chan, tp, tp)
            .transpose(2, 0, 3, 1, 4)
            .reshape(n_chan, tiles_y * tp, tiles_x * tp))[:, :H, :W]


def tile_cotangent(chans, tile_px: int, tiles_x: int, T: int, H: int, W: int,
                   n_chan: int = C):
    """[k<=n_chan, H, W] cotangent channels -> [T, n_chan, P] tile blocks
    (zero pad)."""
    tp = tile_px
    tiles_y = -(-H // tp)
    T_real = tiles_x * tiles_y
    Hp, Wp = tiles_y * tp, tiles_x * tp
    buf = jnp.zeros((n_chan, Hp, Wp), jnp.float32)
    buf = jax.lax.dynamic_update_slice(buf, chans.astype(jnp.float32),
                                       (0, 0, 0))
    G = (buf.reshape(n_chan, tiles_y, tp, tiles_x, tp)
         .transpose(1, 3, 0, 2, 4)
         .reshape(T_real, n_chan, tp * tp))
    if T != T_real:
        G = jnp.concatenate(
            [G, jnp.zeros((T - T_real, n_chan, tp * tp), jnp.float32)],
            axis=0)
    return G


_BLK_GROUP = 32  # stream blocks transposed per blockize grid step


def _want_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu",)


def blockize_stream(g, bk: int, interpret=None):
    """[I, 16] rows -> [NB, 16, BK] transposed blocks via a tiny Pallas
    kernel (per-block VPU transposes). XLA's reshape+transpose lowering of
    the same relayout measured ~1.2 ms at I~185k (~20 GB/s); in-kernel
    shuffles run at VMEM speed."""
    from jax.experimental import pallas as pl

    I = g.shape[0]
    assert I % bk == 0 and I > 0, (
        f"blockize_stream: stream length {I} not a positive multiple of "
        f"block_inst {bk} (the grid would silently drop tail rows)")
    NB = I // bk
    G = _BLK_GROUP
    while NB % G:
        G //= 2

    def kern(src_ref, dst_ref):
        src = src_ref[...].reshape(G, bk, FW)
        for i in range(G):
            dst_ref[i] = src[i].T

    return pl.pallas_call(
        kern,
        grid=(NB // G,),
        in_specs=[pl.BlockSpec((G * bk, FW), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((G, FW, bk), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, FW, bk), jnp.float32),
        interpret=_want_interpret(interpret),
    )(g)


def unblockize_stream(dgb, bk: int, interpret=None):
    """[NB, 16, BK] blocks -> [I, 16] rows (inverse of blockize_stream)."""
    from jax.experimental import pallas as pl

    NB = dgb.shape[0]
    assert NB > 0, "unblockize_stream: empty block stream"
    G = _BLK_GROUP
    while NB % G:
        G //= 2

    def kern(src_ref, dst_ref):
        rows = [src_ref[i].T for i in range(G)]  # G x [bk, FW]
        dst_ref[...] = jnp.concatenate(rows, axis=0)

    return pl.pallas_call(
        kern,
        grid=(NB // G,),
        in_specs=[pl.BlockSpec((G, FW, bk), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((G * bk, FW), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((NB * bk, FW), jnp.float32),
        interpret=_want_interpret(interpret),
    )(dgb)


def gather_stream_blocks(gids, feat, bk: int, interpret=None):
    """[NB, 16, BK] transposed feature blocks (NB = I/bk) in aligned-stream
    order. Full 128-lane VMEM tiles (bk >= 64), vs 8x lane padding for a
    flat [I, 16] layout — this is what makes 100k+ gaussian scenes fit."""
    g = feat[gids]  # [I, 16]
    return blockize_stream(g, bk, interpret)


def scatter_block_grads(dgblocks, gids, feat, interpret=None):
    """Inverse of gather_stream_blocks for gradients: [NB, 16, BK] ->
    per-gaussian sums via one deterministic segment scatter-add."""
    N = feat.shape[0] - 1
    dg = unblockize_stream(dgblocks, dgblocks.shape[2], interpret)
    dfeat = jnp.zeros_like(feat).at[gids].add(dg, mode="promise_in_bounds")
    return dfeat.at[N].set(0.0)


class StreamPrep:
    """Binning products + static stream geometry shared by all rasterizer
    entry points (sum, fused-L2, blend). One implementation of the
    flat-vs-aligned layout decision and capacity formula."""

    __slots__ = ("gids", "starts", "counts", "n_dropped",
                 "tiles_x", "T", "I", "aligned")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def prepare_stream(xys, radii, H: int, W: int, cfg, order=None,
                   band=None) -> StreamPrep:
    """xys/radii already stop_gradient'ed float32. cfg needs tile_px,
    tiles_per_step, block_inst, max_tiles_per_gauss, max_instances,
    flat_stream_limit."""
    from gaussianimage_tpu.ops import tiles as _tiles

    N = xys.shape[0]
    tp = cfg.tile_px
    TB = cfg.tiles_per_step
    BK = cfg.block_inst
    tiles_x = -(-W // tp)
    tiles_y = -(-H // tp)
    T_real = tiles_x * tiles_y
    T = T_real + ((-T_real) % TB)
    # per-gaussian span cap (stream_caps): the binning sort costs O(N * M),
    # so M is tied to the stream budget (3x the average per-gaussian slot
    # allowance, floor 8) instead of always paying the configured worst
    # case — the stream cap I0 would truncate demand beyond that anyway,
    # and overflow is counted (fitted scenes measure ~2.5 tiles/gaussian
    # with the exact anisotropic bboxes, so this keeps ~5x per-gaussian
    # headroom). The taper applies only to the AUTO instance budget: a user
    # who sets max_instances explicitly sized the stream and gets the full
    # max_tiles_per_gauss span.
    I0, m_span, aligned = stream_caps(N, cfg)
    if aligned:
        I = I0 + T_real * BK  # headroom for per-live-tile block padding
        st = _tiles.bin_instances_aligned(
            xys, radii, tiles_x, tiles_y, tp, I, T, BK,
            max_tiles_per_gauss=m_span, order=order, band=band)
        gids, starts, counts = st.gids, st.starts, st.counts
    else:
        I = I0
        st = _tiles.bin_gaussian_instances(
            xys, radii, tiles_x, tiles_y, tp, I, T,
            max_tiles_per_gauss=m_span, order=order, band=band)
        gids, starts = st.gids, st.starts
        counts = starts[1:] - starts[:-1]
    return StreamPrep(gids=gids, starts=starts, counts=counts,
                      n_dropped=st.n_dropped, tiles_x=tiles_x, T=T, I=I,
                      aligned=aligned)
