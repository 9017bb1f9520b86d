"""Per-Gaussian tile binning for the rasterizers.

The CUDA reference bins gaussian instances into tiles with
map_gaussian_to_intersects + radix sort + get_tile_bin_edges (SURVEY.md N3,
[inferred]). The TPU-native equivalent is the same sort-based pipeline built
from XLA's vectorized primitives:

1. per gaussian: clipped tile-span rectangle from the 3-sigma radius bbox,
   expanded to at most ``max_tiles_per_gauss`` (tile, gaussian) instances;
2. ONE sort groups instances by tile. When (tile_id, rank) fits in 31 bits
   they are packed into a single int32 key (a single-array non-stable sort —
   a stable sort makes XLA pair-sort with an iota tiebreaker, ~10x slower);
   otherwise a stable (tile, rank) pair sort is used (slower but correct —
   int64 keys are unavailable without jax_enable_x64);
3. per-tile [start, count) via ONE vectorized searchsorted of T+1 queries;
4. consumers either walk the sorted stream directly (``bin_gaussian_
   instances`` — the Pallas rasterizers) or gather a fixed-capacity [T, K]
   table (``bin_gaussians_per_tile`` — the XLA oracle paths).

Within a tile, stored instances preserve the processing order exactly (the
packed rank is monotonic in input position; the pair sort is stable), so
passing a depth ``order`` yields depth-sorted per-tile lists for the
alpha-blend rasterizer; any order works for the commutative sum rasterizer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class TileBins(NamedTuple):
    index: jnp.ndarray     # [T, K] int32 gaussian ids, -1 = empty slot
    counts: jnp.ndarray    # [T] int32 (clamped to K)
    n_dropped: jnp.ndarray  # [] int32 overflow count (monitoring)


class InstanceStream(NamedTuple):
    """Tile-sorted gaussian-instance stream (Pallas rasterizer input).

    gids [I] int32: gaussian id per sorted instance, N (the zero-feature
    sentinel row) for dead slots — dead slots sort to the tail. starts
    [n_tiles_padded + 1] int32: per-tile window bounds into the stream,
    clipped to I; padded tiles get empty windows.
    """
    gids: jnp.ndarray
    starts: jnp.ndarray
    n_dropped: jnp.ndarray  # [] int32: instances lost to caps (monitoring)


def _split_radii(radii):
    """Accept isotropic [N] radii or an anisotropic (rx, ry) pair.

    The 3-sigma circle radius bounds the gaussian's q<=9 ellipse, but its
    axis-aligned bbox is exactly x in +-3*sqrt(cov_xx), y in +-3*sqrt(cov_yy)
    — strictly tighter for anisotropic gaussians, so callers that know the
    conic pass (rx, ry) and bin fewer instances for the same exact render.
    """
    if isinstance(radii, tuple):
        return radii
    return radii, radii


def _expand_instances(xys, radii, tiles_x, tiles_y, tile_px, M,
                      order: Optional[jnp.ndarray],
                      band: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
    """(tile [M, N], live [M, N], n_truncated) — bbox tile spans, capped at
    M instances per gaussian. Slot-major [M, N] layout keeps the minor dim
    large (N lanes, vs M=~16 at 1/8 lane utilization the other way).

    ``band``: optional per-gaussian inclusive tile-ROW bounds (lo[N], hi[N]).
    A gaussian only bins into tile rows within its band — the containment
    mechanism for batched rendering, where B frames stack vertically into
    one tall canvas and each frame's gaussians must not bleed into the
    neighbour frame's rows."""
    rx, ry = _split_radii(radii)
    if order is not None:
        xs = xys[order]
        rx = rx[order]
        ry = ry[order]
    else:
        xs = xys
    x = xs[:, 0]
    y = xs[:, 1]
    rx = rx.astype(jnp.float32)
    ry = ry.astype(jnp.float32)

    row_lo, row_hi = 0, tiles_y - 1
    if band is not None:
        row_lo, row_hi = band
        if order is not None:
            row_lo = row_lo[order]
            row_hi = row_hi[order]

    x0 = jnp.clip(jnp.floor((x - rx) / tile_px), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + rx) / tile_px), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - ry) / tile_px), row_lo, row_hi).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + ry) / tile_px), row_lo, row_hi).astype(jnp.int32)
    inside = ((rx > 0) & (ry > 0)
              & (x + rx >= 0) & (x - rx < tiles_x * tile_px)
              & (y + ry >= 0) & (y - ry < tiles_y * tile_px))
    span_w = x1 - x0 + 1
    area = span_w * (y1 - y0 + 1)
    trunc = jnp.where(inside, jnp.maximum(area - M, 0), 0).sum()

    jj = jnp.arange(M, dtype=jnp.int32)[:, None]
    jx = jj % span_w[None, :]
    jy = jj // span_w[None, :]
    tile = (y0[None, :] + jy) * tiles_x + (x0[None, :] + jx)  # [M, N]
    live = inside[None, :] & (jj < jnp.minimum(area, M)[None, :])
    return tile, live, trunc


def _sorted_stream(tile, live, N: int, T: int, force_pair: bool = False):
    """Sort instances by tile. Returns (srank [N*M] input-order ranks with
    N*M-invalid entries pointing anywhere past the live prefix, stile-query
    bounds [T+1], dead [N*M] mask)."""
    rank = jnp.arange(N, dtype=jnp.int32)[None, :]  # [1, N] (slot-major tile)
    id_bits = max(int(N - 1).bit_length(), 1)
    if not force_pair and (T + 1) * (1 << id_bits) < 2 ** 31:
        # packed single-int32 key: (tile << id_bits) | rank; dead -> INT_MAX
        key = jnp.where(live, (tile << id_bits) | rank, jnp.int32(2 ** 31 - 1))
        # barrier: without it XLA computes the key fusion at the FLAT shape
        # and re-materializes every [M, N] broadcast input through its own
        # [M*N] relayout reshape (~14 extra ops; per-op launch overhead is
        # the wall-clock cost here). The barrier pins the fusion at [M, N]
        # so exactly ONE reshape feeds the sort.
        key = jax.lax.optimization_barrier(key)
        skey = jnp.sort(key.reshape(-1), stable=False)
        srank = (skey & ((1 << id_bits) - 1)).astype(jnp.int32)
        dead = skey == jnp.int32(2 ** 31 - 1)
        bounds_keys = skey
        queries = jnp.arange(T + 1, dtype=jnp.int32) << id_bits
    else:
        # lexicographic (tile, rank) pair sort — same (tile, rank) order as
        # the packed key; int64 packing is unavailable (x64 disabled)
        tile_flat = jnp.where(live, tile, T).reshape(-1)
        rank_flat = jnp.broadcast_to(rank, tile.shape).reshape(-1)
        stile, srank = jax.lax.sort((tile_flat, rank_flat), num_keys=2)
        dead = stile >= T
        bounds_keys = stile
        queries = jnp.arange(T + 1, dtype=jnp.int32)
    return srank, dead, bounds_keys, queries


def sorted_window_bounds(keys: jnp.ndarray, queries: jnp.ndarray,
                         blk: int = 512) -> jnp.ndarray:
    """#{keys < q} for each query over SORTED int32 keys — the per-tile
    window bounds (== searchsorted 'left').

    Two-level blocked compare-reduce: count fully-passed blocks via the
    block maxima ([Q, L/blk] compares), then resolve the single boundary
    block with one row gather + [Q, blk] compare. ~Q*(L/blk + blk) lane
    ops vs the flat [Q, L] brute force (55 us/frame at flagship scale,
    PROFILE_r04 fusion.2 — 15.7M compares where ~0.3M suffice) while
    staying 3-4 fused ops (an unrolled binary search is CHEAPER in flops
    but pays ~17 sequential op launches, which lose on this runtime).

    Exact for any key distribution; INT32_MAX padding never counts because
    queries are < INT32_MAX by the packed-key construction.
    """
    L = keys.shape[0]
    nb = -(-L // blk)
    Lp = nb * blk
    if Lp != L:
        keys = jnp.pad(keys, (0, Lp - L),
                       constant_values=jnp.int32(2 ** 31 - 1))
    rows = keys.reshape(nb, blk)
    bmax = rows[:, -1]  # sorted => block max is the last element
    nfull = jnp.sum(bmax[None, :] < queries[:, None],
                    axis=1).astype(jnp.int32)          # [Q]
    bstar = jnp.minimum(nfull, nb - 1)
    boundary = rows[bstar]                             # [Q, blk] gather
    inblock = jnp.sum(boundary < queries[:, None],
                      axis=1).astype(jnp.int32)
    return bstar * blk + inblock


def bin_gaussians_per_tile(
    xys: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    max_per_tile: int,
    order: Optional[jnp.ndarray] = None,
    max_tiles_per_gauss: int = 64,
) -> TileBins:
    """Fixed-capacity [T, K] per-tile index table. xys [N,2] px, radii [N]
    (0 = cull). ``order`` remaps processing order (e.g. depth sort)."""
    T = tiles_x * tiles_y
    K = max_per_tile
    N = xys.shape[0]
    M = max_tiles_per_gauss

    tile, live, trunc = _expand_instances(
        xys, radii, tiles_x, tiles_y, tile_px, M, order)
    srank, _, bounds_keys, queries = _sorted_stream(tile, live, N, T)

    bounds = jnp.searchsorted(bounds_keys, queries, method='scan_unrolled').astype(jnp.int32)
    starts = bounds[:-1]
    counts_full = bounds[1:] - starts
    counts = jnp.minimum(counts_full, K)

    pos = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]  # [T, K]
    slot_live = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    got = srank[jnp.clip(pos, 0, N * M - 1)]
    if order is not None:
        got = order.astype(jnp.int32)[got]
    table = jnp.where(slot_live, got, -1)

    n_dropped = (jnp.maximum(counts_full - K, 0).sum() + trunc
                 ).astype(jnp.int32)
    return TileBins(table, counts, n_dropped)


def bin_gaussian_instances(
    xys: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    max_instances: int,
    n_tiles_padded: int,
    max_tiles_per_gauss: int = 36,
    order: Optional[jnp.ndarray] = None,
    band: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> InstanceStream:
    """Tile-sorted instance stream (no per-tile capacity — the Pallas
    rasterizers walk each tile's window with a data-dependent trip count;
    only the global ``max_instances`` stream cap applies)."""
    T = tiles_x * tiles_y
    N = xys.shape[0]
    I = max_instances

    tile, live, trunc = _expand_instances(
        xys, radii, tiles_x, tiles_y, tile_px, max_tiles_per_gauss, order,
        band=band)
    srank, dead, bounds_keys, queries = _sorted_stream(tile, live, N, T)
    srank, dead, bounds_keys = srank[:I], dead[:I], bounds_keys[:I]

    gids = jnp.where(dead, N, srank)
    if order is not None:
        ordered = jnp.concatenate(
            [order.astype(jnp.int32), jnp.asarray([N], jnp.int32)])
        gids = ordered[gids]
    bounds = sorted_window_bounds(bounds_keys, queries)  # [T+1], <= I
    starts = jnp.concatenate([
        bounds,
        jnp.full((n_tiles_padded - T,), bounds[-1], jnp.int32),
    ]) if n_tiles_padded > T else bounds
    n_total = jnp.where(live, 1, 0).sum()
    n_dropped = (trunc + jnp.maximum(n_total - I, 0)).astype(jnp.int32)
    return InstanceStream(gids, starts, n_dropped)


class AlignedStream(NamedTuple):
    """Instance stream with every tile window padded to a multiple of the
    kernel chunk size BK (dead padding instances point at the sentinel row).

    Alignment lets the rasterizers store the stream as transposed
    [n_blocks, 16, BK] feature blocks — full 128-lane VMEM tiles instead of
    the 8x-padded [I, 16] layout — and read/write whole blocks per chunk
    with a leading-dim dynamic index (no unaligned sublane slicing, no
    in-kernel transpose, collision-free full-block backward writes).
    """
    gids: jnp.ndarray     # [I_pad] int32, N = dead sentinel
    starts: jnp.ndarray   # [n_tiles_padded + 1] int32, multiples of BK
    counts: jnp.ndarray   # [n_tiles_padded] int32 real (unpadded) counts
    n_dropped: jnp.ndarray


def bin_instances_aligned(
    xys: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    max_instances_padded: int,
    n_tiles_padded: int,
    block: int,
    max_tiles_per_gauss: int = 25,
    order: Optional[jnp.ndarray] = None,
    band: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> AlignedStream:
    """Like ``bin_gaussian_instances`` but with BK-aligned tile windows.

    ``max_instances_padded`` must be a multiple of ``block`` and include
    headroom for the per-live-tile padding (up to block-1 each).
    """
    T = tiles_x * tiles_y
    N = xys.shape[0]
    I = max_instances_padded

    tile, live, trunc = _expand_instances(
        xys, radii, tiles_x, tiles_y, tile_px, max_tiles_per_gauss, order,
        band=band)
    srank, dead, bounds_keys, queries = _sorted_stream(tile, live, N, T)

    gids_sorted = jnp.where(dead, N, srank)
    if order is not None:
        ordered = jnp.concatenate(
            [order.astype(jnp.int32), jnp.asarray([N], jnp.int32)])
        gids_sorted = ordered[gids_sorted]

    bounds = sorted_window_bounds(bounds_keys, queries)  # [T+1]
    counts_real = bounds[1:] - bounds[:-1]
    acounts = -(-counts_real // block) * block
    astarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(acounts).astype(jnp.int32)])
    astarts = jnp.minimum(astarts, I)
    counts = jnp.minimum(counts_real,
                         astarts[1:] - astarts[:-1])  # clip at stream cap

    # aligned slot m = b*block + r maps back to sorted position
    # src(m) = bounds[t(b)] + (m - astarts[t(b)]). Window starts are
    # block-aligned, so the tile of every slot in block b is
    # t(b) = #{t >= 1 : astarts[t] <= b*block} — ONE [NB, T] compare-reduce
    # over the ~I/block blocks (NB*T is tiny), then three [NB] gathers.
    # Replaces the previous pair of [I]-length scatter+cumsum chains whose
    # XLA fusion measured ~0.4 ms at I~65k.
    NM = gids_sorted.shape[0]
    NB = I // block
    bstart = jnp.arange(NB, dtype=jnp.int32) * block            # [NB]
    t_b = jnp.sum(astarts[None, 1:T + 1] <= bstart[:, None],
                  axis=1).astype(jnp.int32)                     # [NB] in [0,T]
    t_b = jnp.minimum(t_b, T - 1)
    lane = jnp.arange(block, dtype=jnp.int32)[None, :]          # [1, BK]
    src = (bounds[t_b] + (bstart - astarts[t_b]))[:, None] + lane  # [NB, BK]
    limit = bounds[t_b + 1][:, None]
    valid = (src < limit) & (bstart[:, None] + lane < astarts[-1])
    src = jnp.clip(src, 0, NM - 1).reshape(-1)
    gids = jnp.where(valid.reshape(-1), gids_sorted[src], N)

    if n_tiles_padded > T:
        pad = jnp.full((n_tiles_padded - T,), astarts[-1], jnp.int32)
        astarts = jnp.concatenate([astarts, pad])
        counts = jnp.concatenate(
            [counts, jnp.zeros((n_tiles_padded - T,), jnp.int32)])
    n_total = jnp.where(live, 1, 0).sum()
    kept = counts.sum()
    n_dropped = (trunc + jnp.maximum(n_total - kept, 0)).astype(jnp.int32)
    return AlignedStream(gids, astarts, counts, n_dropped)
