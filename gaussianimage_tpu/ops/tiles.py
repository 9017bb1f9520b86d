"""Per-Gaussian tile binning for the rasterizers.

The CUDA reference bins gaussian instances into tiles with
map_gaussian_to_intersects + radix sort + get_tile_bin_edges (SURVEY.md N3,
[inferred]). The TPU-native equivalent is the same sort-based pipeline built
from XLA's vectorized primitives — measured on v5p these are all fast
(sort 640k int32 ~0.08ms, gather/scatter 300k ~0.03ms), so one frame of
binning costs ~0.2ms instead of scan+scatter approaches (~80ms):

1. per gaussian: clipped tile-span rectangle from the 3-sigma radius bbox;
2. expand to at most ``max_tiles_per_gauss`` (tile_id, gaussian_rank)
   instances, packed into ONE int32 key = tile_id << id_bits | rank
   (single-array sort is ~10x faster than a key/value pair sort on TPU);
   invalid slots get the int32-max sentinel and sort to the end;
3. sort; per-tile [start, count) from a tile histogram + exclusive cumsum;
4. the [T, K] table is a pure gather: table[t, k] = rank(sorted[start_t + k]).

Within a tile, packed ranks sort ascending, so stored indices preserve the
processing order exactly (pass depth-sorted ``order`` for the alpha-blend
rasterizer; any order for the commutative sum rasterizer). When N or T are
too large to pack in 31 bits the same pipeline runs on int64 keys.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TileBins(NamedTuple):
    index: jnp.ndarray     # [T, K] int32 gaussian ids, -1 = empty slot
    counts: jnp.ndarray    # [T] int32 (clamped to K)
    n_dropped: jnp.ndarray  # [] int32 overflow count (monitoring)


def bin_gaussians_per_tile(
    xys: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    max_per_tile: int,
    order: Optional[jnp.ndarray] = None,
    max_tiles_per_gauss: int = 64,
    gauss_chunk: int = 0,  # unused; kept for call-site compatibility
) -> TileBins:
    """xys [N,2] px, radii [N] (0 = cull). ``order`` optionally remaps the
    processing order (e.g. depth sort). Non-differentiable (int outputs)."""
    del gauss_chunk
    T = tiles_x * tiles_y
    K = max_per_tile
    N = xys.shape[0]
    M = max_tiles_per_gauss

    if order is not None:
        xs = xys[order]
        rs = radii[order]
    else:
        xs = xys
        rs = radii
    x = xs[:, 0]
    y = xs[:, 1]
    r = rs.astype(jnp.float32)

    # tile-span rectangle of the radius bbox, clipped to the grid
    x0 = jnp.clip(jnp.floor((x - r) / tile_px), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + r) / tile_px), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - r) / tile_px), 0, tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + r) / tile_px), 0, tiles_y - 1).astype(jnp.int32)
    inside = ((r > 0)
              & (x + r >= 0) & (x - r < tiles_x * tile_px)
              & (y + r >= 0) & (y - r < tiles_y * tile_px))
    span_w = x1 - x0 + 1
    area = span_w * (y1 - y0 + 1)
    # instances truncated by the per-gaussian cap count as dropped work
    trunc = jnp.where(inside, jnp.maximum(area - M, 0), 0)

    jj = jnp.arange(M, dtype=jnp.int32)[None, :]             # [1, M]
    jx = jj % span_w[:, None]
    jy = jj // span_w[:, None]
    tile = (y0[:, None] + jy) * tiles_x + (x0[:, None] + jx)  # [N, M]
    live = inside[:, None] & (jj < jnp.minimum(area, M)[:, None])

    rank = jnp.arange(N, dtype=jnp.int32)
    id_bits = max(int(N - 1).bit_length(), 1)
    # packed single-key sort when (tile_id, rank) fits in 31 bits; keys are
    # unique so stable=False (a stable sort makes XLA pair-sort with an iota
    # tiebreaker — ~10x slower on TPU)
    tid_ext = jnp.arange(T + 1, dtype=jnp.int32)
    if (T + 1) * (1 << id_bits) < 2 ** 31:
        key = jnp.where(live, (tile << id_bits) | rank[:, None],
                        jnp.int32(2 ** 31 - 1))
        skey = jnp.sort(key.reshape(-1), stable=False)
        srank = (skey & ((1 << id_bits) - 1)).astype(jnp.int32)
        queries = tid_ext << id_bits
    else:
        key = jnp.where(live, tile.astype(jnp.int64) * (N + 1) + rank[:, None],
                        jnp.int64((T + 1) * (N + 1)))
        skey = jnp.sort(key.reshape(-1), stable=False)
        srank = (skey % (N + 1)).astype(jnp.int32)
        queries = tid_ext.astype(jnp.int64) * (N + 1)

    # per-tile [start, count): ONE searchsorted of T+1 packed-key queries,
    # counts by diff (a scatter-add histogram would hit XLA's serialized
    # small-target scatter; searchsorted's vectorized binary search doesn't)
    bounds = jnp.searchsorted(skey, queries).astype(jnp.int32)  # [T+1]
    starts = bounds[:-1]
    counts_full = bounds[1:] - starts
    counts = jnp.minimum(counts_full, K)

    pos = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]  # [T, K]
    slot_live = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    got = srank[jnp.clip(pos, 0, N * M - 1)]
    if order is not None:
        got = order.astype(jnp.int32)[got]
    table = jnp.where(slot_live, got, -1)

    n_dropped = (jnp.maximum(counts_full - K, 0).sum() + trunc.sum()
                 ).astype(jnp.int32)
    return TileBins(table, counts, n_dropped)


class InstanceStream(NamedTuple):
    """Tile-sorted gaussian-instance stream (v4 rasterizer input).

    gids [I] int32: gaussian id per sorted instance, ``n_sentinel`` for dead
    slots (all dead slots sort to the tail). starts [T+1] int32: per-tile
    window bounds into the stream, clipped to I and padded so tiles beyond
    the real grid have empty windows.
    """
    gids: jnp.ndarray
    starts: jnp.ndarray
    n_dropped: jnp.ndarray  # [] int32: instances lost to caps (monitoring)


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
) -> InstanceStream:
    """Expand gaussians into (tile, gaussian) instances sorted by tile.

    Same expansion + packed single-int32 sort as ``bin_gaussians_per_tile``
    but returns the sorted stream itself instead of a fixed-capacity
    [T, K] table: the v4 rasterizer walks each tile's [starts[t],
    starts[t+1]) window with a data-dependent trip count, so there is no
    per-tile capacity — only the global ``max_instances`` stream cap.
    ``gids`` uses N (one past the last gaussian) as the dead-slot sentinel so
    a zero-padded feature row can absorb dead reads.
    """
    T = tiles_x * tiles_y
    N = xys.shape[0]
    M = max_tiles_per_gauss
    I = max_instances

    if order is not None:
        xs = xys[order]
        rs = radii[order]
    else:
        xs = xys
        rs = radii
    x = xs[:, 0]
    y = xs[:, 1]
    r = rs.astype(jnp.float32)

    x0 = jnp.clip(jnp.floor((x - r) / tile_px), 0, tiles_x - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((x + r) / tile_px), 0, tiles_x - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((y - r) / tile_px), 0, tiles_y - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((y + r) / tile_px), 0, tiles_y - 1).astype(jnp.int32)
    inside = ((r > 0)
              & (x + r >= 0) & (x - r < tiles_x * tile_px)
              & (y + r >= 0) & (y - r < tiles_y * tile_px))
    span_w = x1 - x0 + 1
    area = span_w * (y1 - y0 + 1)
    trunc = jnp.where(inside, jnp.maximum(area - M, 0), 0)

    jj = jnp.arange(M, dtype=jnp.int32)[None, :]
    jx = jj % span_w[:, None]
    jy = jj // span_w[:, None]
    tile = (y0[:, None] + jy) * tiles_x + (x0[:, None] + jx)  # [N, M]
    live = inside[:, None] & (jj < jnp.minimum(area, M)[:, None])

    rank = jnp.arange(N, dtype=jnp.int32)
    id_bits = max(int(N - 1).bit_length(), 1)
    tid_ext = jnp.arange(T + 1, dtype=jnp.int32)
    if (T + 1) * (1 << id_bits) < 2 ** 31:
        key = jnp.where(live, (tile << id_bits) | rank[:, None],
                        jnp.int32(2 ** 31 - 1))
        skey = jnp.sort(key.reshape(-1), stable=False)[:I]
        srank = (skey & ((1 << id_bits) - 1)).astype(jnp.int32)
        dead = skey == jnp.int32(2 ** 31 - 1)
        queries = tid_ext << id_bits
    else:
        key = jnp.where(live, tile.astype(jnp.int64) * (N + 1) + rank[:, None],
                        jnp.int64((T + 1) * (N + 1)))
        skey = jnp.sort(key.reshape(-1), stable=False)[:I]
        srank = (skey % (N + 1)).astype(jnp.int32)
        dead = skey == jnp.int64((T + 1) * (N + 1))
        queries = tid_ext.astype(jnp.int64) * (N + 1)

    gids = jnp.where(dead, N, srank)
    if order is not None:
        ordered = jnp.concatenate(
            [order.astype(jnp.int32), jnp.asarray([N], jnp.int32)])
        gids = ordered[gids]
    bounds = jnp.minimum(jnp.searchsorted(skey, queries), I).astype(jnp.int32)
    starts = jnp.concatenate([
        bounds,
        jnp.full((n_tiles_padded - T,), bounds[-1], jnp.int32),
    ]) if n_tiles_padded > T else bounds
    n_total = jnp.where(live, 1, 0).sum()
    n_dropped = (trunc.sum() + jnp.maximum(n_total - I, 0)).astype(jnp.int32)
    return InstanceStream(gids, starts, n_dropped)
