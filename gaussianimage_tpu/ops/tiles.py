"""Per-Gaussian tile binning for the rasterizers.

The CUDA reference bins gaussian instances into tiles with
map_gaussian_to_intersects + radix sort + get_tile_bin_edges (SURVEY.md N3,
[inferred]). The TPU-native equivalent is sort-free: a scan over Gaussian
chunks builds fixed-capacity per-tile index tables [num_tiles, K] with a
bounded [num_tiles, chunk] hit matrix per step and a per-tile running count,
all fused XLA. Within a tile, stored indices preserve the input order (pass
depth-sorted indices for the alpha-blend rasterizer; any order for the
commutative sum rasterizer).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


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
    gauss_chunk: int = 1024,
) -> TileBins:
    """xys [N,2] px, radii [N] (0 = cull). ``order`` optionally remaps the
    processing order (e.g. depth sort). Non-differentiable (int outputs)."""
    T = tiles_x * tiles_y
    K = max_per_tile
    N = xys.shape[0]
    C = min(gauss_chunk, max(N, 1))
    if order is None:
        order = jnp.arange(N, dtype=jnp.int32)
    pad = (-N) % C
    idx = jnp.concatenate([order.astype(jnp.int32),
                           jnp.full((pad,), -1, jnp.int32)]) if pad else order
    xs = xys[order]
    rs = radii[order]
    if pad:
        xs = jnp.concatenate([xs, jnp.zeros((pad, 2), xys.dtype)])
        rs = jnp.concatenate([rs, jnp.zeros((pad,), radii.dtype)])
    n_chunks = (N + pad) // C

    tile_t = jnp.arange(T, dtype=jnp.int32)
    tx = (tile_t % tiles_x)[:, None]
    ty = (tile_t // tiles_x)[:, None]

    def body(carry, args):
        table, counts = carry
        cxy, cr, cidx = args
        x0 = jnp.floor((cxy[:, 0] - cr) / tile_px)
        x1 = jnp.floor((cxy[:, 0] + cr) / tile_px)
        y0 = jnp.floor((cxy[:, 1] - cr) / tile_px)
        y1 = jnp.floor((cxy[:, 1] + cr) / tile_px)
        ok = (cidx >= 0) & (cr > 0)
        hit = (ok[None, :] & (tx >= x0[None]) & (tx <= x1[None])
               & (ty >= y0[None]) & (ty <= y1[None])).astype(jnp.int32)
        within = jnp.cumsum(hit, axis=1) - hit
        pos = counts[:, None] + within
        dest = jnp.where((hit > 0) & (pos < K), tile_t[:, None] * K + pos,
                         T * K)
        flat = jnp.concatenate([table.reshape(-1),
                                jnp.zeros((1,), table.dtype)])
        flat = flat.at[dest.reshape(-1)].set(
            jnp.broadcast_to(cidx[None, :], dest.shape).reshape(-1),
            mode="drop")
        return (flat[:-1].reshape(T, K), counts + hit.sum(axis=1)), None

    table0 = jnp.full((T, K), -1, jnp.int32)
    (table, counts), _ = jax.lax.scan(
        body, (table0, jnp.zeros((T,), jnp.int32)),
        (xs.reshape(n_chunks, C, 2), rs.reshape(n_chunks, C),
         idx.reshape(n_chunks, C)))
    n_dropped = jnp.maximum(counts - K, 0).sum().astype(jnp.int32)
    return TileBins(table, jnp.minimum(counts, K), n_dropped)
