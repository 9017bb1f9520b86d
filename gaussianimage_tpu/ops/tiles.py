"""Tile-intersection machinery for the block-sparse Pallas rasterizer.

The CUDA reference bins *individual* Gaussians into tiles with a radix sort and
per-tile ranges (gsplat's map_gaussian_to_intersects / get_tile_bin_edges,
SURVEY.md N3 [inferred]). On TPU we avoid duplication and sorting entirely:
Gaussians are grouped into fixed blocks of ``block_g``; a small boolean hit
matrix [num_tiles, num_blocks] marks which blocks can touch which image tiles
(bbox overlap at block granularity). From it we build two flattened work-pair
lists with static length:

- forward pairs sorted by tile  -> each image tile accumulates its hit blocks
  in consecutive grid steps (Pallas output revisiting, zero atomics);
- backward pairs sorted by block -> each Gaussian block accumulates its
  parameter gradients over the tiles it touches, likewise race-free.

Because blending is a commutative sum, any order is exact; determinism is by
construction. Everything here is plain jnp and runs fused in XLA each step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PairList(NamedTuple):
    """Flattened (row, col) work pairs derived from a hit matrix.

    ``packed``: int32 [max_pairs], one word per pair — scalar-prefetch memory
    (SMEM) is ~1 MB, so row/col/flags share a word:
        bits [0,2)              flags: bit0 = valid, bit1 = first-of-row
        bits [2, 2+col_bits)    col
        bits [2+col_bits, 32)   row (non-decreasing across pairs)
    Rows with no hits get one invalid "dummy" pair so their output block is
    still zero-initialized. n_dropped counts pairs that did not fit in
    max_pairs (monitoring). ``col_bits`` is a static int.
    """

    packed: jnp.ndarray
    col_bits: int
    n_dropped: jnp.ndarray


def build_pairs(hit: jnp.ndarray, max_pairs: int) -> PairList:
    """hit: bool [R, C]. Returns row-major pair list of the nonzero entries,
    augmented with a dummy pair for all-zero rows, padded/truncated to
    ``max_pairs``.

    Sort-free: pair positions come from an exclusive prefix count (row offsets
    via cumsum + within-row cumsum) and one deterministic scatter — O(R*C)
    elementwise work instead of an argsort over R*C keys. Runs every train
    step, so this is on the hot path.
    """
    R, C = hit.shape
    col_bits = max(int(C).bit_length(), 1)
    assert (R - 1) < (1 << (30 - col_bits)), "pair packing overflow"
    hit = hit.astype(jnp.int32)
    counts = hit.sum(axis=1)  # [R]
    # virtual dummy column C for empty rows
    hit_aug = jnp.concatenate([hit, (counts == 0)[:, None].astype(jnp.int32)],
                              axis=1)  # [R, C+1]
    counts_aug = jnp.maximum(counts, 1)
    row_off = jnp.cumsum(counts_aug) - counts_aug  # exclusive [R]
    within = jnp.cumsum(hit_aug, axis=1) - hit_aug  # exclusive [R, C+1]
    pos = row_off[:, None] + within  # [R, C+1] target slot of each pair
    total = row_off[-1] + counts_aug[-1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (R, C + 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, C + 1), 1)
    valid = (cols < C).astype(jnp.int32)  # dummy pairs: compute-skipped
    first = (within == 0).astype(jnp.int32)
    word = (rows << (2 + col_bits)) | (jnp.where(cols < C, cols, 0) << 2) \
        | valid | (2 * first)

    is_pair = hit_aug > 0
    pos = jnp.where(is_pair & (pos < max_pairs), pos, max_pairs)
    # filler word: last row, invalid, not-first => kernels skip it and the
    # output-block revisit stays on the final written block
    filler = jnp.int32((R - 1) << (2 + col_bits))
    packed = jnp.full((max_pairs + 1,), filler, jnp.int32)
    packed = packed.at[pos.reshape(-1)].set(word.reshape(-1),
                                            mode="drop")[:max_pairs]
    n_dropped = jnp.maximum(total - max_pairs, 0).astype(jnp.int32)
    return PairList(packed, col_bits, n_dropped)


def unpack_row(packed, col_bits: int):
    return packed >> (2 + col_bits)


def unpack_col(packed, col_bits: int):
    return (packed >> 2) & ((1 << col_bits) - 1)


def gaussian_tile_bboxes(
    xys: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-Gaussian inclusive tile-coordinate bbox (x0, x1, y0, y1) + on-image
    mask. Off-image Gaussians get an empty bbox."""
    r = radii.astype(jnp.float32)
    x0 = jnp.floor((xys[:, 0] - r) / tile_px).astype(jnp.int32)
    x1 = jnp.floor((xys[:, 0] + r) / tile_px).astype(jnp.int32)
    y0 = jnp.floor((xys[:, 1] - r) / tile_px).astype(jnp.int32)
    y1 = jnp.floor((xys[:, 1] + r) / tile_px).astype(jnp.int32)
    on = (x1 >= 0) & (x0 <= tiles_x - 1) & (y1 >= 0) & (y0 <= tiles_y - 1) & (r > 0)
    x0 = jnp.clip(x0, 0, tiles_x - 1)
    x1 = jnp.clip(x1, 0, tiles_x - 1)
    y0 = jnp.clip(y0, 0, tiles_y - 1)
    y1 = jnp.clip(y1, 0, tiles_y - 1)
    return x0, x1, y0, y1, on


def block_hit_matrix(
    xys: jnp.ndarray,
    radii: jnp.ndarray,
    valid: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_px: int,
    block_g: int,
) -> jnp.ndarray:
    """Bool hit matrix [tiles_y * tiles_x, N // block_g].

    A block hits a tile if the union bbox of its valid member Gaussians
    overlaps the tile. N must already be padded to a multiple of block_g;
    padded entries are masked out via ``valid``.
    """
    N = xys.shape[0]
    nb = N // block_g
    x0, x1, y0, y1, on = gaussian_tile_bboxes(xys, radii, tiles_x, tiles_y, tile_px)
    ok = on & valid
    big = jnp.int32(1 << 30)
    x0 = jnp.where(ok, x0, big).reshape(nb, block_g).min(axis=1)
    y0 = jnp.where(ok, y0, big).reshape(nb, block_g).min(axis=1)
    x1 = jnp.where(ok, x1, -big).reshape(nb, block_g).max(axis=1)
    y1 = jnp.where(ok, y1, -big).reshape(nb, block_g).max(axis=1)

    t = jnp.arange(tiles_y * tiles_x, dtype=jnp.int32)
    tx = (t % tiles_x)[:, None]
    ty = (t // tiles_x)[:, None]
    return (tx >= x0[None]) & (tx <= x1[None]) & (ty >= y0[None]) & (ty <= y1[None])


def spatial_sort_order(
    xys: jnp.ndarray, valid: jnp.ndarray, tiles_x: int, tiles_y: int, tile_px: int
) -> jnp.ndarray:
    """Permutation sorting Gaussians by the row-major tile id of their center,
    invalid/padded entries last. Grouping nearby Gaussians into the same block
    tightens block bboxes and cuts (tile, block) pairs by ~an order of
    magnitude — the TPU analog of the CUDA tile binning pass."""
    cx = jnp.clip((xys[:, 0] / tile_px).astype(jnp.int32), 0, tiles_x - 1)
    cy = jnp.clip((xys[:, 1] / tile_px).astype(jnp.int32), 0, tiles_y - 1)
    key = jnp.where(valid, cy * tiles_x + cx, jnp.int32(tiles_x * tiles_y))
    return jnp.argsort(key, stable=True)
