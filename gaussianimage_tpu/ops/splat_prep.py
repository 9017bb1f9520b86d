"""Fused decode-side splat preparation — ONE Pallas pass from code arrays to
(packed feature rows + binning sort keys).

Motivation: on the axon runtime the per-op launch overhead (~3 us) dominates
the decode path's glue — dequantize (uniform scale/beta, VQ codebook gather,
f16 tanh means), projection (Cholesky -> covariance -> conic -> radii), the
[N+1, 16] feature packing, and the [M, N] instance expansion each cost an op
or a small fusion, ~30 ops/frame total (CLAUDE.md: ~0.1 ms/frame op floor).
This kernel computes all of it in one launch, emitting exactly what the
sort-based binning needs:

- ``feat`` [N+1, 16]: the premultiplied feature rows ``pack_feat`` builds
  (reference semantics: fixed opacity 1 on the Cholesky decode path,
  gaussianimage_cholesky.py:33).
- ``keys`` [N_pad * M]: the packed int32 tile-sort keys ``(tile << id_bits)
  | gaussian_id`` with dead slots at INT32_MAX — bit-compatible with
  ops/tiles.py ``_sorted_stream``'s packed branch, so one ``jnp.sort`` +
  compare-reduce bounds finish the binning.
- per-gaussian (trunc, live) counts for the n_dropped accounting.

The math replicates core/covariance.py + ops/rasterize_sum.py `_axis_radii`
+ ops/tiles.py `_expand_instances` op-for-op (same eps, clips and floors);
parity is pinned by tests/test_splat_prep.py against the reference chain.

Decode/inference only — no VJP (training keeps the autodiff projection +
custom-vjp rasterizer). Opt in via RasterizeConfig.fused_prep.

Parity note: vs the generic path the fused image differs only at isolated
pixels where an instance sits exactly on a binning boundary (fp
reassociation flips a ceil/clip in the last ulp, so one gaussian tail
drops in/out of a tile). Measured on the committed china@10k artifact
(CPU interpret): mean |err| 5.4e-8, 10 pixels > 1e-4, path-vs-path PSNR
112.5 dB.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from gaussianimage_tpu.ops import stream_common as sc

_BLK_CAP = 1024  # max gaussians per grid step. Mosaic pads the lane dim of
#   every [blk, M<=128] temporary to 128 lanes, so the ~10 live temporaries
#   of _project_pack_bin cost blk*128*4 B each — at 16k rows that is ~60 MB
#   of scoped VMEM (observed on-TPU OOM vs the 16 MB limit); 1024 rows keep
#   the stack under ~4 MB and the grid still runs inside ONE kernel launch
_INT_MAX = np.int32(2 ** 31 - 1)


def _block_rows(N: int, cap: int = _BLK_CAP) -> int:
    """Gaussians per grid step: one step when the scene fits the cap."""
    return min(cap, -(-(N + 1) // 8) * 8)


def _project_pack_bin(row, valid, mx, my, s11, s12, s22, colors,
                      feat_ref, keys_ref, stats_ref, *,
                      N, H, W, tile_px, tiles_x, tiles_y, M, id_bits,
                      q_cut, blk, y_off=None, row_lo=None, row_hi=None):
    """Shared core: pixel mapping, covariance -> conic/radii, premultiplied
    feature rows (opacity == 1 on these models), packed binning keys and
    truncation accounting. Covariance entries (s11, s12, s22) come from the
    per-parameterization front (Cholesky or scale-rot). All math replicates
    core/covariance.py + rasterize_sum._axis_radii +
    tiles._expand_instances op-for-op.

    ORIENTATION: every per-gaussian value is a [1, blk] ROW vector
    (gaussians on lanes — full 128-lane VPU utilization; the original
    [blk, 1] column layout padded every op's lane dim to 128, a measured
    ~13 us/block vs ~1 us transposed); ``colors`` is [3, blk].

    Batched stacking (``y_off``/``row_lo``/``row_hi``, each [1, blk] f32):
    ``H`` is then the PER-FRAME height used for the NDC->pixel mapping,
    ``y_off`` shifts each row into its frame's band on the tall canvas,
    and the tile-row clips use the per-row band bounds instead of
    [0, tiles_y-1] — exactly tiles._expand_instances' ``band`` semantics
    (the ``inside`` test stays against the full canvas, like there)."""
    x = 0.5 * ((mx + 1.0) * W - 1.0)
    y = 0.5 * ((my + 1.0) * H - 1.0)
    if y_off is not None:
        y = y + y_off
    det = s11 * s22 - s12 * s12
    inv_det = 1.0 / jnp.maximum(det, 1e-6)
    ca = s22 * inv_det
    cb = -s12 * inv_det
    cc = s11 * inv_det
    # radius_from_cov2d: ceil(3 * sqrt(lambda_max))
    mid = 0.5 * (s11 + s22)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 1e-12)))
    # _axis_radii: exact per-axis extents of the q <= q_cut ellipse
    cdet = jnp.maximum(ca * cc - cb * cb, 1e-12)
    rx = jnp.sqrt(q_cut * jnp.maximum(cc, 0.0) / cdet)
    ry = jnp.sqrt(q_cut * jnp.maximum(ca, 0.0) / cdet)
    live = radii > 0
    rx = jnp.where(live, jnp.minimum(rx, radii), 0.0)
    ry = jnp.where(live, jnp.minimum(ry, radii), 0.0)

    _pack_bin(row, valid, x, y, ca, cb, cc, rx, ry, colors,
              jnp.ones((1, blk), jnp.float32), feat_ref, keys_ref,
              stats_ref, tile_px=tile_px, tiles_x=tiles_x, tiles_y=tiles_y,
              M=M, id_bits=id_bits, blk=blk, row_lo=row_lo, row_hi=row_hi)


def _pack_bin(row, valid, x, y, ca, cb, cc, rx, ry, colors, opac,
              feat_ref, keys_ref, stats_ref, *, tile_px, tiles_x, tiles_y,
              M, id_bits, blk, row_lo=None, row_hi=None):
    """Shared tail of every prep front: feature rows (pack_feat layout —
    with opacity-premultiplied colors the cm rows of the sum kernel, with
    raw colors + real opacity the blend kernel's), packed binning keys
    (tiles._expand_instances semantics) and truncation accounting.
    ``rx``/``ry`` are the binning bbox half-extents (the sum path's exact
    q<=q_cut ellipse extents, or the blend path's isotropic radius).
    All scalars [1, blk], colors [3, blk] (see _project_pack_bin's
    orientation note); the ONE transpose back to row layout happens at the
    feat store."""
    # ---- feature rows -----------------------------------------------------
    featT = jnp.concatenate(
        [x, y, ca, cb, cc, colors, opac,
         jnp.zeros((sc.FW - 9, blk), jnp.float32)], axis=0)  # [16, blk]
    feat_ref[...] = jnp.where(valid, featT, 0.0).T

    # ---- binning keys (_expand_instances + packed key, slot-minor) -------
    lo = jnp.float32(0.0) if row_lo is None else row_lo
    hi = jnp.float32(tiles_y - 1) if row_hi is None else row_hi
    x0 = jnp.clip(jnp.floor((x - rx) / tile_px), 0, tiles_x - 1)
    x1 = jnp.clip(jnp.floor((x + rx) / tile_px), 0, tiles_x - 1)
    y0 = jnp.clip(jnp.floor((y - ry) / tile_px), lo, hi)
    y1 = jnp.clip(jnp.floor((y + ry) / tile_px), lo, hi)
    inside = ((rx > 0) & (ry > 0)
              & (x + rx >= 0) & (x - rx < tiles_x * tile_px)
              & (y + ry >= 0) & (y - ry < tiles_y * tile_px))
    span_w = x1 - x0 + 1.0                                    # [1, blk] f32
    area = span_w * (y1 - y0 + 1.0)
    # int iota then cast: Mosaic rejects tpu.iota with a float result type
    # (interpret mode tolerates it — this is an on-TPU-only constraint)
    jj = jax.lax.broadcasted_iota(jnp.int32, (M, blk), 0).astype(jnp.float32)
    jy = jnp.floor(jj / span_w)          # exact for small ints (see tests)
    jx = jj - jy * span_w
    tile = (y0 + jy) * tiles_x + (x0 + jx)                    # [M, blk] f32
    live_j = (inside & valid & (jj < jnp.minimum(area, float(M))))
    key = jnp.left_shift(tile.astype(jnp.int32), id_bits) | row
    keys_ref[...] = jnp.where(live_j, key, _INT_MAX)

    # ---- accounting ------------------------------------------------------
    trunc = jnp.where(inside & valid,
                      jnp.maximum(area - float(M), 0.0), 0.0)
    n_live = jnp.where(inside & valid, jnp.minimum(area, float(M)), 0.0)
    stats_ref[...] = jnp.concatenate([trunc, n_live], axis=0)


def _decode_kernel(xyz_ref, codes_ref, idx_ref, scale_ref, beta_ref,
                   embed_ref, feat_ref, keys_ref, stats_ref, *,
                   N, H, W, tile_px, tiles_x, tiles_y, M, id_bits, q_cut,
                   bound, blk):
    pid = pl.program_id(0)
    row = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
           + pid * blk)                      # [1, blk] global gaussian id
    valid = row < N                          # sentinel/pad rows

    # means: tanh(f16-rounded codes) -> NDC (the f16 -> f32 cast happens at
    # the call site; Mosaic fp16 support is shaky, values are identical)
    means = jnp.tanh(xyz_ref[...].T)                          # [2, blk]
    # cholesky: codes * scale + beta, then the reference bound offset
    # (bound enters as three static scalars — a captured [3] array would be
    # a pallas constant)
    chol = (codes_ref[...].T.astype(jnp.float32) * scale_ref[...].T
            + beta_ref[...].T)                                # [3, blk]
    b0, b1, b2 = (float(bound[0]), float(bound[1]), float(bound[2]))
    # colors: residual-VQ combined-codebook lookup (codec/vq.py decompress
    # = sum of per-layer embeddings == one gather from the combined table)
    idx = idx_ref[...].T                                      # [2, blk]
    comb = idx[0:1] * 8 + idx[1:2]                            # [1, blk]
    oh = (comb == jax.lax.broadcasted_iota(jnp.int32, (64, blk), 0))
    colors = jax.lax.dot_general(
        embed_ref[...].T, oh.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # [3, blk]
    l11 = chol[0:1] + b0
    l21 = chol[1:2] + b1
    l22 = chol[2:3] + b2
    _project_pack_bin(
        row, valid, means[0:1], means[1:2], l11 * l11, l11 * l21,
        l21 * l21 + l22 * l22, colors, feat_ref, keys_ref, stats_ref,
        N=N, H=H, W=W, tile_px=tile_px, tiles_x=tiles_x, tiles_y=tiles_y,
        M=M, id_bits=id_bits, q_cut=q_cut, blk=blk)


def _batch_decode_kernel(xyz_ref, codes_ref, idx_ref, scale_ref, beta_ref,
                         embed_ref, feat_ref, keys_ref, stats_ref, *,
                         N, H, W, tile_px, tiles_x, tiles_y, M, id_bits,
                         q_cut, bound, blk, n_per, b):
    """Batched Cholesky decode front: B frames' code arrays flattened to
    [B*n_per, .] rows through ONE prep pass. Per-frame side info (quantizer
    scale/beta [B, 3], combined VQ codebooks [B*64, 3]) is selected by each
    row's frame id via exact one-hot matmuls (HIGHEST keeps f32 values
    bit-identical to a gather). Keys land on the tall stacked canvas with
    per-frame tile-row bands — batched.py's vertical stacking with exact
    containment, but with zero XLA-side per-frame glue."""
    pid = pl.program_id(0)
    row = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + pid * blk)
    valid = row < N
    # frame id by comparison ladder (exact; avoids in-kernel int division)
    frame = jnp.zeros_like(row)
    for f in range(1, b):
        frame = frame + (row >= f * n_per).astype(jnp.int32)
    means = jnp.tanh(xyz_ref[...].T)                           # [2, blk]
    fo = (frame == jax.lax.broadcasted_iota(jnp.int32, (b, blk), 0)
          ).astype(jnp.float32)                                # [B, blk]

    def sel(ref):
        return jax.lax.dot_general(
            ref[...].T, fo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # [3, blk]

    chol = (codes_ref[...].T.astype(jnp.float32) * sel(scale_ref)
            + sel(beta_ref))
    b0, b1, b2 = (float(bound[0]), float(bound[1]), float(bound[2]))
    idx = idx_ref[...].T                                       # [2, blk]
    comb = (frame * 64 + idx[0:1] * 8 + idx[1:2])              # [1, blk]
    oh = (comb == jax.lax.broadcasted_iota(jnp.int32, (64 * b, blk), 0))
    colors = jax.lax.dot_general(
        embed_ref[...].T, oh.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                   # [3, blk]
    h_frame = H // b
    rows_pf = tiles_y // b
    ff = frame.astype(jnp.float32)
    l11 = chol[0:1] + b0
    l21 = chol[1:2] + b1
    l22 = chol[2:3] + b2
    _project_pack_bin(
        row, valid, means[0:1], means[1:2], l11 * l11, l11 * l21,
        l21 * l21 + l22 * l22, colors, feat_ref, keys_ref, stats_ref,
        N=N, H=h_frame, W=W, tile_px=tile_px, tiles_x=tiles_x,
        tiles_y=tiles_y, M=M, id_bits=id_bits, q_cut=q_cut, blk=blk,
        y_off=ff * float(h_frame), row_lo=ff * float(rows_pf),
        row_hi=ff * float(rows_pf) + float(rows_pf - 1))


def _raw_kernel(xyz_ref, chol_ref, colors_ref, feat_ref, keys_ref,
                stats_ref, *, N, H, W, tile_px, tiles_x, tiles_y, M,
                id_bits, q_cut, bound, blk):
    """Non-quantized render prep: raw params -> feat + keys (the inference
    render path's glue — tanh means, bound offset, projection, packing)."""
    pid = pl.program_id(0)
    row = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + pid * blk)
    valid = row < N
    means = jnp.tanh(xyz_ref[...].T)                           # [2, blk]
    chol = chol_ref[...].T                                     # [3, blk]
    b0, b1, b2 = (float(bound[0]), float(bound[1]), float(bound[2]))
    l11 = chol[0:1] + b0
    l21 = chol[1:2] + b1
    l22 = chol[2:3] + b2
    _project_pack_bin(
        row, valid, means[0:1], means[1:2], l11 * l11, l11 * l21,
        l21 * l21 + l22 * l22, colors_ref[...].T, feat_ref, keys_ref,
        stats_ref,
        N=N, H=H, W=W, tile_px=tile_px, tiles_x=tiles_x, tiles_y=tiles_y,
        M=M, id_bits=id_bits, q_cut=q_cut, blk=blk)


def _run_prep(kernel_fn, arrays, in_widths, N, H, W, cfg, m_span,
              bound, blk_cap: int = _BLK_CAP
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                         jnp.ndarray]:
    """Shared pallas_call plumbing for every prep front. ``in_widths``:
    per-input block shape — an int k means a row-blocked (blk, k) input, a
    (r, k) tuple a constant block replicated to every grid step. Returns
    (feat [N+1,16], keys [N_pad*M] int32 flat, trunc [], n_total []).
    ``blk_cap``: rows per grid step — kernels with many live [blk, 128]-
    padded temporaries (the 3DGS front's ~60) must shrink it to fit the
    ~26 MB scoped-VMEM stack."""
    tp = cfg.tile_px
    tiles_x = -(-W // tp)
    tiles_y = -(-H // tp)
    M = m_span
    id_bits = max(int(N - 1).bit_length(), 1)
    assert (tiles_x * tiles_y + 1) * (1 << id_bits) < 2 ** 31, (
        "fused prep requires the packed-key regime")
    blk = _block_rows(N, blk_cap)
    n_pad = -(-(N + 1) // blk) * blk
    grid = n_pad // blk

    kern = lambda *refs: kernel_fn(  # noqa: E731
        *refs, N=N, H=H, W=W, tile_px=tp, tiles_x=tiles_x, tiles_y=tiles_y,
        M=M, id_bits=id_bits, q_cut=float(getattr(cfg, "q_cut", 0.0)),
        bound=np.asarray(bound, np.float32), blk=blk)

    in_specs = [
        (pl.BlockSpec((w[0], w[1]), lambda b: (0, 0)) if isinstance(w, tuple)
         else pl.BlockSpec((blk, w), lambda b: (b, 0)))
        for w in in_widths]

    feat, keys, stats = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((blk, sc.FW), lambda b: (b, 0)),
            pl.BlockSpec((M, blk), lambda b: (0, b)),
            pl.BlockSpec((2, blk), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, sc.FW), jnp.float32),
            jax.ShapeDtypeStruct((M, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((2, n_pad), jnp.float32),
        ],
        interpret=sc.use_interpret(cfg),
    )(*arrays)
    tot = stats.sum(axis=1)
    # keys flatten in slot-major order — a permutation of the row-major
    # stream; the only consumer is a sort, which is order-invariant
    return (feat[:N + 1], keys.reshape(-1),
            tot[0].astype(jnp.int32), tot[1].astype(jnp.int32))


def _row_spec(k):
    return k            # row-blocked (blk, k) — resolved in _run_prep


def _const_spec(r, k):
    return (r, k)       # constant block replicated to every grid step


def fused_prep_cholesky(
    enc_xyz: jnp.ndarray,        # [N, 2] float16 codes
    chol_codes: jnp.ndarray,     # [N, 3] int codes
    quant_scale: jnp.ndarray,    # [3]
    quant_beta: jnp.ndarray,     # [3]
    bound: np.ndarray,           # [3] static cholesky bound offset
    vq_idx: jnp.ndarray,         # [N, 2] int32 residual-VQ indices
    embed_combined: jnp.ndarray,  # [64, 3] combined codebook
    H: int, W: int, cfg, m_span: int,
):
    """Cholesky decode front: code arrays -> (feat, keys, trunc, n_total)."""
    return _run_prep(
        _decode_kernel,
        (enc_xyz.astype(jnp.float32), chol_codes.astype(jnp.int32),
         vq_idx.astype(jnp.int32),
         quant_scale.reshape(1, 3).astype(jnp.float32),
         quant_beta.reshape(1, 3).astype(jnp.float32),
         embed_combined.astype(jnp.float32)),
        [_row_spec(2), _row_spec(3), _row_spec(2),
         _const_spec(1, 3), _const_spec(1, 3), _const_spec(64, 3)],
        enc_xyz.shape[0], H, W, cfg, m_span, bound)


def fused_raw_prep_cholesky(
    xyz: jnp.ndarray,            # [N, 2] raw atanh-space positions
    chol_raw: jnp.ndarray,       # [N, 3] raw cholesky params (pre-bound)
    colors: jnp.ndarray,         # [N, 3]
    bound: np.ndarray,           # [3] static cholesky bound offset
    H: int, W: int, cfg, m_span: int,
):
    """Raw-parameter Cholesky front (inference render path)."""
    return _run_prep(
        _raw_kernel,
        (xyz.astype(jnp.float32), chol_raw.astype(jnp.float32),
         colors.astype(jnp.float32)),
        [_row_spec(2), _row_spec(3), _row_spec(3)],
        xyz.shape[0], H, W, cfg, m_span, bound)


def fused_prep_cholesky_batch(
    enc_xyz: jnp.ndarray,        # [B*N, 2] f32 (f16 codes, cast at call)
    chol_codes: jnp.ndarray,     # [B*N, 3] int codes
    quant_scale: jnp.ndarray,    # [B, 3] per-frame learned scale
    quant_beta: jnp.ndarray,     # [B, 3]
    bound: np.ndarray,           # [3] static cholesky bound offset
    vq_idx: jnp.ndarray,         # [B*N, 2] int32 residual-VQ indices
    embed_combined: jnp.ndarray,  # [B*64, 3] per-frame combined codebooks
    B: int, H_total: int, W: int, cfg, m_span: int,
):
    """Batched Cholesky decode front over the H_total = B*H stacked canvas."""
    n_tot = enc_xyz.shape[0]
    kern = functools.partial(_batch_decode_kernel, n_per=n_tot // B, b=B)
    return _run_prep(
        kern,
        (enc_xyz.astype(jnp.float32), chol_codes.astype(jnp.int32),
         vq_idx.astype(jnp.int32),
         quant_scale.reshape(B, 3).astype(jnp.float32),
         quant_beta.reshape(B, 3).astype(jnp.float32),
         embed_combined.astype(jnp.float32)),
        [_row_spec(2), _row_spec(3), _row_spec(2),
         _const_spec(B, 3), _const_spec(B, 3), _const_spec(64 * B, 3)],
        n_tot, H_total, W, cfg, m_span, bound)


def fused_decode_cholesky_batch(enc_xyz_b, chol_codes_b, scale_b, beta_b,
                                bound, vq_idx_b, embed_b, H: int, W: int,
                                cfg):
    """Full fused BATCHED decode: one prep kernel over B stacked frames +
    one sort-binned forward rasterize on the [3, B*H, W] canvas. Inputs
    carry a leading [B] frame dim (embed_b [B, 64, 3]); ``cfg`` is the
    batched raster config (instance budget scaled to B*N). Returns
    (img [3, B*H, W], alpha [B*H, W], aux) — unclamped, caller clamps and
    unstacks."""
    from gaussianimage_tpu.ops.rasterize_sum import rasterize_from_keys_chw

    B, Np = enc_xyz_b.shape[0], enc_xyz_b.shape[1]
    N = B * Np
    I0, m_span, aligned = sc.stream_caps(N, cfg)
    assert not aligned, "fused batched decode prep is flat-stream only"
    feat, keys, trunc, n_total = fused_prep_cholesky_batch(
        enc_xyz_b.reshape(N, 2), chol_codes_b.reshape(N, 3),
        scale_b, beta_b, bound, vq_idx_b.reshape(N, 2),
        embed_b.reshape(B * 64, 3), B, H * B, W, cfg, m_span)
    return rasterize_from_keys_chw(feat, keys, trunc, n_total, H * B, W,
                                   cfg, I0)


def _rs_cov(sx, sy, theta):
    """cov2d_from_scale_rot, op-for-op (core/covariance.py); [1, blk]
    row vectors."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    sx2 = sx * sx
    sy2 = sy * sy
    s11 = c * c * sx2 + s * s * sy2
    s12 = c * s * (sx2 - sy2)
    s22 = s * s * sx2 + c * c * sy2
    return s11, s12, s22


def _rs_decode_kernel(xyz_ref, scodes_ref, rcodes_ref, idx_ref, sq_ref,
                      rq_ref, embed_ref, feat_ref, keys_ref, stats_ref, *,
                      N, H, W, tile_px, tiles_x, tiles_y, M, id_bits,
                      q_cut, bound, blk):
    """RS decode front: quantized raw scaling (abs(s+bound) after dequant)
    + quantized ACTIVATED rotation (radians directly — models/rs.py:57-63,
    reference gaussianimage_rs.py:50-52)."""
    pid = pl.program_id(0)
    row = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + pid * blk)
    valid = row < N
    means = jnp.tanh(xyz_ref[...].T)                          # [2, blk]
    b0, b1 = float(bound[0]), float(bound[1])
    scodes = scodes_ref[...].T.astype(jnp.float32)            # [2, blk]
    sq = sq_ref[...]                                          # [1, 4]
    s0 = scodes[0:1] * sq[0:1, 0:1] + sq[0:1, 2:3]
    s1 = scodes[1:2] * sq[0:1, 1:2] + sq[0:1, 3:4]
    sx = jnp.abs(s0 + b0)
    sy = jnp.abs(s1 + b1)
    rq = rq_ref[...]                                          # [1, 2]
    theta = (rcodes_ref[...].T.astype(jnp.float32) * rq[0:1, 0:1]
             + rq[0:1, 1:2])                                  # [1, blk]
    idx = idx_ref[...].T                                      # [2, blk]
    comb = idx[0:1] * 8 + idx[1:2]
    oh = (comb == jax.lax.broadcasted_iota(jnp.int32, (64, blk), 0))
    colors = jax.lax.dot_general(
        embed_ref[...].T, oh.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # [3, blk]
    s11, s12, s22 = _rs_cov(sx, sy, theta)
    _project_pack_bin(
        row, valid, means[0:1], means[1:2], s11, s12, s22, colors,
        feat_ref, keys_ref,
        stats_ref, N=N, H=H, W=W, tile_px=tile_px, tiles_x=tiles_x,
        tiles_y=tiles_y, M=M, id_bits=id_bits, q_cut=q_cut, blk=blk)


def _rs_raw_kernel(xyz_ref, scaling_ref, rot_ref, colors_ref, feat_ref,
                   keys_ref, stats_ref, *, N, H, W, tile_px, tiles_x,
                   tiles_y, M, id_bits, q_cut, bound, blk):
    """RS raw front: abs(s + bound) scaling, sigmoid * 2pi rotation."""
    pid = pl.program_id(0)
    row = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + pid * blk)
    valid = row < N
    means = jnp.tanh(xyz_ref[...].T)                          # [2, blk]
    b0, b1 = float(bound[0]), float(bound[1])
    s_raw = scaling_ref[...].T                                # [2, blk]
    sx = jnp.abs(s_raw[0:1] + b0)
    sy = jnp.abs(s_raw[1:2] + b1)
    theta = jax.nn.sigmoid(rot_ref[...].T) * (2.0 * np.pi)    # [1, blk]
    s11, s12, s22 = _rs_cov(sx, sy, theta)
    _project_pack_bin(
        row, valid, means[0:1], means[1:2], s11, s12, s22,
        colors_ref[...].T, feat_ref,
        keys_ref, stats_ref, N=N, H=H, W=W, tile_px=tile_px,
        tiles_x=tiles_x, tiles_y=tiles_y, M=M, id_bits=id_bits,
        q_cut=q_cut, blk=blk)


def fused_prep_rs(enc_xyz, scaling_codes, rot_codes, s_scale, s_beta,
                  r_scale, r_beta, bound, vq_idx, embed_combined,
                  H: int, W: int, cfg, m_span: int):
    """RS decode front wrapper. Quantizer side info packs into two tiny
    constant blocks ([1,4] scaling scale+beta, [1,2] rotation)."""
    sq = jnp.concatenate([s_scale.reshape(-1), s_beta.reshape(-1)]
                         ).reshape(1, 4).astype(jnp.float32)
    rq = jnp.concatenate([r_scale.reshape(-1), r_beta.reshape(-1)]
                         ).reshape(1, 2).astype(jnp.float32)
    return _run_prep(
        _rs_decode_kernel,
        (enc_xyz.astype(jnp.float32), scaling_codes.astype(jnp.int32),
         rot_codes.astype(jnp.int32), vq_idx.astype(jnp.int32), sq, rq,
         embed_combined.astype(jnp.float32)),
        [_row_spec(2), _row_spec(2), _row_spec(1), _row_spec(2),
         _const_spec(1, 4), _const_spec(1, 2), _const_spec(64, 3)],
        enc_xyz.shape[0], H, W, cfg, m_span, bound)


def fused_raw_prep_rs(xyz, scaling_raw, rot_raw, colors, bound,
                      H: int, W: int, cfg, m_span: int):
    """RS raw front wrapper (inference render path)."""
    return _run_prep(
        _rs_raw_kernel,
        (xyz.astype(jnp.float32), scaling_raw.astype(jnp.float32),
         rot_raw.astype(jnp.float32), colors.astype(jnp.float32)),
        [_row_spec(2), _row_spec(2), _row_spec(1), _row_spec(3)],
        xyz.shape[0], H, W, cfg, m_span, bound)


def fused_render_cholesky(xyz, chol_raw, colors, bound, H: int, W: int,
                          cfg):
    """Fused inference render from raw params: ONE prep kernel + sort-binned
    forward rasterize. Returns (img [3,H,W], alpha [H,W], aux) unclamped."""
    from gaussianimage_tpu.ops.rasterize_sum import rasterize_from_keys_chw

    N = xyz.shape[0]
    I0, m_span, aligned = sc.stream_caps(N, cfg)
    assert not aligned, "fused render prep is flat-stream only"
    feat, keys, trunc, n_total = fused_raw_prep_cholesky(
        xyz, chol_raw, colors, bound, H, W, cfg, m_span)
    return rasterize_from_keys_chw(feat, keys, trunc, n_total, H, W, cfg,
                                   I0)


def fused_decode_rs(enc_xyz, scaling_codes, rot_codes, s_scale, s_beta,
                    r_scale, r_beta, bound, vq_idx, embed_combined,
                    H: int, W: int, cfg):
    """Full fused RS decode (see fused_decode_cholesky)."""
    from gaussianimage_tpu.ops.rasterize_sum import rasterize_from_keys_chw

    N = enc_xyz.shape[0]
    I0, m_span, aligned = sc.stream_caps(N, cfg)
    assert not aligned, "fused decode prep is flat-stream only"
    feat, keys, trunc, n_total = fused_prep_rs(
        enc_xyz, scaling_codes, rot_codes, s_scale, s_beta, r_scale,
        r_beta, bound, vq_idx, embed_combined, H, W, cfg, m_span)
    return rasterize_from_keys_chw(feat, keys, trunc, n_total, H, W, cfg,
                                   I0)


def fused_render_rs(xyz, scaling_raw, rot_raw, colors, bound,
                    H: int, W: int, cfg):
    """Fused RS inference render from raw params."""
    from gaussianimage_tpu.ops.rasterize_sum import rasterize_from_keys_chw

    N = xyz.shape[0]
    I0, m_span, aligned = sc.stream_caps(N, cfg)
    assert not aligned, "fused render prep is flat-stream only"
    feat, keys, trunc, n_total = fused_raw_prep_rs(
        xyz, scaling_raw, rot_raw, colors, bound, H, W, cfg, m_span)
    return rasterize_from_keys_chw(feat, keys, trunc, n_total, H, W, cfg,
                                   I0)


def fused_decode_supported(N: int, H: int, W: int, cfg) -> bool:
    """Static gate: flat-stream + packed-key regime (the fused prep's only
    mode); callers fall back to the generic decode path otherwise."""
    if not getattr(cfg, "fused_prep", False):
        return False
    _, _, aligned = sc.stream_caps(N, cfg)
    if aligned:
        return False
    tp = cfg.tile_px
    tiles = (-(-W // tp)) * (-(-H // tp))
    id_bits = max(int(N - 1).bit_length(), 1)
    return (tiles + 1) * (1 << id_bits) < 2 ** 31


def fused_decode_cholesky(enc_xyz, chol_codes, quant_scale, quant_beta,
                          bound, vq_idx, embed_combined, H: int, W: int,
                          cfg):
    """Full fused decode: ONE prep kernel + sort-binned forward rasterize.
    Returns (img [3,H,W], alpha [H,W], aux) — unclamped, like
    rasterize_gaussians_sum_chw (the model clamps)."""
    from gaussianimage_tpu.ops.rasterize_sum import rasterize_from_keys_chw

    N = enc_xyz.shape[0]
    I0, m_span, aligned = sc.stream_caps(N, cfg)
    assert not aligned, "fused decode prep is flat-stream only"
    feat, keys, trunc, n_total = fused_prep_cholesky(
        enc_xyz, chol_codes, quant_scale, quant_beta, bound, vq_idx,
        embed_combined, H, W, cfg, m_span)
    return rasterize_from_keys_chw(feat, keys, trunc, n_total, H, W, cfg,
                                   I0)
