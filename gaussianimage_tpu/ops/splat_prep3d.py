"""Fused 3DGS splat preparation — ONE Pallas pass from raw parameters to
(blend feature rows + binning sort keys) for the sorted-alpha-blend path.

Motivation (PROFILE_r03 blend_3dgs_8f): the XLA projection pipeline
(core/camera3d.py quat->R, EWA J W Sigma W^T J^T, conic, radii; core/sh.py
SH eval) compiles to [N]-shaped column fusions at ~1/128 lane utilization —
~270 us/frame of a ~1.6 ms frame at N=10k on v5e — plus the depth-order id
remap gather. This kernel computes the whole inference front in one launch
over DEPTH-ORDERED rows (the caller reorders the [N, k] inputs with cheap
row gathers), emitting exactly what the blend rasterizer needs:

- ``feat`` [N+1, 16]: pack_feat(premultiply=False) rows — (x, y, conic a b c,
  rgb from SH, sigmoid opacity) — with the zero sentinel row at N.
- ``keys`` [N_pad * M]: packed int32 (tile << id_bits) | rank sort keys with
  dead slots at INT32_MAX; rank == row index in the depth-ordered stream, so
  the per-tile windows come out depth-sorted with NO id remap.
- per-gaussian (trunc, live) accounting.

The math replicates core/camera3d.py project_gaussians + core/sh.py
spherical_harmonics + models/gs3d.py's activations op-for-op (the 0.3 px
low-pass, clip_near cull, +0.5 SH offset and clamp, reference
gaussiansplatting_3d.py:102-122); parity is pinned by tests/test_gs3d.py
against the generic render. Binning uses the ISOTROPIC 3-sigma radius like
rasterize_gaussians_blend's prepare_stream call (the blend kernel has no
q_cut gate, so the bbox must stay the conservative circle).

Inference/serving only — no VJP (training keeps the autodiff projection +
custom-vjp blend). Opt in via BlendConfig.fused_prep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from gaussianimage_tpu.core.sh import _C0, _C1, _C2, _C3, _C4, num_sh_bases
from gaussianimage_tpu.ops import stream_common as sc
from gaussianimage_tpu.ops.splat_prep import _pack_bin, _run_prep, _row_spec


def _sh_eval(degree: int, vx, vy, vz, coeff, blk):
    """SH at unit view dir (vx, vy, vz) [1, blk] with coefficients
    ``coeff`` [3*K, blk] basis-major — core/sh.py op-for-op."""
    def cf(b):
        return coeff[3 * b:3 * b + 3]  # [3, blk]

    x, y, z = vx, vy, vz
    result = _C0 * cf(0)
    if degree >= 1:
        result = (result - _C1 * y * cf(1) + _C1 * z * cf(2)
                  - _C1 * x * cf(3))
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (result
                  + _C2[0] * xy * cf(4)
                  + _C2[1] * yz * cf(5)
                  + _C2[2] * (2.0 * zz - xx - yy) * cf(6)
                  + _C2[3] * xz * cf(7)
                  + _C2[4] * (xx - yy) * cf(8))
    if degree >= 3:
        result = (result
                  + _C3[0] * y * (3 * xx - yy) * cf(9)
                  + _C3[1] * xy * z * cf(10)
                  + _C3[2] * y * (4 * zz - xx - yy) * cf(11)
                  + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * cf(12)
                  + _C3[4] * x * (4 * zz - xx - yy) * cf(13)
                  + _C3[5] * z * (xx - yy) * cf(14)
                  + _C3[6] * x * (xx - 3 * yy) * cf(15))
    if degree >= 4:
        result = (result
                  + _C4[0] * xy * (xx - yy) * cf(16)
                  + _C4[1] * yz * (3 * xx - yy) * cf(17)
                  + _C4[2] * xy * (7 * zz - 1) * cf(18)
                  + _C4[3] * yz * (7 * zz - 3) * cf(19)
                  + _C4[4] * (zz * (35 * zz - 30) + 3) * cf(20)
                  + _C4[5] * xz * (7 * zz - 3) * cf(21)
                  + _C4[6] * (xx - yy) * (7 * zz - 1) * cf(22)
                  + _C4[7] * xz * (xx - 3 * yy) * cf(23)
                  + _C4[8] * (xx * (xx - 3 * yy)
                              - yy * (3 * xx - yy)) * cf(24))
    return result


def _blend3d_prep_kernel(xyz_ref, scale_ref, quat_ref, opac_ref, coeff_ref,
                         feat_ref, keys_ref, stats_ref, *,
                         N, H, W, tile_px, tiles_x, tiles_y, M, id_bits,
                         q_cut, bound, blk, cam, sh_degree):
    """camera3d.project_gaussians + sh + gs3d activations, scalarized to
    [1, blk] ROW vectors (gaussians on lanes — full 128-lane utilization;
    the XLA pipeline's [N]-vector fusions and a [blk, 1]-column kernel both
    measured ~2-15 us/block from lane padding)."""
    del q_cut, bound  # _run_prep plumbing (sum-path knobs; unused here)
    (rv00, rv01, rv02, rv10, rv11, rv12, rv20, rv21, rv22,
     tv0, tv1, tv2, fx, fy, cx, cy, trx, tr_y, trz, clip_near) = cam
    pid = pl.program_id(0)
    row = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1) + pid * blk)
    valid = row < N

    X = xyz_ref[...].T                                        # [3, blk]
    x3, y3, z3 = X[0:1], X[1:2], X[2:3]

    # quat -> rotation (normalized), camera3d.quat_to_rotmat
    q = quat_ref[...].T                                       # [4, blk]
    qn = jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True))
    q = q / jnp.maximum(qn, 1e-30)  # pad rows are all-zero: avoid 0/0 NaN
    w, qx, qy, qz = q[0:1], q[1:2], q[2:3], q[3:4]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - w * qz)
    r02 = 2 * (qx * qz + w * qy)
    r10 = 2 * (qx * qy + w * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - w * qx)
    r20 = 2 * (qx * qz - w * qy)
    r21 = 2 * (qy * qz + w * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)

    # Sigma3D = (R S)(R S)^T, glob_scale == 1 (gs3d.render call)
    s = jnp.exp(scale_ref[...].T)                             # [3, blk]
    s0, s1, s2 = s[0:1], s[1:2], s[2:3]
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22

    # camera transform + perspective
    t0 = x3 * rv00 + y3 * rv01 + z3 * rv02 + tv0
    t1 = x3 * rv10 + y3 * rv11 + z3 * rv12 + tv1
    t2 = x3 * rv20 + y3 * rv21 + z3 * rv22 + tv2
    tz = jnp.maximum(t2, clip_near)
    in_front = t2 > clip_near
    px = fx * t0 / tz + cx
    py = fy * t1 / tz + cy

    # cov2d = J W Sigma W^T J^T + 0.3 I (EWA low-pass)
    j00 = fx / tz
    j02 = -fx * t0 / (tz * tz)
    j11 = fy / tz
    j12 = -fy * t1 / (tz * tz)
    jw00 = j00 * rv00 + j02 * rv20
    jw01 = j00 * rv01 + j02 * rv21
    jw02 = j00 * rv02 + j02 * rv22
    jw10 = j11 * rv10 + j12 * rv20
    jw11 = j11 * rv11 + j12 * rv21
    jw12 = j11 * rv12 + j12 * rv22
    u0 = c00 * jw00 + c01 * jw01 + c02 * jw02
    u1 = c01 * jw00 + c11 * jw01 + c12 * jw02
    u2 = c02 * jw00 + c12 * jw01 + c22 * jw02
    v0 = c00 * jw10 + c01 * jw11 + c02 * jw12
    v1 = c01 * jw10 + c11 * jw11 + c12 * jw12
    v2 = c02 * jw10 + c12 * jw11 + c22 * jw12
    s11 = jw00 * u0 + jw01 * u1 + jw02 * u2 + 0.3
    s12 = jw10 * u0 + jw11 * u1 + jw12 * u2
    s22 = jw10 * v0 + jw11 * v1 + jw12 * v2 + 0.3

    # conic + 3-sigma radius (covariance.py conic_from_cov2d /
    # radius_from_cov2d, same eps)
    det = s11 * s22 - s12 * s12
    inv_det = 1.0 / jnp.maximum(det, 1e-6)
    ca = s22 * inv_det
    cb = -s12 * inv_det
    cc = s11 * inv_det
    mid = 0.5 * (s11 + s22)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 1e-12)))
    radii = jnp.where(in_front, radii, 0.0)

    # colors: SH at the view direction (gs3d.render, stop-gradient dirs)
    if sh_degree > 0:
        vx = x3 - trx
        vy = y3 - tr_y
        vz = z3 - trz
        vn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        vn = jnp.maximum(vn, 1e-30)
        rgb = _sh_eval(sh_degree, vx / vn, vy / vn, vz / vn,
                       coeff_ref[...].T, blk)
        rgb = jnp.maximum(rgb + 0.5, 0.0)
    else:
        rgb = jax.nn.sigmoid(coeff_ref[...].T[0:3])
    op = jax.nn.sigmoid(opac_ref[...].T)                      # [1, blk]

    _pack_bin(row, valid, px, py, ca, cb, cc, radii, radii, rgb, op,
              feat_ref, keys_ref, stats_ref, tile_px=tile_px,
              tiles_x=tiles_x, tiles_y=tiles_y, M=M, id_bits=id_bits,
              blk=blk)


def fused_blend_supported(N: int, H: int, W: int, cfg) -> bool:
    """Static gate, mirroring splat_prep.fused_decode_supported: the flag,
    the flat-stream layout and the packed-key regime."""
    if not getattr(cfg, "fused_prep", False):
        return False
    _, _, aligned = sc.stream_caps(N, cfg)
    if aligned:
        return False
    tp = cfg.tile_px
    tiles = (-(-W // tp)) * (-(-H // tp))
    id_bits = max(int(N - 1).bit_length(), 1)
    return (tiles + 1) * (1 << id_bits) < 2 ** 31


def fused_prep_blend3d(xyz, scaling_raw, quats, opac_raw, coeffs,
                       viewmat: np.ndarray, fx: float, fy: float,
                       cx: float, cy: float, translation: np.ndarray,
                       sh_degree: int, H: int, W: int, cfg, m_span: int,
                       clip_near: float = 0.01):
    """3DGS blend prep front. All row inputs must already be in DEPTH order
    (cheap [N, k] row gathers at the call site); coeffs [N, 3*K]
    basis-major. Returns (feat [N+1, 16], keys, trunc, n_total)."""
    vm = np.asarray(viewmat, np.float32)
    tr = np.asarray(translation, np.float32).reshape(-1)
    cam = tuple(float(v) for v in (
        vm[0, 0], vm[0, 1], vm[0, 2], vm[1, 0], vm[1, 1], vm[1, 2],
        vm[2, 0], vm[2, 1], vm[2, 2], vm[0, 3], vm[1, 3], vm[2, 3],
        fx, fy, cx, cy, tr[0], tr[1], tr[2], clip_near))
    K = num_sh_bases(sh_degree) if sh_degree > 0 else 1
    kern = functools.partial(_blend3d_prep_kernel, cam=cam,
                             sh_degree=sh_degree)
    return _run_prep(
        kern,
        (xyz.astype(jnp.float32), scaling_raw.astype(jnp.float32),
         quats.astype(jnp.float32), opac_raw.reshape(-1, 1).astype(
             jnp.float32), coeffs.astype(jnp.float32)),
        [_row_spec(3), _row_spec(3), _row_spec(4), _row_spec(1),
         _row_spec(3 * K)],
        xyz.shape[0], H, W, cfg, m_span, np.zeros(3, np.float32),
        blk_cap=512)  # ~60 live [blk, 128]-padded temporaries: 1024 rows
    #   overflow the ~26 MB scoped-VMEM stack (measured 28.4M on v5e)
