"""Sharded-fit scaling probe (SURVEY.md §2.3 north star: pixels/s scaling
across mesh sizes).

Two measurements, both running the full sharded train step (psum-combined
renders and gradients):

- **strong**: ONE fixed image / point count; devices split the work over the
  (gauss, tile) axes. Efficiency = pixels/s / (single-device pixels/s * n).
- **weak_data**: n independent images over the ``data`` axis (the dataset-
  sweep configuration). Total pixels/s should scale ~linearly; efficiency is
  against the same single-device baseline.

On this machine it runs on the 8-virtual-device CPU mesh (functional
validation + relative scaling of the XLA SPMD program); on a real multi-chip
TPU slice the same code measures hardware scaling.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m gaussianimage_tpu.parallel.scaling_bench
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _axes_compute(nd: int):
    """Split nd devices over (gauss, tile) only — strong scaling."""
    tile = 1
    gauss = nd
    if nd % 2 == 0:
        tile, gauss = 2, nd // 2
    return {"data": 1, "gauss": gauss, "tile": tile}


def comm_accounting(H: int, W: int, num_points: int, param_cols: int,
                    axes: dict, shard_opt: bool = False) -> dict:
    """Analytic per-step collective volume (bytes) for the sharded train
    step — what actually rides the ICI links each iteration.

    - ``gauss`` axis (size g>1): ONE image psum per render; each shard
      contributes its [H/t, W, 3] f32 partial. Ring all-reduce wire cost =
      2(g-1)/g x logical bytes.
    - ``tile`` axis (size t>1): ONE gradient combine per backward over the
      local parameter leaves ([N/g, cols] f32). Replicated-opt all-reduce
      = 2(t-1)/t x B; shard_opt = reduce_scatter (t-1)/t x B + params
      all_gather (t-1)/t x B (same wire bytes, t-fold less optimizer math
      and moment memory).
    """
    g, t = axes.get("gauss", 1), axes.get("tile", 1)
    out = {}
    h_loc = H // max(t, 1)
    img_bytes = h_loc * W * 3 * 4
    out["gauss_psum_logical_bytes"] = img_bytes if g > 1 else 0
    out["gauss_psum_wire_bytes"] = (
        int(2 * (g - 1) / g * img_bytes) if g > 1 else 0)
    grad_bytes = (num_points // max(g, 1)) * param_cols * 4
    out["tile_grad_logical_bytes"] = grad_bytes if t > 1 else 0
    if t > 1:
        if shard_opt:
            wire = int((t - 1) / t * grad_bytes) * 2  # scatter + gather
        else:
            wire = int(2 * (t - 1) / t * grad_bytes)
    else:
        wire = 0
    out["tile_grad_wire_bytes"] = wire
    out["total_wire_bytes_per_step"] = (
        out["gauss_psum_wire_bytes"] + out["tile_grad_wire_bytes"])
    return out


# --- v5p projection -------------------------------------------------------
# The one scaling calculation this single-chip environment CAN do honestly:
# convert the analytic per-step wire bytes into a predicted efficiency on a
# real v5p slice, against the MEASURED single-chip step time.
#
# Hardware model (scaling-book numbers for TPU v5p):
#   - ICI one-way bandwidth per link  W_one = 9e10 B/s; each torus axis has
#     2 links (both ring directions), so per-chip egress bandwidth along the
#     axis a collective rides is W_bidi = 1.8e11 B/s.
#   - comm_accounting()'s wire_bytes are per-chip EGRESS bytes for the
#     bidirectional-ring collective (they already carry the 2(n-1)/n /
#     (n-1)/n factors), so  t_comm = wire_bytes / W_bidi.
#   - gauss-axis psum and tile-axis grad combine ride DIFFERENT mesh axes
#     (different torus dimensions) and serialize with compute in the
#     no-overlap bound; in the overlap bound the grad combine hides behind
#     the backward pass (it is per-parameter, available as soon as each
#     grad leaf is produced) and only the render psum stays on the critical
#     path.
#
# Compute model: measured single-chip step time T1 at FLAGSHIP scale
# (768x512, 10k gaussians — BENCH fit_iters_per_s), perfectly divided by
# the compute-axis product (the kernel is embarrassingly tile/gauss
# parallel; per-shard imbalance is ignored, making this an UPPER bound on
# compute speedup and the comm term the modeled loss).
V5P_ICI_BIDI_BYTES_PER_S = 1.8e11
FLAGSHIP = {"H": 512, "W": 768, "N": 10000, "param_cols": 8,
            # BENCH_r05 fit_iters_per_s = 658.5 on the real v5e chip
            "t1_step_s": 1.0 / 658.5}


def v5p_projection(axes: dict, shard_opt: bool = False,
                   flagship: dict = FLAGSHIP) -> dict:
    """Predicted strong-scaling efficiency on a v5p slice for this mesh at
    flagship scale: eff = T1/n / t_step_predicted."""
    n = int(np.prod([v for v in axes.values()]))
    comm = comm_accounting(flagship["H"], flagship["W"], flagship["N"],
                           flagship["param_cols"], axes, shard_opt)
    t_compute = flagship["t1_step_s"] / n
    t_render_psum = comm["gauss_psum_wire_bytes"] / V5P_ICI_BIDI_BYTES_PER_S
    t_grad = comm["tile_grad_wire_bytes"] / V5P_ICI_BIDI_BYTES_PER_S
    t_no_overlap = t_compute + t_render_psum + t_grad
    # overlap bound: grad combine hidden behind backward compute
    t_overlap = max(t_compute, t_grad) + t_render_psum
    return {
        "flagship_wire_bytes_per_step": comm["total_wire_bytes_per_step"],
        "t_compute_us": round(t_compute * 1e6, 2),
        "t_comm_us": round((t_render_psum + t_grad) * 1e6, 2),
        "efficiency_no_overlap": round(
            (flagship["t1_step_s"] / n) / t_no_overlap, 3),
        "efficiency_grad_overlap": round(
            (flagship["t1_step_s"] / n) / t_overlap, 3),
    }


def _time_steps(step, params, opt_state, gt, n_steps, reps=3):
    out = step(params, opt_state, gt, jnp.asarray(1))
    jax.block_until_ready(out[0])  # warmup + compile
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        out = step(out[0], out[1], gt, jnp.asarray(r * n_steps + 1))
        _ = np.asarray(out[2])  # force completion
        best = min(best, time.time() - t0)
    return best


def run(n_steps: int = 20, H: int = 256, W: int = 256, N: int = 4096):
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.parallel import (
        init_sharded_fit, make_mesh, make_sharded_train_step)
    from gaussianimage_tpu.utils.image_io import synthetic_image

    n_dev_total = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev_total]
    raster = RasterizeConfig(tile_px=16)

    # per-gaussian trainable columns (xyz 2 + cholesky 3 + color 3)
    PARAM_COLS = 8

    def build_and_time(axes, D, shard_opt=False):
        mesh = make_mesh(dict(axes))
        model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                           raster=raster, block_h=16, block_w=16)
        images = np.concatenate(
            [synthetic_image(H, W, seed=i) for i in range(D)], axis=0)
        params, opt_state, gt = init_sharded_fit(model, mesh, images,
                                                 shard_opt=shard_opt)
        step = make_sharded_train_step(model, mesh, n_steps=n_steps,
                                       shard_opt=shard_opt)(
            params, opt_state, gt)
        dt = _time_steps(step, params, opt_state, gt, n_steps)
        return D * H * W * n_steps / dt

    def row(axes, px, shard_opt=False):
        nd = int(np.prod(list(axes.values())))
        return {"devices": nd, "mesh": dict(axes),
                "pixels_per_s": round(px, 1),
                "comm_per_step": comm_accounting(
                    H, W, N, PARAM_COLS, axes, shard_opt),
                "predicted_v5p_efficiency": v5p_projection(axes, shard_opt)}

    strong, strong_tile, weak = [], [], []
    for nd in sizes:
        axes = _axes_compute(nd)
        strong.append(row(axes, build_and_time(axes, 1)))
    for nd in sizes:
        # tile-only strong scaling: gauss=1 meshes run the fused
        # render+L2 Pallas kernel per row-slice (parallel/fit.py), both
        # with replicated and with tile-sharded (ZeRO-1) optimizer state
        if H // (nd * 16) < 1 or (H // nd) % 16:
            continue
        axes = {"data": 1, "gauss": 1, "tile": nd}
        r = row(axes, build_and_time(axes, 1))
        r_so = row(axes, build_and_time(axes, 1, shard_opt=True),
                   shard_opt=True)
        r["pixels_per_s_shard_opt"] = r_so["pixels_per_s"]
        r["comm_per_step_shard_opt"] = r_so["comm_per_step"]
        strong_tile.append(r)
    for nd in sizes:
        axes = {"data": nd, "gauss": 1, "tile": 1}
        weak.append(row(axes, build_and_time(axes, nd)))
    base = strong[0]["pixels_per_s"]
    for rows in (strong, strong_tile, weak):
        for r in rows:
            r["efficiency"] = round(
                r["pixels_per_s"] / (base * r["devices"]), 3)
    result = {"backend": jax.default_backend(),
              "devices_total": n_dev_total,
              "problem": {"H": H, "W": W, "num_points": N,
                          "steps_timed": n_steps},
              "strong": strong, "strong_tile_fused": strong_tile,
              "weak_data": weak}
    # attach the HLO-level reconciliation of comm_accounting against the
    # collectives XLA actually emits (scripts/validate_collectives.py) —
    # the measured-vs-predicted evidence the analytic v5p projection rests
    # on (ICI bandwidth itself is unmeasurable on this 1-chip slice).
    try:
        with open("results/collectives_check.json") as fh:
            chk = json.load(fh)
        result["collectives_hlo_check"] = {
            "ok": chk["ok"], "failures": chk["failures"],
            "detail": "results/collectives_check.json"}
    except OSError:
        pass
    if jax.default_backend() == "cpu":
        result["note"] = (
            "virtual CPU devices share one host thread pool: the 1-device "
            "baseline already uses every core via XLA intra-op threading, so "
            "these efficiencies are a LOWER BOUND that mainly validates the "
            "SPMD program; the >=80% pixels/s target is a real-TPU-slice "
            "measurement this single-chip environment cannot produce")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    import os
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # this machine's sitecustomize REPLACES XLA_FLAGS at interpreter
        # startup; re-append the virtual-device flag before backend init
        # (same dance as tests/conftest.py)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ.setdefault("GITPU_PALLAS_INTERPRET", "1")
        jax.config.update("jax_platforms", "cpu")
    res = run()
    with open(os.environ.get("SCALING_OUT", "SCALING_r04.json"), "w") as fh:
        json.dump(res, fh, indent=1)
