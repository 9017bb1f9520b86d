"""Reconcile the v5p scaling model's wire-byte accounting against the
collectives XLA ACTUALLY emits (VERDICT r4 #10).

What this single-chip environment can and cannot measure:

- CANNOT: ICI link bandwidth. The axon slice is v5e:1x1x1 — there is no
  ICI partner, and a psum over a 1-device mesh axis compiles to a no-op
  (XLA removes the collective), so no "loopback" measurement exists. The
  V5P_ICI_BIDI_BYTES_PER_S constant remains a scaling-book hardware number.
- CAN: validate that comm_accounting()'s per-step LOGICAL collective bytes
  match the compiled SPMD program. We jit the real sharded train step
  (n_steps=1) on an 8-virtual-device CPU mesh, walk the optimized HLO for
  all-reduce / reduce-scatter / all-gather ops, sum their operand bytes,
  and compare against comm_accounting's logical bytes for the same mesh.
  The ring wire factors (2(n-1)/n etc.) sit BELOW HLO — they are how the
  hardware executes an all-reduce — so the reconciliation target is the
  logical byte volume and the collective op inventory.

Writes results/collectives_check.json; exits nonzero on mismatch >2%.
"""

import json
import os
import re
import sys

sys.path.insert(0, ".")

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("GITPU_PALLAS_INTERPRET", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

# one HLO op: all-reduce.N = (shapes...) all-reduce(...), or start/done pairs
_COLL_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*(\([^)]*\)|\S+)\s+"
    r"(all-reduce|reduce-scatter|all-gather)(?:-start)?\(", re.M)
_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|f64|s64|u64)"
                       r"\[([\d,]*)\]")


def _shape_bytes(shapes_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes per collective kind from optimized HLO text.
    For all-reduce the output bytes == logical reduced bytes; for
    all-gather the output is the gathered (full) array; for reduce-scatter
    the output is the scattered shard (full bytes = out * n_shards, but the
    LOGICAL tensor is the full array — report raw op output bytes and let
    the caller interpret)."""
    out = {"all-reduce": 0, "reduce-scatter": 0, "all-gather": 0,
           "ops": []}
    for m in _COLL_RE.finditer(hlo_text):
        shapes, kind = m.group(1), m.group(2)
        b = _shape_bytes(shapes)
        out[kind] += b
        out["ops"].append({"kind": kind, "bytes": b,
                           "shape": shapes[:120]})
    return out


def main():
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.parallel import (init_sharded_fit, make_mesh,
                                            make_sharded_train_step)
    from gaussianimage_tpu.parallel.scaling_bench import comm_accounting
    from gaussianimage_tpu.utils.image_io import synthetic_image

    # flagship geometry, 8 devices, the default compute mesh (gauss=4,tile=2)
    H, W, N = 512, 768, 10000
    PARAM_COLS = 8
    results = {}
    failures = []
    for axes, shard_opt in (
            ({"data": 1, "gauss": 4, "tile": 2}, False),
            ({"data": 1, "gauss": 1, "tile": 8}, False),
            ({"data": 1, "gauss": 1, "tile": 8}, True)):
        mesh = make_mesh(dict(axes))
        model = make_model("GaussianImage_Cholesky", num_points=N, H=H,
                           W=W, raster=RasterizeConfig())
        images = synthetic_image(H, W, seed=0)
        params, opt_state, gt = init_sharded_fit(model, mesh, images,
                                                 shard_opt=shard_opt)
        step = make_sharded_train_step(model, mesh, n_steps=1,
                                       shard_opt=shard_opt)(
            params, opt_state, gt)
        lowered = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                          else step).lower(params, opt_state, gt,
                                           jnp.asarray(1))
        hlo = lowered.compile().as_text()
        got = collective_bytes(hlo)
        pred = comm_accounting(H, W, N, PARAM_COLS, axes, shard_opt)

        # predicted logical bytes -> expected HLO op output bytes
        g, t = axes["gauss"], axes["tile"]
        expect = {}
        expect["all-reduce"] = (pred["gauss_psum_logical_bytes"]
                                + (0 if shard_opt
                                   else pred["tile_grad_logical_bytes"]))
        # loss/psnr/n_dropped scalar psums ride along (12 B each, noise)
        if shard_opt:
            # reduce-scatter op output = grad_bytes / t per leaf
            expect["reduce-scatter"] = pred["tile_grad_logical_bytes"] // t
            expect["all-gather"] = pred["tile_grad_logical_bytes"]
        key = f"gauss{g}_tile{t}" + ("_zero1" if shard_opt else "")
        row = {"mesh": axes, "shard_opt": shard_opt,
               "predicted_logical": pred,
               "expected_hlo_bytes": expect,
               "measured_hlo_bytes": {k: got[k] for k in
                                      ("all-reduce", "reduce-scatter",
                                       "all-gather")},
               "collective_ops": got["ops"]}
        for kind, exp in expect.items():
            meas = got[kind]
            tol = max(0.02 * exp, 256)  # scalar metric psums are noise
            if abs(meas - exp) > tol:
                failures.append(
                    f"{key}: {kind} expected ~{exp} B, HLO has {meas} B")
        results[key] = row

    out = {"ok": not failures, "failures": failures, "meshes": results}
    with open("results/collectives_check.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": out["ok"], "failures": failures}, indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
