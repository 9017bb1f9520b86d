"""Sharded-fit scaling probe (SURVEY.md §2.3 north star: pixels/s scaling
across mesh sizes).

Runs the full sharded train step (data x gauss x tile axes, psum-combined
renders and gradients) at increasing device counts and reports pixels/s and
parallel efficiency. On this machine it runs on the 8-virtual-device CPU
mesh (functional validation + relative scaling of the XLA SPMD program); on
a real multi-chip TPU slice the same code measures hardware scaling.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m gaussianimage_tpu.parallel.scaling_bench
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(n_steps: int = 20, H: int = 64, W: int = 96, N: int = 512):
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.parallel import (
        init_sharded_fit, make_mesh, make_sharded_train_step, mesh_axes_for)
    from gaussianimage_tpu.utils.image_io import synthetic_image

    n_dev_total = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= n_dev_total]
    results = []
    for nd in sizes:
        axes = mesh_axes_for(nd)
        mesh = make_mesh(axes)
        raster = RasterizeConfig(tile_px=16)
        model = make_model("GaussianImage_Cholesky", num_points=N,
                           H=H * axes["tile"], W=W, raster=raster,
                           block_h=16, block_w=16)
        D = axes["data"]
        images = np.concatenate(
            [synthetic_image(H * axes["tile"], W, seed=i) for i in range(D)],
            axis=0)
        params, opt_state, gt = init_sharded_fit(model, mesh, images)
        step = make_sharded_train_step(model, mesh, n_steps=n_steps)(
            params, opt_state, gt)
        step_fn = step if callable(step) else None
        if step_fn is None:
            # make_sharded_train_step returns a builder in some versions
            step_fn = make_sharded_train_step(model, mesh, n_steps=n_steps)
        out = step_fn(params, opt_state, gt, jnp.asarray(1)) \
            if callable(step_fn) else None
        jax.block_until_ready(out[0])
        t0 = time.time()
        out = step_fn(out[0], out[1], gt, jnp.asarray(n_steps + 1))
        _ = np.asarray(out[2])  # force completion
        dt = time.time() - t0
        px_per_s = D * (H * axes["tile"]) * W * n_steps / dt
        results.append({"devices": nd, "mesh": axes,
                        "pixels_per_s": round(px_per_s, 1)})
    base = results[0]["pixels_per_s"]
    for r in results:
        r["efficiency"] = round(r["pixels_per_s"] / (base * r["devices"]), 3)
    print(json.dumps({"backend": jax.default_backend(),
                      "scaling": results}))
    return results


if __name__ == "__main__":
    run()
