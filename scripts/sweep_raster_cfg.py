"""On-TPU sweep of the sum-rasterizer execution knobs (block_inst BK,
tiles_per_step TB) on the fused inference render at flagship scale.

The math is knob-invariant (same image); this times the rolled 100-frame
burst per config to pick the serving default. Run: python
scripts/sweep_raster_cfg.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BURST = int(os.environ.get("SWEEP_BURST", "100"))


def main():
    from gaussianimage_tpu.datasets import load_single
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig

    H, W, N = 512, 768, 10000
    gt = jnp.asarray(load_single("photos", "", "china"))
    base = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    state = base.init_state(jax.random.PRNGKey(1), gt_image=gt)
    chunk = jax.jit(lambda st, g, s: base.train_chunk(st, g, None, s, 500),
                    donate_argnums=(0,))
    for i in range(4):
        state, _ = chunk(state, gt, jnp.asarray(i * 500 + 1))
    jax.block_until_ready(state.params)

    def burst_for(cfg):
        m = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       raster=cfg)

        def burst(p):
            def body(acc, i):
                q = dict(p)
                q["_xyz"] = q["_xyz"] + 1e-30 * i.astype(jnp.float32)
                return acc + m.render_fast(q)[0, 0, 0, 0], None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(1, BURST + 1, dtype=jnp.int32))[0]

        return jax.jit(burst)

    grid = [(bk, tb) for bk in (32, 64, 128) for tb in (4, 8, 16)]
    fns = {}
    for bk, tb in grid:
        cfg = RasterizeConfig(fused_prep=True, block_inst=bk,
                              tiles_per_step=tb)
        fns[(bk, tb)] = burst_for(cfg)
    ref_img = None
    for k, fn in fns.items():
        jax.block_until_ready(fn(state.params))  # compile before poisoning
    _ = np.asarray(jnp.zeros(()))  # poison into sync mode

    out = {}
    for (bk, tb), fn in fns.items():
        t0 = time.time()
        for _ in range(3):
            r = fn(state.params)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / 3 / BURST * 1e3
        out[f"bk{bk}_tb{tb}"] = {"ms_per_frame": round(ms, 4),
                                 "fps": round(1e3 / ms, 1)}
        print(f"bk={bk} tb={tb}: {ms*1e3:.1f} us/frame "
              f"({1e3/ms:.0f} FPS)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
