"""On-TPU A/B + numerical check for the fused splat-prep kernel.

Measures single-frame render and decode wall time (rolled-scan bursts,
sync-dispatch mode per CLAUDE.md) with RasterizeConfig.fused_prep off/on,
and checks the fused images against the generic path ON HARDWARE (compile
can differ from interpret — CLAUDE.md kernel convention).

Run: python scripts/ab_fused_prep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# AB_BURST / AB_CHUNKS env knobs: defaults are the real-TPU probe; a CPU
# interpret-mode smoke run (AB_BURST=2 AB_CHUNKS=1 AB_CHUNK_ITERS=10) checks
# the script end-to-end without hardware.
BURST = int(os.environ.get("AB_BURST", "100"))
CHUNKS = int(os.environ.get("AB_CHUNKS", "4"))
CHUNK_ITERS = int(os.environ.get("AB_CHUNK_ITERS", "500"))


def main():
    from gaussianimage_tpu.datasets import load_single
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig

    H, W, N = 512, 768, 10000
    gt = jnp.asarray(load_single("photos", "", "china"))
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    model_f = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                         raster=RasterizeConfig(fused_prep=True))
    state = model.init_state(jax.random.PRNGKey(1), gt_image=gt)
    chunk = jax.jit(
        lambda st, g, s: model.train_chunk(st, g, None, s, CHUNK_ITERS),
        donate_argnums=(0,))
    for i in range(CHUNKS):
        state, _ = chunk(state, gt, jnp.asarray(i * CHUNK_ITERS + 1))
    jax.block_until_ready(state.params)

    # QAT state from the committed two-stage artifact (same as bench.py)
    from pathlib import Path
    from gaussianimage_tpu.utils.checkpoint import (load_checkpoint,
                                                    merge_matching)
    qmodel = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                        quantize=True)
    qmodel_f = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                          quantize=True,
                          raster=RasterizeConfig(fused_prep=True))
    qstate = qmodel.init_state(jax.random.PRNGKey(2))
    ckpt = load_checkpoint(Path(
        "results_quant/photos/GaussianImage_Cholesky_50000_10000/china/"
        "gaussian_model.best.npz"))
    qparams = merge_matching(qstate.params, ckpt["params"])
    extra = dict(qstate.extra)
    extra["vq"] = extra["vq"]._replace(**{
        k.split("/", 1)[1]: jnp.asarray(v)
        for k, v in ckpt["extra"].items() if k.startswith("vq/")})
    qstate = qstate._replace(params=qparams, extra=extra)
    enc = jax.device_put(qmodel.compress_wo_ec(qstate.params, qstate.extra))

    def render_burst(render_one):
        def burst(p):
            def body(acc, i):
                q = dict(p)
                q["_xyz"] = q["_xyz"] + 1e-30 * i.astype(jnp.float32)
                return acc + render_one(q)[0, 0, 0, 0], None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(1, BURST + 1, dtype=jnp.int32))[0]
        return jax.jit(burst)

    def decode_burst(m):
        def burst(p, x, e):
            def body(acc, i):
                q = dict(p)
                q["cholesky_quant_scale"] = (
                    q["cholesky_quant_scale"]
                    + 1e-30 * i.astype(jnp.float32))
                img = m.decompress_wo_ec(q, x, e)["render"]
                return acc + img[0, 0, 0, 0], None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(1, BURST + 1, dtype=jnp.int32))[0]
        return jax.jit(burst)

    probes = {
        "render_base": (render_burst(lambda p: model.render(p)["render"]),
                        (state.params,)),
        "render_fused": (render_burst(model_f.render_fast), (state.params,)),
        "decode_base": (decode_burst(qmodel), (qstate.params, qstate.extra,
                                               enc)),
        "decode_fused": (decode_burst(qmodel_f), (qstate.params,
                                                  qstate.extra, enc)),
    }

    # numerical check ON TPU before any timing
    img_a = jax.jit(lambda p: model.render(p)["render"])(state.params)
    img_b = jax.jit(model_f.render_fast)(state.params)
    dec_a = jax.jit(lambda p, x, e: qmodel.decompress_wo_ec(p, x, e)[
        "render"])(qstate.params, qstate.extra, enc)
    dec_b = jax.jit(lambda p, x, e: qmodel_f.decompress_wo_ec(p, x, e)[
        "render"])(qstate.params, qstate.extra, enc)
    for k, (fn, args) in probes.items():
        jax.block_until_ready(fn(*args))  # compile before poisoning

    render_err = float(jnp.abs(img_a - img_b).max())
    decode_err = float(jnp.abs(dec_a - dec_b).max())  # first readback

    out = {"render_max_err": render_err, "decode_max_err": decode_err}
    for k, (fn, args) in probes.items():
        t0 = time.time()
        for _ in range(3):
            r = fn(*args)
        jax.block_until_ready(r)
        ms = (time.time() - t0) / 3 / BURST * 1e3
        out[k + "_ms"] = round(ms, 4)
        out[k + "_fps"] = round(1e3 / ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
