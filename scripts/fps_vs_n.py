"""FPS-vs-N evidence (VERDICT r4 #6): render + decode throughput at the
reference's Kodak sweep points (10k/20k/40k/70k gaussians — reference
scripts/3d_gs/kodak.sh:11-16; claim "render speed regardless of parameter
size", reference README.md:38).

Each N gets a short fit (2k iters) so tile occupancy is realistic, then the
same scan-burst probes bench.py uses (readback-poisoned sync dispatch,
BURST frames per dispatch). 70k crosses the flat-stream limit (65,536
instances, ops/rasterize_sum.py RasterizeConfig.flat_stream_limit) onto the
BK-aligned block layout — the expected cliff is measured, not hidden.

Writes results/fps_vs_n.json and prints one JSON line per N.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BURST = 100
CALLS = 3


def time_calls(fn, *args, calls=CALLS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / calls


def make_burst(render_fn, perturb_key, n=BURST):
    def burst(p):
        def body(acc, i):
            q = dict(p)
            q[perturb_key] = q[perturb_key] + 1e-30 * i.astype(jnp.float32)
            img = render_fn(q)
            return acc + img[0, 0, 0, 0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(1, n + 1, dtype=jnp.int32))
        return acc

    return jax.jit(burst)


def main():
    from gaussianimage_tpu.datasets import load_single
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.utils.image_io import synthetic_image

    H, W = 512, 768
    try:
        gt = jnp.asarray(load_single("photos", "", "china"))
    except Exception:
        gt = jnp.asarray(synthetic_image(H, W, seed=0))

    rows = []
    poisoned = False
    for N in (10000, 20000, 40000, 70000):
        fused = RasterizeConfig(fused_prep=True)
        serving = RasterizeConfig.serving(N)
        model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
        model_f = make_model("GaussianImage_Cholesky", num_points=N, H=H,
                             W=W, raster=fused)
        model_s = make_model("GaussianImage_Cholesky", num_points=N, H=H,
                             W=W, raster=serving)
        state = model.init_state(jax.random.PRNGKey(1))
        chunk = jax.jit(
            lambda st, g, s, m=model: m.train_chunk(st, g, None, s, 500),
            donate_argnums=(0,))
        for i in range(4):
            state, _ = chunk(state, gt, jnp.asarray(i * 500 + 1))
        jax.block_until_ready(state.params)

        burst = make_burst(lambda q, m=model: m.render(q)["render"], "_xyz")
        burst_f = make_burst(model_f.render_fast, "_xyz")
        burst_s = make_burst(model_s.render_fast, "_xyz")
        nd_s = jax.jit(
            lambda p, m=model_s: m.render(p)["raster_aux"]["n_dropped"])

        # decode: mini-QAT of the fitted scene (same fallback bench.py uses)
        qmodel = make_model("GaussianImage_Cholesky", num_points=N, H=H,
                            W=W, quantize=True)
        qmodel_f = make_model("GaussianImage_Cholesky", num_points=N, H=H,
                              W=W, quantize=True, raster=fused)
        qstate = qmodel.init_state(jax.random.PRNGKey(2))
        qparams = dict(qstate.params)
        for k, v in state.params.items():
            # COPY: qchunk donates its whole input pytree; aliasing the fit
            # params here would delete the buffers the render bursts below
            # still read (r05 queue crash: "Array has been deleted")
            qparams[k] = jnp.copy(v)
        qstate = qstate._replace(params=qparams)
        qstate = qmodel.init_quantizer_data(qstate)
        qchunk = jax.jit(
            lambda st, g, s: qmodel.train_chunk(st, g, None, s, 200),
            donate_argnums=(0,))
        qstate, _ = qchunk(qstate, gt, jnp.asarray(1))
        enc = jax.device_put(qmodel.compress_wo_ec(qstate.params,
                                                   qstate.extra))

        def dburst_of(m):
            def burst_fn(bundle):
                p0, qe0, enc0 = bundle

                def body(acc, i):
                    p = dict(p0)
                    p["cholesky_quant_scale"] = (
                        p["cholesky_quant_scale"]
                        + 1e-30 * i.astype(jnp.float32))
                    img = m.decompress_wo_ec(p, qe0, enc0)["render"]
                    return acc + img[0, 0, 0, 0], None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(1, BURST + 1, dtype=jnp.int32))
                return acc

            return jax.jit(burst_fn)

        qmodel_s = make_model("GaussianImage_Cholesky", num_points=N, H=H,
                              W=W, quantize=True,
                              raster=RasterizeConfig.serving(N))
        dburst = dburst_of(qmodel_f)
        dburst_s = dburst_of(qmodel_s)
        bundle = (qstate.params, qstate.extra, enc)
        outs = (burst(state.params), burst_f(state.params),
                burst_s(state.params), dburst(bundle), dburst_s(bundle))
        nd = nd_s(state.params)
        jax.block_until_ready(outs)
        if not poisoned:
            _ = np.asarray(outs[0])  # sync-dispatch fence, once
            poisoned = True
        n_dropped_serving = int(np.asarray(nd))

        fps_r = max(1.0 / (time_calls(burst, state.params) / BURST)
                    for _ in range(3))
        fps_rf = max(1.0 / (time_calls(burst_f, state.params) / BURST)
                     for _ in range(3))
        fps_rs = max(1.0 / (time_calls(burst_s, state.params) / BURST)
                     for _ in range(3))
        fps_d = max(1.0 / (time_calls(dburst, bundle) / BURST)
                    for _ in range(3))
        fps_ds = max(1.0 / (time_calls(dburst_s, bundle) / BURST)
                     for _ in range(3))
        from gaussianimage_tpu.ops.stream_common import stream_caps
        _, _, aligned = stream_caps(N, model.cfg.raster)
        _, _, aligned_s = stream_caps(N, model_s.cfg.raster)
        row = {"N": N,
               "render_fps": round(fps_r, 1),
               "render_fps_fused": round(fps_rf, 1),
               "render_fps_serving": round(fps_rs, 1),
               "decode_fps_fused": round(fps_d, 1),
               "decode_fps_serving": round(fps_ds, 1),
               "stream_layout": "aligned" if aligned else "flat",
               "stream_layout_serving": "aligned" if aligned_s else "flat",
               "n_dropped_serving": n_dropped_serving}
        print(json.dumps(row), flush=True)
        rows.append(row)

    out = {"scene": "china_768x512 (2k-iter fit per N)",
           "burst": BURST, "backend": jax.default_backend(), "rows": rows}
    with open("results/fps_vs_n.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
