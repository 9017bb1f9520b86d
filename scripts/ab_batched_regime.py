"""A/B: batched (vertically-stacked) decode vs single-frame scan decode,
across frame sizes (VERDICT r4 #4: batched decode anti-amortizes at the
flagship 768x512 — find the regime where one stacked pass actually wins,
or conclude it has none).

Hypothesis: batching amortizes FIXED per-frame costs (op launches ~3 us
each, small-grid kernel underutilization). At flagship size those are <15%
of the frame, and the stacked pass pays superlinear glue (bigger sort,
bigger window-bounds compare-reduce) — it loses. At SMALL frames (e.g.
128x128, where a frame is 16 tiles and ~25 XLA ops of ~3 us launch floor
rival the kernel time) the fixed costs dominate and stacking should win.

Both sides use the fused splat-prep front and identical scan-burst timing
(sync dispatch, poisoned once). Writes results/ab/batched_regime.json.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

CALLS = 3


def time_calls(fn, *args, calls=CALLS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / calls


def setup(H, W, N, steps=400):
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.utils.image_io import synthetic_image

    fused = RasterizeConfig(fused_prep=True)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    state = model.init_state(jax.random.PRNGKey(1))
    chunk = jax.jit(lambda st, g, s: model.train_chunk(st, g, None, s,
                                                       steps),
                    donate_argnums=(0,))
    state, _ = chunk(state, gt, jnp.asarray(1))

    qmodel_f = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                          quantize=True, raster=fused)
    qstate = qmodel_f.init_state(jax.random.PRNGKey(2))
    qp = dict(qstate.params)
    for k, v in state.params.items():
        qp[k] = v
    qstate = qstate._replace(params=qp)
    qstate = qmodel_f.init_quantizer_data(qstate)
    qchunk = jax.jit(lambda st, g, s: qmodel_f.train_chunk(st, g, None, s,
                                                           100),
                     donate_argnums=(0,))
    qstate, _ = qchunk(qstate, gt, jnp.asarray(1))
    enc = jax.device_put(qmodel_f.compress_wo_ec(qstate.params,
                                                 qstate.extra))
    return qmodel_f, qstate, enc


def probe_pair(H, W, N, B, burst):
    from gaussianimage_tpu.batched import decompress_wo_ec_batch

    qmodel_f, qstate, enc = setup(H, W, N)
    qe = qstate.extra

    def single_burst(bundle):
        p0, qe0, enc0 = bundle

        def body(acc, i):
            p = dict(p0)
            p["cholesky_quant_scale"] = (p["cholesky_quant_scale"]
                                         + 1e-30 * i.astype(jnp.float32))
            img = qmodel_f.decompress_wo_ec(p, qe0, enc0)["render"]
            return acc + img[0, 0, 0, 0], None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(1, burst + 1, dtype=jnp.int32))
        return acc

    def stackb(x):
        return jnp.broadcast_to(x, (B,) + x.shape)

    eps = np.arange(1, B + 1, dtype=np.float32) * 1e-30
    pb = {k: stackb(v) for k, v in qstate.params.items()}
    pb["cholesky_quant_scale"] = pb["cholesky_quant_scale"] + eps[:, None]
    qe_b = jax.tree.map(stackb, qe)
    enc_b = {k: stackb(jnp.asarray(v)) for k, v in enc.items()}
    nscan = -(-burst // B)

    def batched_burst(p_, x_, e_):
        def body(acc, i):
            p = dict(p_)
            p["cholesky_quant_scale"] = (p["cholesky_quant_scale"]
                                         + 1e-30 * i.astype(jnp.float32))
            img = decompress_wo_ec_batch(qmodel_f, p, x_, e_)["render"]
            return acc + img[:, 0, 0, 0].sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(1, nscan + 1, dtype=jnp.int32))
        return acc

    sfn = jax.jit(single_burst)
    bfn = jax.jit(batched_burst)
    outs = (sfn((qstate.params, qe, enc)), bfn(pb, qe_b, enc_b))
    jax.block_until_ready(outs)
    global _POISONED
    if not _POISONED:
        _ = np.asarray(outs[0])
        _POISONED = True
    t_single = min(time_calls(sfn, (qstate.params, qe, enc))
                   for _ in range(3)) / burst
    t_batch = min(time_calls(bfn, pb, qe_b, enc_b)
                  for _ in range(3)) / (B * nscan)
    return {"H": H, "W": W, "N": N, "B": B, "burst": burst,
            "single_fps": round(1.0 / t_single, 1),
            "batched_fps": round(1.0 / t_batch, 1),
            "batched_speedup": round(t_single / t_batch, 3)}


_POISONED = False


def main():
    rows = []
    for (H, W, N, B) in ((128, 128, 1000, 16), (256, 256, 3000, 8),
                         (512, 768, 10000, 6)):
        row = probe_pair(H, W, N, B, burst=96)
        print(json.dumps(row), flush=True)
        rows.append(row)
    out = {"backend": jax.default_backend(), "rows": rows}
    with open("results/ab/batched_regime.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
