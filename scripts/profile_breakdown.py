"""Device-op breakdown of the render / decode / train / blend bursts.

Runs each burst under jax.profiler.trace on the real TPU, parses the
.trace.json.gz, and writes a compact per-op duration table to
results/profiles/PROFILE_<tag>.json — the attributable evidence VERDICT r2
asked for (raw traces stay out of git; only the summary is committed).

Device-op durations are the ONLY honest timings on the axon runtime
(CLAUDE.md): wall clocks measure the sync-dispatch tax, async dispatch
measures nothing. A few seconds of sleep inside the window lets the remote
queue drain.

Run:  python scripts/profile_breakdown.py [tag]
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_trace(trace_dir, min_us=2.0):
    """Sum device-op durations (us) per op name across the trace."""
    files = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    ops = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            # device lanes are pid-tagged with TPU core names; host python
            # threads carry no 'dur'-heavy XLA op names — filter by the
            # args.long_name / XLA-ish naming instead of pid heuristics
            name = ev.get("name", "")
            dur = float(ev.get("dur", 0.0))
            if dur <= 0 or name.startswith(("$", "process_", "Thread")):
                continue
            cat = ev.get("args", {}).get("group_id", None)
            key = name.split("(")[0][:80]
            ops.setdefault(key, [0.0, 0])
            ops[key][0] += dur
            ops[key][1] += 1
    rows = [{"op": k, "total_us": round(v[0], 1), "count": v[1]}
            for k, v in ops.items() if v[0] >= min_us]
    rows.sort(key=lambda r: -r["total_us"])
    return rows


def trace_burst(fn, args, tag, results, n_top=25):
    with tempfile.TemporaryDirectory() as td:
        out = fn(*args)
        jax.block_until_ready(out)  # compile outside the trace
        with jax.profiler.trace(td):
            out = fn(*args)
            jax.block_until_ready(out)
            time.sleep(4)  # drain the remote queue inside the window
        rows = parse_trace(td)
    results[tag] = rows[:n_top]
    total = sum(r["total_us"] for r in rows)
    print(f"{tag}: {total/1e3:.2f} ms device time, top ops:")
    for r in rows[:8]:
        print(f"    {r['total_us']:>10.1f} us x{r['count']:<5d} {r['op']}")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r03"
    from gaussianimage_tpu.datasets import load_single
    from gaussianimage_tpu.models import make_model

    from gaussianimage_tpu.ops import RasterizeConfig

    H, W, N = 512, 768, 10000
    gt = jnp.asarray(load_single("photos", "", "china"))
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    model_f = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                         raster=RasterizeConfig(fused_prep=True))
    state = model.init_state(jax.random.PRNGKey(1), gt_image=gt)
    chunk = jax.jit(lambda st, g, s: model.train_chunk(st, g, None, s, 100),
                    donate_argnums=(0,))
    for i in range(5):
        state, _ = chunk(state, gt, jnp.asarray(i * 100 + 1))
    jax.block_until_ready(state.params)

    BURST = 20

    def render_burst(p):
        def body(acc, i):
            q = dict(p)
            q["_xyz"] = q["_xyz"] + 1e-30 * i.astype(jnp.float32)
            return acc + model.render(q)["render"][0, 0, 0, 0], None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(1, BURST + 1, dtype=jnp.int32))[0]

    def render_fast_burst(p):
        def body(acc, i):
            q = dict(p)
            q["_xyz"] = q["_xyz"] + 1e-30 * i.astype(jnp.float32)
            return acc + model_f.render_fast(q)[0, 0, 0, 0], None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(1, BURST + 1, dtype=jnp.int32))[0]

    qmodel = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                        quantize=True)
    qmodel_f = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                          quantize=True,
                          raster=RasterizeConfig(fused_prep=True))
    qstate = qmodel.init_state(jax.random.PRNGKey(2))
    qp = dict(qstate.params)
    for k, v in state.params.items():
        qp[k] = v
    qstate = qstate._replace(params=qp)
    qstate = qmodel.init_quantizer_data(qstate)
    enc = jax.device_put(qmodel.compress_wo_ec(qstate.params, qstate.extra))

    def decode_burst_for(m):
        def burst(p, qe, e):
            def body(acc, i):
                q = dict(p)
                q["cholesky_quant_scale"] = (
                    q["cholesky_quant_scale"]
                    + 1e-30 * i.astype(jnp.float32))
                img = m.decompress_wo_ec(q, qe, e)["render"]
                return acc + img[0, 0, 0, 0], None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(1, BURST + 1, dtype=jnp.int32))[0]
        return burst

    decode_burst = decode_burst_for(qmodel)
    decode_burst_fused = decode_burst_for(qmodel_f)

    # batched decode (B frames through one binning+kernel pass) — round-2
    # measured batch-4 decode SLOWER than single-frame; this trace shows
    # where the per-frame busy time grows (sort? epilogue transposes?)
    from gaussianimage_tpu.batched import decompress_wo_ec_batch
    Bb = 6

    def stackb(x):
        return jnp.broadcast_to(x, (Bb,) + x.shape)

    qp_b = {k: stackb(v) for k, v in qstate.params.items()}
    qp_b["cholesky_quant_scale"] = (
        qp_b["cholesky_quant_scale"]
        + (jnp.arange(1, Bb + 1, dtype=jnp.float32) * 1e-30)[:, None])
    qe_b = jax.tree.map(stackb, qstate.extra)
    enc_b = {k: stackb(jnp.asarray(v)) for k, v in enc.items()}

    def decode_batched(pb, xb, eb):
        # fused batched prep when the flag is on (splat_prep.py
        # _batch_decode_kernel) — the serving path bench.py times
        return decompress_wo_ec_batch(qmodel_f, pb, xb, eb)["render"]

    gmodel = make_model("3DGS", num_points=N, H=H, W=W, loss_type="Fusion2")
    gmodel_f = make_model("3DGS", num_points=N, H=H, W=W,
                          loss_type="Fusion2",
                          raster=RasterizeConfig(fused_prep=True))
    gstate = gmodel.init_state(jax.random.PRNGKey(3))
    gchunk = jax.jit(lambda st, g, s: gmodel.train_chunk(st, g, None, s, 50),
                     donate_argnums=(0,))
    gstate, _ = gchunk(gstate, gt, jnp.asarray(1))

    def blend_burst(p):
        def body(acc, i):
            q = dict(p)
            q["_xyz"] = q["_xyz"] + 1e-30 * i.astype(jnp.float32)
            return acc + gmodel.render(q)["render"][0, 0, 0, 0], None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(1, 9, dtype=jnp.int32))[0]

    def blend_burst_fused(p):
        def body(acc, i):
            q = dict(p)
            q["_xyz"] = q["_xyz"] + 1e-30 * i.astype(jnp.float32)
            return acc + gmodel_f.render_fast(q)[0, 0, 0, 0], None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(1, 9, dtype=jnp.int32))[0]

    results = {"scene": "china_768x512", "num_points": N,
               "burst_frames": BURST, "backend": jax.default_backend()}
    trace_burst(jax.jit(render_burst), (state.params,), "render", results)
    trace_burst(jax.jit(render_fast_burst), (state.params,),
                "render_fused", results)
    trace_burst(jax.jit(decode_burst), (qstate.params, qstate.extra, enc),
                "decode", results)
    trace_burst(jax.jit(decode_burst_fused),
                (qstate.params, qstate.extra, enc), "decode_fused", results)
    # no donation here: trace_burst calls twice with the same state
    chunk_nd = jax.jit(lambda st, g, s: model.train_chunk(st, g, None, s, 100))
    trace_burst(chunk_nd, (state, gt, jnp.asarray(601)), "train_chunk_100",
                results)
    trace_burst(jax.jit(decode_batched), (qp_b, qe_b, enc_b),
                f"decode_batched_{Bb}f", results)
    trace_burst(jax.jit(blend_burst), (gstate.params,), "blend_3dgs_8f",
                results)
    trace_burst(jax.jit(blend_burst_fused), (gstate.params,),
                "blend_3dgs_fused_8f", results)

    out_dir = os.path.join("results", "profiles")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"PROFILE_{tag}.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
