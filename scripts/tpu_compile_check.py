"""TPU AOT compile gate: lower + compile every public entry point on the
flagship shapes WITHOUT executing them (no timings, no readbacks — safe to
run before a bench).

Round 4 shipped a HEAD whose forward kernel failed Mosaic lowering on the
real TPU while all 116 CPU tests passed (interpret mode cannot catch Mosaic
lowering failures). This gate is the missing sanitizer: run it on the real
TPU before ANY snapshot or kernel commit (CLAUDE.md rule).

Usage:  python scripts/tpu_compile_check.py          # all entries
        python scripts/tpu_compile_check.py render decode   # substring filter
Exit code 0 iff every selected entry compiles.
"""

import sys
import time
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

H, W, N = 512, 768, 10000
BATCH = 6


def shapes_of(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def entries():
    from gaussianimage_tpu.batched import decompress_wo_ec_batch
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig

    fused = RasterizeConfig(fused_prep=True)
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    model_f = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                         raster=fused)
    state = model.init_state(jax.random.PRNGKey(0))
    p = shapes_of(state.params)
    st = shapes_of(state)
    gt = jax.ShapeDtypeStruct((1, 3, H, W), jnp.float32)  # dataset layout
    it = jax.ShapeDtypeStruct((), jnp.int32)

    yield ("render", lambda q: model.render(q)["render"], (p,))
    yield ("render_fast_fused", model_f.render_fast, (p,))
    yield ("train_chunk_fused_l2",
           lambda s_, g, i: model.train_chunk(s_, g, None, i, 100),
           (st, gt, it))

    qmodel = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                        quantize=True)
    qmodel_f = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                          quantize=True, raster=fused)
    qstate = qmodel.init_state(jax.random.PRNGKey(1))
    enc = qmodel.compress_wo_ec(qstate.params, qstate.extra)
    qp, qe, enc_s = (shapes_of(qstate.params), shapes_of(qstate.extra),
                     shapes_of(enc))
    qst = shapes_of(qstate)

    yield ("qat_train_chunk",
           lambda s_, g, i: qmodel.train_chunk(s_, g, None, i, 100),
           (qst, gt, it))
    yield ("decode_wo_ec",
           lambda a, b, c: qmodel.decompress_wo_ec(a, b, c)["render"],
           (qp, qe, enc_s))
    yield ("decode_wo_ec_fused",
           lambda a, b, c: qmodel_f.decompress_wo_ec(a, b, c)["render"],
           (qp, qe, enc_s))

    def stack(x):
        return jax.ShapeDtypeStruct((BATCH,) + tuple(x.shape), x.dtype)

    yield ("decode_batched",
           lambda a, b, c: decompress_wo_ec_batch(qmodel_f, a, b, c)["render"],
           (jax.tree.map(stack, qp), jax.tree.map(stack, qe),
            jax.tree.map(stack, enc_s)))

    # largest serving shape: 70k points on the raised 196608-instance flat
    # stream (the reference's sweep ceiling; serving keeps the flat layout
    # through the whole 10k-70k range)
    big = make_model("GaussianImage_Cholesky", num_points=70000, H=H, W=W,
                     raster=RasterizeConfig.serving(70000))
    bstate = big.init_state(jax.random.PRNGKey(5))
    yield ("render_serving_70k", big.render_fast, (shapes_of(bstate.params),))

    rs = make_model("GaussianImage_RS", num_points=N, H=H, W=W)
    rstate = rs.init_state(jax.random.PRNGKey(2))
    yield ("rs_render", lambda q: rs.render(q)["render"],
           (shapes_of(rstate.params),))
    yield ("rs_train_chunk",
           lambda s_, g, i: rs.train_chunk(s_, g, None, i, 100),
           (shapes_of(rstate), gt, it))

    wm = make_model("GaussianImage_Cholesky_wMask", num_points=N, H=H, W=W)
    wstate = wm.init_state(jax.random.PRNGKey(3))
    yield ("wmask_train_chunk",
           lambda s_, g, i: wm.train_chunk(s_, g, None, i, 100),
           (shapes_of(wstate), gt, it))

    g3 = make_model("3DGS", num_points=N, H=H, W=W, loss_type="Fusion2")
    g3_f = make_model("3DGS", num_points=N, H=H, W=W, loss_type="Fusion2",
                      raster=fused)
    g3state = g3.init_state(jax.random.PRNGKey(4))
    g3p = shapes_of(g3state.params)
    yield ("blend_3dgs_render", lambda q: g3.render(q)["render"], (g3p,))
    yield ("blend_3dgs_render_fast", g3_f.render_fast, (g3p,))
    yield ("blend_3dgs_train_chunk",
           lambda s_, g, i: g3.train_chunk(s_, g, None, i, 100),
           (shapes_of(g3state), gt, it))


def main():
    filters = sys.argv[1:]
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend not in ("tpu", "axon"):
        print("ERROR: this gate must run on the real TPU (interpret mode "
              "cannot catch Mosaic lowering failures)")
        return 2
    failed = []
    for name, fn, args in entries():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            jax.jit(fn).lower(*args).compile()
            print(f"PASS {name}  ({time.time() - t0:.1f}s)")
        except Exception:
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
            failed.append(name)
    if failed:
        print(f"\nCOMPILE GATE FAILED: {failed}")
        return 1
    print("\nCOMPILE GATE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
