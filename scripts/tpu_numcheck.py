"""On-TPU numerical check: compiled Mosaic kernels on the real TPU vs the
SAME math in Pallas interpret mode on the CPU backend.

The AOT gate (scripts/tpu_compile_check.py) proves the kernels lower; this
script proves the compiled kernels compute the numbers the oracle-pinned
interpret tests validate (compile can differ from interpret — CLAUDE.md).
Run on the real TPU after any kernel change, before committing.

Two tiers (interpret mode re-traces the kernel body per grid step, so
flagship-scale interpret on CPU is minutes per render):
 - cross-backend parity (TPU-compiled vs CPU-interpret) at a moderate
   multi-tile shape — catches compiled-vs-interpret numeric divergence,
   which is logic, not shape;
 - on-TPU internal consistency (fused vs generic, serving vs default
   config) at the FLAGSHIP shape — both sides compiled, cheap.

Exit 0 iff every check passes.
"""

import sys
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

TOL = 5e-4   # max |TPU - CPU-interpret| on [0,1]-scale images
# cross-backend shape: multi-tile in both axes, off-square
Hs, Ws, Ns = 256, 384, 3000
# flagship shape for on-TPU internal checks
Hf, Wf, Nf = 512, 768, 10000


def on_cpu(fn, *args):
    cpu = jax.devices("cpu")[0]
    args = jax.device_put(args, cpu)
    with jax.default_device(cpu):
        return jax.tree.map(np.asarray, jax.jit(fn)(*args))


def on_tpu(fn, *args):
    tpu = jax.devices()[0]
    args = jax.device_put(args, tpu)
    return jax.tree.map(np.asarray, jax.jit(fn)(*args))


def check(name, tpu_out, cpu_out, tol=TOL):
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float64)
                                         - np.asarray(b, np.float64))))
        if np.asarray(a).size else 0.0,
        tpu_out, cpu_out)
    worst = max(jax.tree.leaves(diffs) or [0.0])
    ok = worst <= tol
    print(f"{'OK  ' if ok else 'FAIL'} {name:44s} max|diff|={worst:.3e} "
          f"(tol {tol:g})", flush=True)
    return ok


def fitted_params(model, gt, steps=300, key=1):
    """Short TPU fit so gaussians spread over realistic tile occupancy."""
    state = model.init_state(jax.random.PRNGKey(key))
    chunk = jax.jit(lambda st, g, s: model.train_chunk(st, g, None, s, steps))
    state, _ = chunk(state, jnp.asarray(gt), jnp.asarray(1))
    return jax.tree.map(np.asarray, state)


def main():
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.utils.image_io import synthetic_image

    assert jax.default_backend() not in ("cpu",), (
        f"needs the real TPU, got {jax.default_backend()}")

    interp = RasterizeConfig(interpret=True)
    interp_f = RasterizeConfig(interpret=True, fused_prep=True)
    fused = RasterizeConfig(fused_prep=True)
    ok = True

    # ================= tier 1: TPU-compiled vs CPU-interpret ==============
    gt = synthetic_image(Hs, Ws, seed=0)
    mk = lambda **kw: make_model("GaussianImage_Cholesky", num_points=Ns,
                                 H=Hs, W=Ws, **kw)
    model, model_i = mk(), mk(raster=interp)
    model_f, model_fi = mk(raster=fused), mk(raster=interp_f)
    state = fitted_params(model, gt)
    params = state.params

    ok &= check("xb render (generic sum)",
                on_tpu(lambda p: model.render(p)["render"], params),
                on_cpu(lambda p: model_i.render(p)["render"], params))
    ok &= check("xb render_fast (fused prep)",
                on_tpu(model_f.render_fast, params),
                on_cpu(model_fi.render_fast, params))

    def loss_path(m):
        def f(st, g):
            st2, metrics = m.train_chunk(st, g, None, jnp.asarray(1), 2)
            return metrics["loss"][-1], metrics["psnr"][-1]
        return f

    ok &= check("xb train_chunk loss/psnr (2 steps)",
                on_tpu(loss_path(model), state, gt),
                on_cpu(loss_path(model_i), state, gt), tol=2e-3)

    qmk = lambda **kw: make_model("GaussianImage_Cholesky", num_points=Ns,
                                  H=Hs, W=Ws, quantize=True, **kw)
    qmodel, qmodel_i = qmk(), qmk(raster=interp)
    qstate = qmodel.init_state(jax.random.PRNGKey(2))
    qparams = dict(qstate.params)
    for k, v in params.items():
        qparams[k] = v
    qstate = qmodel.init_quantizer_data(qstate._replace(params=qparams))
    qp = jax.tree.map(np.asarray, qstate.params)
    qe = jax.tree.map(np.asarray, qstate.extra)
    enc = jax.tree.map(np.asarray,
                       qmodel.compress_wo_ec(qstate.params, qstate.extra))

    ok &= check("xb decompress_wo_ec (generic)",
                on_tpu(lambda p, e, c:
                       qmodel.decompress_wo_ec(p, e, c)["render"],
                       qp, qe, enc),
                on_cpu(lambda p, e, c:
                       qmodel_i.decompress_wo_ec(p, e, c)["render"],
                       qp, qe, enc))

    g3 = make_model("3DGS", num_points=Ns, H=Hs, W=Ws)
    g3_i = make_model("3DGS", num_points=Ns, H=Hs, W=Ws, raster=interp)
    gstate = g3.init_state(jax.random.PRNGKey(3), gt_image=jnp.asarray(gt))
    gp = jax.tree.map(np.asarray, gstate.params)
    ok &= check("xb 3DGS blend render",
                on_tpu(lambda p: g3.render(p)["render"], gp),
                on_cpu(lambda p: g3_i.render(p)["render"], gp), tol=2e-3)

    # ============ tier 2: on-TPU internal consistency at flagship =========
    Fmk = lambda **kw: make_model("GaussianImage_Cholesky", num_points=Nf,
                                  H=Hf, W=Wf, **kw)
    F, Ff = Fmk(), Fmk(raster=fused)
    Fs = Fmk(raster=RasterizeConfig.serving(Nf))
    fstate = fitted_params(F, synthetic_image(Hf, Wf, seed=1))
    fp = fstate.params

    base = on_tpu(lambda p: F.render(p)["render"], fp)
    ok &= check("tpu flagship fused-prep vs generic",
                on_tpu(Ff.render_fast, fp), base, tol=1e-5)
    ok &= check("tpu flagship serving-config vs default",
                on_tpu(lambda p: Fs.render(p)["render"], fp), base, tol=1e-6)

    Fq = Fmk(quantize=True)
    Fqf = Fmk(quantize=True, raster=fused)
    fqstate = Fq.init_state(jax.random.PRNGKey(4))
    fqp = dict(fqstate.params)
    for k, v in fp.items():
        fqp[k] = v
    fqstate = Fq.init_quantizer_data(fqstate._replace(params=fqp))
    fqp = jax.tree.map(np.asarray, fqstate.params)
    fqe = jax.tree.map(np.asarray, fqstate.extra)
    fenc = jax.tree.map(np.asarray,
                        Fq.compress_wo_ec(fqstate.params, fqstate.extra))
    ok &= check("tpu flagship decode fused vs generic",
                on_tpu(lambda p, e, c:
                       Fqf.decompress_wo_ec(p, e, c)["render"],
                       fqp, fqe, fenc),
                on_tpu(lambda p, e, c:
                       Fq.decompress_wo_ec(p, e, c)["render"],
                       fqp, fqe, fenc), tol=1e-5)

    g3F = make_model("3DGS", num_points=Nf, H=Hf, W=Wf)
    g3Ff = make_model("3DGS", num_points=Nf, H=Hf, W=Wf, raster=fused)
    gstateF = g3F.init_state(jax.random.PRNGKey(5))
    gpF = jax.tree.map(np.asarray, gstateF.params)
    ok &= check("tpu flagship 3DGS fused-prep vs generic",
                on_tpu(g3Ff.render_fast, gpF),
                on_tpu(lambda p: g3F.render(p)["render"], gpF), tol=2e-3)

    print("TPU NUMCHECK:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(2)
