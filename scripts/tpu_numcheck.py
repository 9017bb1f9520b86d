"""On-TPU numerical check of every compiled kernel path.

The AOT gate (scripts/tpu_compile_check.py) proves the kernels lower; this
script proves the COMPILED kernels compute the numbers the interpret-mode
tests validate (compile can differ from interpret — CLAUDE.md). Run on the
real TPU after any kernel change, before committing.

Three tiers:

1. **On-TPU kernel vs XLA oracle** (tight tolerance). The dense cutoff
   oracle (core/render_ref.py) and the XLA compositing scan
   (rasterize_gaussians_blend_xla) run as plain XLA on the same chip with
   the same projected inputs, so inclusion decisions (radius boxes, tile
   bins, q-cut) are bit-identical and the comparison isolates the Pallas
   kernel's arithmetic. This is the CLAUDE.md-mandated on-TPU oracle check.
2. **Cross-backend parity** (TPU-compiled vs CPU-interpret) at a moderate
   shape. This is an ENVELOPE check, not an exactness check: TPU and CPU
   transcendentals (tanh on the atanh-space means, exp, rsqrt) differ by
   ulps, and those position/shape ulps are amplified by the image's
   spatial gradients — measured mean |diff| ~2e-4 on a fitted scene (r05,
   while the same scene's TRAIN LOSS matches to 1.5e-6 because random-sign
   pixel noise cancels in the mean-square). Separately, a gaussian whose
   3-sigma boundary straddles a pixel/tile edge can flip inclusion,
   perturbing isolated pixels by up to exp(-q_cut/2) ~ 1.1e-2. A real
   kernel bug sits orders of magnitude above both effects (and also fails
   tier 1, which is exact). Gate: mean <= 1e-3, max <= 2.5e-2.
3. **On-TPU internal consistency at the flagship shape**: fused-prep vs
   generic, serving config vs default — both sides compiled, tight.

Exit 0 iff every check passes.
"""

import sys
import traceback

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# cross-backend envelope (see module docstring tier 2)
XB_MEAN_TOL = 1e-3
XB_MAX_TOL = 2.5e-2
# moderate shape: multi-tile in both axes, off-square
Hs, Ws, Ns = 256, 384, 3000
# flagship shape for tier 1 + tier 3
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


def _diffs(a_tree, b_tree):
    pairs = zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree))
    mx = mean = 0.0
    for a, b in pairs:
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        if d.size:
            mx = max(mx, float(d.max()))
            mean = max(mean, float(d.mean()))
    return mx, mean


def check(name, got, want, tol):
    """Max-abs check (same-backend tiers)."""
    mx, _ = _diffs(got, want)
    ok = mx <= tol
    print(f"{'OK  ' if ok else 'FAIL'} {name:46s} max|d|={mx:.3e} "
          f"(tol {tol:g})", flush=True)
    return ok


def check_xb(name, got, want):
    """Two-tier envelope check (cross-backend tier)."""
    mx, mean = _diffs(got, want)
    ok = mean <= XB_MEAN_TOL and mx <= XB_MAX_TOL
    print(f"{'OK  ' if ok else 'FAIL'} {name:46s} mean|d|={mean:.3e} "
          f"max|d|={mx:.3e} (tol mean {XB_MEAN_TOL:g} / max {XB_MAX_TOL:g})",
          flush=True)
    return ok


def fitted_state(model, gt, steps=300, key=1):
    """Short TPU fit so gaussians spread over realistic tile occupancy."""
    state = model.init_state(jax.random.PRNGKey(key))
    chunk = jax.jit(lambda st, g, s: model.train_chunk(st, g, None, s, steps))
    state, _ = chunk(state, jnp.asarray(gt), jnp.asarray(1))
    return jax.tree.map(np.asarray, state)


def main():
    from gaussianimage_tpu.core import render_sum_dense
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig, rasterize_gaussians_sum
    from gaussianimage_tpu.ops.rasterize_blend import (
        BlendConfig, rasterize_gaussians_blend, rasterize_gaussians_blend_xla)
    from gaussianimage_tpu.utils.image_io import synthetic_image

    assert jax.default_backend() not in ("cpu",), (
        f"needs the real TPU, got {jax.default_backend()}")

    interp = RasterizeConfig(interpret=True)
    interp_f = RasterizeConfig(interpret=True, fused_prep=True)
    fused = RasterizeConfig(fused_prep=True)
    ok = True

    # shared flagship fit (tier 1 + tier 3 reuse it)
    Fmk = lambda **kw: make_model("GaussianImage_Cholesky", num_points=Nf,
                                  H=Hf, W=Wf, **kw)
    F = Fmk()
    fstate = fitted_state(F, synthetic_image(Hf, Wf, seed=1))
    fp = fstate.params

    # ========== tier 1: on-TPU Pallas kernel vs on-TPU XLA oracle ==========
    qcut = F.cfg.raster.q_cut

    def kernel_img(p):
        spl = F.splat(p)
        img, alpha, _ = rasterize_gaussians_sum(
            spl[0], spl[2], spl[3], spl[4], Hf, Wf, radii=spl[1],
            config=F.cfg.raster)
        return img, alpha

    def oracle_img(p):
        xys, radii, conics, colors, opac = F.splat(p)
        img = render_sum_dense(xys, conics, colors, opac, Hf, Wf, q_cut=qcut)
        alpha = render_sum_dense(xys, conics, jnp.ones_like(colors[:, :1]),
                                 opac, Hf, Wf, q_cut=qcut)[..., 0]
        return img, alpha

    ok &= check("tpu sum kernel vs dense oracle (flagship)",
                on_tpu(kernel_img, fp), on_tpu(oracle_img, fp), tol=5e-5)

    def kernel_grads(p):
        def loss(pp):
            img, alpha = kernel_img(pp)
            return jnp.mean((jnp.clip(img, 0, 1) - 0.5) ** 2) \
                + 0.1 * jnp.mean(alpha)
        return jax.value_and_grad(loss)(p)

    def oracle_grads(p):
        def loss(pp):
            img, alpha = oracle_img(pp)
            return jnp.mean((jnp.clip(img, 0, 1) - 0.5) ** 2) \
                + 0.1 * jnp.mean(alpha)
        return jax.value_and_grad(loss)(p)

    ok &= check("tpu sum kernel grads vs oracle autodiff (flagship)",
                on_tpu(kernel_grads, fp), on_tpu(oracle_grads, fp), tol=1e-5)

    # blend kernel vs XLA compositing scan, dense synthetic scene
    rng = np.random.default_rng(11)
    Nb = 3000
    s2 = rng.uniform(0.05, 0.8, Nb).astype(np.float32)
    blend_args = (
        rng.uniform(-6, max(Hs, Ws) + 6, (Nb, 2)).astype(np.float32),  # xys
        rng.uniform(1, 10, Nb).astype(np.float32),                     # depth
        np.full((Nb,), 14.0, np.float32),                              # radii
        np.stack([s2, (0.3 * s2 * rng.uniform(-1, 1, Nb)).astype(
            np.float32), s2], -1),                                     # conic
        rng.uniform(0, 1, (Nb, 3)).astype(np.float32),                 # color
        rng.uniform(0.1, 0.95, Nb).astype(np.float32),                 # opac
    )
    bg = np.asarray([0.2, 0.5, 0.8], np.float32)

    def blend_pair(fn):
        def f(*a):
            img, alpha, _ = fn(*a, Hs, Ws, background=jnp.asarray(bg),
                               config=BlendConfig())
            return img, alpha
        return f

    ok &= check("tpu blend kernel vs XLA compositing scan",
                on_tpu(blend_pair(rasterize_gaussians_blend), *blend_args),
                on_tpu(blend_pair(rasterize_gaussians_blend_xla),
                       *blend_args), tol=5e-4)

    # ============== tier 2: TPU-compiled vs CPU-interpret ==================
    gt = synthetic_image(Hs, Ws, seed=0)
    mk = lambda **kw: make_model("GaussianImage_Cholesky", num_points=Ns,
                                 H=Hs, W=Ws, **kw)
    model, model_i = mk(), mk(raster=interp)
    model_f, model_fi = mk(raster=fused), mk(raster=interp_f)
    state = fitted_state(model, gt)
    params = state.params

    ok &= check_xb("xb render (generic sum)",
                   on_tpu(lambda p: model.render(p)["render"], params),
                   on_cpu(lambda p: model_i.render(p)["render"], params))
    ok &= check_xb("xb render_fast (fused prep)",
                   on_tpu(model_f.render_fast, params),
                   on_cpu(model_fi.render_fast, params))

    def loss_path(m):
        def f(st, g):
            st2, metrics = m.train_chunk(st, g, None, jnp.asarray(1), 2)
            return metrics["loss"][-1], metrics["psnr"][-1]
        return f

    ok &= check("xb train_chunk loss (2 steps)",
                on_tpu(loss_path(model), state, gt)[0],
                on_cpu(loss_path(model_i), state, gt)[0], tol=2e-3)

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

    ok &= check_xb("xb decompress_wo_ec (generic)",
                   on_tpu(lambda p, e, c:
                          qmodel.decompress_wo_ec(p, e, c)["render"],
                          qp, qe, enc),
                   on_cpu(lambda p, e, c:
                          qmodel_i.decompress_wo_ec(p, e, c)["render"],
                          qp, qe, enc))

    g3 = make_model("3DGS", num_points=Ns, H=Hs, W=Ws)
    g3_i = make_model("3DGS", num_points=Ns, H=Hs, W=Ws, raster=interp)
    gstate = g3.init_state(jax.random.PRNGKey(3))
    gp = jax.tree.map(np.asarray, gstate.params)
    ok &= check_xb("xb 3DGS blend render",
                   on_tpu(lambda p: g3.render(p)["render"], gp),
                   on_cpu(lambda p: g3_i.render(p)["render"], gp))

    # ========== tier 3: on-TPU internal consistency at flagship ===========
    Ff = Fmk(raster=fused)
    Fs = Fmk(raster=RasterizeConfig.serving(Nf))
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
