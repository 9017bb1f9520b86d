"""Pallas sum-rasterizer vs the dense oracle: forward parity (same q-cutoff;
the kernel evaluates the quadratic form as a tile-local f32 matmul, so
tolerance is ~1e-3 relative), gradient parity vs jax.grad of the oracle,
opacity gradients, jit-compatibility. Interpret mode on the CPU harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianimage_tpu.core import project_gaussians_2d, render_sum_dense
from gaussianimage_tpu.ops import RasterizeConfig, rasterize_gaussians_sum

CFG = RasterizeConfig()


def _scene(N, H, W, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-0.95, 0.95, (N, 2)).astype(np.float32))
    chol = jnp.asarray(rng.uniform(0.3, 2.0, (N, 3)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 1.0, (N, 1)).astype(np.float32))
    tb = (-(-W // 16), -(-H // 16), 1)
    xys, _, radii, conics, _ = project_gaussians_2d(means, chol, H, W, tb)
    return xys, radii, conics, colors, opac


@pytest.mark.parametrize("N,H,W", [(200, 32, 48), (64, 48, 32), (300, 64, 64)])
def test_forward_matches_cutoff_oracle(N, H, W):
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=N)
    img, alpha, aux = rasterize_gaussians_sum(
        xys, conics, colors, opac, H, W, radii=radii, config=CFG)
    assert int(aux["n_dropped_fwd"]) == 0
    assert int(aux["n_dropped_bwd"]) == 0
    ref = render_sum_dense(xys, conics, colors, opac, H, W, q_cut=CFG.q_cut)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)
    ref_alpha = render_sum_dense(xys, conics, jnp.ones_like(colors[:, :1]),
                                 opac, H, W, q_cut=CFG.q_cut)[..., 0]
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha),
                               rtol=2e-3, atol=2e-4)


def test_gradients_match_oracle():
    N, H, W = 150, 32, 32
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=1)
    target = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss_kernel(args):
        xys, conics, colors, opac = args
        img, alpha, _ = rasterize_gaussians_sum(
            xys, conics, colors, opac, H, W, radii=radii, config=CFG)
        return jnp.mean((img - target) ** 2) + 0.1 * jnp.mean(alpha)

    def loss_oracle(args):
        xys, conics, colors, opac = args
        img = render_sum_dense(xys, conics, colors, opac, H, W,
                               q_cut=CFG.q_cut)
        alpha = render_sum_dense(xys, conics, jnp.ones_like(colors[:, :1]),
                                 opac, H, W, q_cut=CFG.q_cut)[..., 0]
        return jnp.mean((img - target) ** 2) + 0.1 * jnp.mean(alpha)

    args = (xys, conics, colors, opac)
    lk = float(loss_kernel(args))
    lo = float(loss_oracle(args))
    assert abs(lk - lo) < 1e-3 * max(1.0, abs(lo))

    gk = jax.grad(loss_kernel)(args)
    go = jax.grad(loss_oracle)(args)
    names = ["xys", "conics", "colors", "opac"]
    for name, a, b in zip(names, gk, go):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-3 * scale,
                                   err_msg=name)


def test_jit_and_config_invariance():
    N, H, W = 100, 32, 48
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=3)

    @jax.jit
    def render(xys, conics, colors, opac):
        img, _, _ = rasterize_gaussians_sum(xys, conics, colors, opac, H, W,
                                            radii=radii, config=CFG)
        return img

    img = render(xys, conics, colors, opac)
    # different tiling configs must produce the same image
    cfg2 = CFG._replace(tile_px=16, tiles_per_step=2, block_inst=32)
    img2, _, _ = rasterize_gaussians_sum(xys, conics, colors, opac, H, W,
                                         radii=radii, config=cfg2)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2),
                               rtol=2e-3, atol=2e-4)


def test_nonmultiple_image_size():
    # H, W not multiples of the 16px tile: pad + crop path
    N, H, W = 80, 37, 53
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=4)
    img, _, aux = rasterize_gaussians_sum(xys, conics, colors, opac, H, W,
                                          radii=radii, config=CFG)
    assert img.shape == (H, W, 3)
    ref = render_sum_dense(xys, conics, colors, opac, H, W, q_cut=CFG.q_cut)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_capacity_overflow_never_produces_garbage():
    # Force instance-stream overflow (max_instances tiny): outputs and
    # gradients must stay finite (overflow windows are clipped), and the
    # drop must be reported. Regression for the uninitialized-memory NaN
    # found on TPU with the earlier design.
    N, H, W = 512, 32, 48
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=9)
    cfg = CFG._replace(max_instances=128)  # << the ~1.5k live instances

    def loss(args):
        xys, colors = args
        img, alpha, aux = rasterize_gaussians_sum(
            xys, conics, colors, opac, H, W, radii=radii, config=cfg)
        return jnp.mean(img ** 2) + jnp.mean(alpha), aux

    (l, aux), g = jax.value_and_grad(loss, has_aux=True)((xys, colors))
    assert int(aux["n_dropped"]) > 0
    assert np.isfinite(float(l))
    for arr in g:
        assert bool(jnp.isfinite(arr).all())
    # ample capacity: no drops
    _, _, aux2 = rasterize_gaussians_sum(
        xys, conics, colors, opac, H, W, radii=radii,
        config=CFG._replace(max_instances=32768))
    assert int(aux2["n_dropped"]) == 0


def test_offscreen_gaussians_ignored():
    N, H, W = 64, 32, 32
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=5)
    # push half the gaussians far off-image
    far = jnp.asarray([[5000.0, 5000.0]])
    xys2 = jnp.where((jnp.arange(N) % 2 == 0)[:, None], xys + far, xys)
    img, _, _ = rasterize_gaussians_sum(xys2, conics, colors, opac, H, W,
                                        radii=radii, config=CFG)
    ref = render_sum_dense(xys2, conics, colors, opac, H, W, q_cut=CFG.q_cut)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_aligned_stream_path_matches_flat():
    # force the BK-aligned block-stream path (used for large N) and check
    # forward + all gradients against the default flat-stream path
    N, H, W = 220, 64, 96
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=12)
    cfg_flat = CFG
    cfg_al = CFG._replace(flat_stream_limit=0)

    def loss(cfg, args):
        xys, conics, colors, opac = args
        img, alpha, aux = rasterize_gaussians_sum(
            xys, conics, colors, opac, H, W, radii=radii, config=cfg)
        return jnp.sum(img ** 2) + 0.5 * jnp.sum(alpha ** 2), aux

    args = (xys, conics, colors, opac)
    (l1, aux1), g1 = jax.value_and_grad(
        lambda a: loss(cfg_flat, a), has_aux=True)(args)
    (l2, aux2), g2 = jax.value_and_grad(
        lambda a: loss(cfg_al, a), has_aux=True)(args)
    assert int(aux1["n_dropped"]) == 0 and int(aux2["n_dropped"]) == 0
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_degenerate_conic_stays_finite():
    # QAT can quantize a Cholesky diagonal to ~1e-4, making the conic huge
    # and strongly correlated; the f32 quadratic form then cancels ~1e11-
    # scale terms and can come out negative. Regression: exp must never see
    # a spuriously negative q (NaN fit collapse observed after ~2k QAT
    # iters on TPU).
    N, H, W = 4, 64, 64
    xys = jnp.asarray([[32.2, 31.7], [10.0, 10.0], [50.0, 20.0], [20., 50.]],
                      jnp.float32)
    # cov from cholesky with l22 ~ 1e-4 and large l21 (near-singular)
    l11, l21, l22 = 0.22, 8.0, 1.7e-4
    s11, s12, s22 = l11 * l11, l11 * l21, l21 * l21 + l22 * l22
    det = max(s11 * s22 - s12 * s12, 1e-6)
    conic_bad = [s22 / det, -s12 / det, s11 / det]
    conics = jnp.asarray([conic_bad, [0.5, 0.0, 0.5], conic_bad,
                          [0.2, 0.1, 0.3]], jnp.float32)
    colors = jnp.full((N, 3), 0.5)
    opac = jnp.ones((N, 1))
    radii = jnp.full((N,), 30.0)

    def loss(args):
        xys, conics, colors, opac = args
        img, alpha, _ = rasterize_gaussians_sum(
            xys, conics, colors, opac, H, W, radii=radii, config=CFG)
        return jnp.sum(img ** 2) + jnp.sum(alpha)

    (l, g) = jax.value_and_grad(loss)((xys, conics, colors, opac)), None
    val, grads = l
    assert np.isfinite(float(val))
    for arr in grads:
        assert bool(jnp.isfinite(arr).all())


def test_fused_l2_matches_render_plus_loss():
    from gaussianimage_tpu.ops.rasterize_sum import rasterize_gaussians_sum_l2

    N, H, W = 150, 64, 96
    xys, radii, conics, colors, opac = _scene(N, H, W, seed=17)
    rng = np.random.default_rng(5)
    gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))

    def unfused(args):
        xys, conics, colors, opac = args
        img, _, _ = rasterize_gaussians_sum(
            xys, conics, colors, opac, H, W, radii=radii, config=CFG)
        img = jnp.clip(img, 0.0, 1.0)
        return jnp.mean((img.transpose(2, 0, 1) - gt) ** 2)

    def fused(args):
        xys, conics, colors, opac = args
        mse, _ = rasterize_gaussians_sum_l2(
            xys, conics, colors, opac, gt, H, W, radii=radii, config=CFG)
        return mse

    args = (xys, conics, colors, opac)
    l1, g1 = jax.value_and_grad(unfused)(args)
    l2, g2 = jax.value_and_grad(fused)(args)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b, name in zip(g1, g2, ("xys", "conics", "colors", "opac")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-8, err_msg=name)


def test_fused_l2_deep_tile():
    # one tile holding many chunk-loads of instances (deep data-dependent
    # trip counts in both fused passes)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.ops.rasterize_sum import (
        rasterize_gaussians_sum, rasterize_gaussians_sum_l2)

    H, W = 64, 96
    cfg = RasterizeConfig()
    N = 4 * cfg.block_inst + 80  # all in one tile -> many chunks
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    xys = jnp.asarray([20.0, 20.0]) + jax.random.uniform(k1, (N, 2)) * 4.0
    conics = jnp.tile(jnp.asarray([[0.5, 0.1, 0.6]]), (N, 1))
    colors = jax.random.uniform(k2, (N, 3))
    opac = jax.random.uniform(k3, (N, 1), minval=0.2, maxval=1.0)
    gt = jax.random.uniform(jax.random.PRNGKey(9), (3, H, W))

    def fused(args):
        mse, _ = rasterize_gaussians_sum_l2(*args, gt, H, W, config=cfg)
        return mse

    def unfused(args):
        img, _, _ = rasterize_gaussians_sum(*args, H, W, config=cfg)
        return jnp.mean((jnp.clip(img, 0, 1).transpose(2, 0, 1) - gt) ** 2)

    args = (xys, conics, colors, opac)
    np.testing.assert_allclose(float(fused(args)), float(unfused(args)),
                               rtol=1e-5)
    gf = jax.grad(fused)(args)
    gu = jax.grad(unfused)(args)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)
