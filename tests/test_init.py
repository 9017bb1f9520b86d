"""Content-adaptive initialization (core/init.py): sampling properties and
the short-fit PSNR advantage over the reference's uniform init."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.core.init import (adaptive_init_sigma,
                                         adaptive_init_xyz, gradient_density,
                                         init_colors_from_gt)
from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.utils.image_io import synthetic_image


def _edge_image(H=64, W=96):
    """Left half flat, right half high-frequency checkerboard."""
    img = np.full((1, 3, H, W), 0.5, np.float32)
    yy, xx = np.mgrid[:H, :W // 2]
    checker = ((yy // 2 + xx // 2) % 2).astype(np.float32)
    img[0, :, :, W // 2:] = checker[None]
    return img


def test_density_concentrates_on_detail():
    H, W = 64, 96
    img = _edge_image(H, W)
    p = np.asarray(gradient_density(jnp.asarray(img), H, W)).reshape(H, W)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    right = p[:, W // 2:].sum()
    assert right > 0.8, right  # detail half dominates
    assert p.min() > 0.0       # uniform floor: nothing starved


def test_adaptive_positions_land_on_detail_and_in_bounds():
    H, W, n = 64, 96, 512
    img = _edge_image(H, W)
    xyz = adaptive_init_xyz(jax.random.PRNGKey(0), jnp.asarray(img), n, H, W)
    assert xyz.shape == (n, 2) and bool(jnp.isfinite(xyz).all())
    pos = np.asarray(jnp.tanh(xyz))
    assert (np.abs(pos) < 1.0).all()
    frac_right = (pos[:, 0] > 0).mean()
    assert frac_right > 0.6, frac_right


def test_colors_sample_gt_pixels():
    H, W, n = 32, 48, 64
    img = np.zeros((1, 3, H, W), np.float32)
    img[0, 0] = 1.0  # pure red image
    xyz = adaptive_init_xyz(jax.random.PRNGKey(1), jnp.asarray(img), n, H, W)
    cols = np.asarray(init_colors_from_gt(jnp.asarray(img), xyz, H, W))
    np.testing.assert_allclose(cols[:, 0], 0.5, atol=1e-6)  # scale 0.5
    np.testing.assert_allclose(cols[:, 1:], 0.0, atol=1e-6)


def test_sigma_tracks_local_spacing():
    """Init sigma must be larger in flat regions (sparse points) than in
    detailed regions (dense points), and respect the clip bounds."""
    H, W, n = 64, 96, 512
    img = jnp.asarray(_edge_image(H, W))
    xyz = adaptive_init_xyz(jax.random.PRNGKey(0), img, n, H, W)
    sig = np.asarray(adaptive_init_sigma(img, xyz, n, H, W))
    assert sig.shape == (n,) and np.isfinite(sig).all()
    assert sig.min() >= 0.7 - 1e-6 and sig.max() <= 12.0 + 1e-6
    pos = np.asarray(jnp.tanh(xyz))
    left = sig[pos[:, 0] < 0]    # flat half: few points, wide spacing
    right = sig[pos[:, 0] > 0]   # checker half: dense points
    assert left.size and right.size
    assert left.mean() > 1.5 * right.mean(), (left.mean(), right.mean())


def test_adaptive_cholesky_init_is_isotropic_sigma():
    """The model's adaptive init stores sigma - bound with zero off-diag, so
    L = (sigma, 0, sigma) reproduces an isotropic sigma-px gaussian."""
    H, W, n = 64, 96, 256
    img = jnp.asarray(_edge_image(H, W))
    m = make_model("GaussianImage_Cholesky", num_points=n, H=H, W=W,
                   init_mode="adaptive")
    p = m.init_params(jax.random.PRNGKey(3), gt_image=img)
    chol = np.asarray(p["_cholesky"]) + np.asarray([0.5, 0.0, 0.5])
    np.testing.assert_allclose(chol[:, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(chol[:, 0], chol[:, 2], atol=1e-5)
    assert (chol[:, 0] >= 0.7 - 1e-6).all()


def test_adaptive_beats_uniform_short_fit():
    H, W, N = 64, 96, 512
    gt = jnp.asarray(synthetic_image(H, W, seed=4))
    psnr = {}
    for mode in ("uniform", "adaptive"):
        m = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       init_mode=mode)
        st = m.init_state(jax.random.PRNGKey(1), gt_image=gt)
        st, met = m.train_chunk(st, gt, None, jnp.asarray(1), 300)
        psnr[mode] = float(np.asarray(met["psnr"])[-1])
    assert psnr["adaptive"] > psnr["uniform"] + 0.5, psnr


def test_uniform_mode_ignores_gt():
    # init_mode="uniform" with a gt passed must equal the no-gt init
    m = make_model("GaussianImage_Cholesky", num_points=64, H=16, W=24,
                   init_mode="uniform")
    gt = jnp.asarray(synthetic_image(16, 24, seed=0))
    a = m.init_params(jax.random.PRNGKey(7), gt_image=gt)
    b = m.init_params(jax.random.PRNGKey(7))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
