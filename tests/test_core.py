"""Core math tests: covariance builders, conics, projection, NDC mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianimage_tpu.core import (
    conic_from_cov2d,
    cov2d_from_cholesky,
    cov2d_from_scale_rot,
    ndc_to_pixel,
    project_gaussians_2d,
    project_gaussians_2d_scale_rot,
    radius_from_cov2d,
)


def test_cov_from_cholesky_matches_matrix_product():
    rng = np.random.default_rng(0)
    chol = rng.uniform(0.2, 2.0, (64, 3)).astype(np.float32)
    cov = np.asarray(cov2d_from_cholesky(jnp.asarray(chol)))
    for i in range(64):
        L = np.array([[chol[i, 0], 0.0], [chol[i, 1], chol[i, 2]]])
        S = L @ L.T
        np.testing.assert_allclose(cov[i], [S[0, 0], S[0, 1], S[1, 1]], rtol=1e-5)


def test_cov_from_scale_rot_matches_matrix_product():
    rng = np.random.default_rng(1)
    scales = rng.uniform(0.3, 3.0, (64, 2)).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi, (64, 1)).astype(np.float32)
    cov = np.asarray(cov2d_from_scale_rot(jnp.asarray(scales), jnp.asarray(theta)))
    for i in range(64):
        c, s = np.cos(theta[i, 0]), np.sin(theta[i, 0])
        R = np.array([[c, -s], [s, c]])
        S = R @ np.diag(scales[i] ** 2) @ R.T
        np.testing.assert_allclose(
            cov[i], [S[0, 0], S[0, 1], S[1, 1]], rtol=1e-4, atol=1e-5)


def test_conic_is_inverse():
    rng = np.random.default_rng(2)
    chol = rng.uniform(0.5, 2.0, (32, 3)).astype(np.float32)
    cov = cov2d_from_cholesky(jnp.asarray(chol))
    con = np.asarray(conic_from_cov2d(cov))
    cov = np.asarray(cov)
    for i in range(32):
        S = np.array([[cov[i, 0], cov[i, 1]], [cov[i, 1], cov[i, 2]]])
        C = np.array([[con[i, 0], con[i, 1]], [con[i, 1], con[i, 2]]])
        np.testing.assert_allclose(S @ C, np.eye(2), atol=1e-4)


def test_ndc_to_pixel_corners():
    m = jnp.asarray([[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]])
    px = np.asarray(ndc_to_pixel(m, H=512, W=768))
    np.testing.assert_allclose(px[0], [-0.5, -0.5])
    np.testing.assert_allclose(px[1], [767.5, 511.5])
    np.testing.assert_allclose(px[2], [383.5, 255.5])


def test_radius_is_conservative():
    # isotropic sigma=2 -> radius ceil(3*2)=6
    cov = jnp.asarray([[4.0, 0.0, 4.0]])
    assert float(radius_from_cov2d(cov)[0]) == 6.0


def test_project_gaussians_2d_shapes_and_tiles():
    N, H, W = 100, 64, 96
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    rng = np.random.default_rng(3)
    means = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 2)).astype(np.float32))
    chol = jnp.asarray(rng.uniform(0.5, 1.5, (N, 3)).astype(np.float32))
    xys, depths, radii, conics, nth = project_gaussians_2d(means, chol, H, W, tb)
    assert xys.shape == (N, 2) and conics.shape == (N, 3)
    assert depths.shape == (N,) and radii.shape == (N,) and nth.shape == (N,)
    assert int(nth.min()) >= 1  # every in-bounds gaussian hits >= 1 tile


def test_projection_differentiable():
    N, H, W = 8, 32, 32
    tb = (2, 2, 1)
    rng = np.random.default_rng(4)
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 2)).astype(np.float32))
    chol = jnp.asarray(rng.uniform(0.5, 1.5, (N, 3)).astype(np.float32))

    def f(m, c):
        xys, _, _, conics, _ = project_gaussians_2d(m, c, H, W, tb)
        return jnp.sum(xys) + jnp.sum(conics)

    g = jax.grad(f, argnums=(0, 1))(means, chol)
    assert all(bool(jnp.isfinite(x).all()) for x in g)


def test_project_scale_rot_matches_cholesky_for_axis_aligned():
    # axis-aligned scale-rot (theta=0) == cholesky with l21=0
    N, H, W = 16, 64, 64
    tb = (4, 4, 1)
    rng = np.random.default_rng(5)
    means = jnp.asarray(rng.uniform(-0.8, 0.8, (N, 2)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.5, 2.0, (N, 2)).astype(np.float32))
    theta = jnp.zeros((N, 1), jnp.float32)
    chol = jnp.stack([s[:, 0], jnp.zeros(N), s[:, 1]], axis=-1)
    out_rs = project_gaussians_2d_scale_rot(means, s, theta, H, W, tb)
    out_ch = project_gaussians_2d(means, chol, H, W, tb)
    for a, b in zip(out_rs, out_ch):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
