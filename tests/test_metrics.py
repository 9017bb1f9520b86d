"""Metric tests: PSNR exactness, SSIM vs a direct NumPy implementation of the
standard Wang et al. formulation (pytorch-msssim semantics), MS-SSIM sanity."""

import numpy as np
import jax.numpy as jnp

from gaussianimage_tpu.utils import psnr, ssim, ms_ssim
from gaussianimage_tpu.utils.losses import loss_fn


def _np_gaussian_window(n=11, sigma=1.5):
    c = np.arange(n) - (n - 1) / 2
    g = np.exp(-(c**2) / (2 * sigma**2))
    return g / g.sum()


def _np_valid_sep_blur(x, win):
    # x: [H, W]; valid-mode separable filter
    k = win.shape[0]
    H, W = x.shape
    tmp = np.zeros((H - k + 1, W))
    for i in range(H - k + 1):
        tmp[i] = win @ x[i:i + k]
    out = np.zeros((H - k + 1, W - k + 1))
    for j in range(W - k + 1):
        out[:, j] = tmp[:, j:j + k] @ win
    return out


def _np_ssim(x, y, data_range=1.0):
    # x, y: [H, W] single channel
    win = _np_gaussian_window()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    mx = _np_valid_sep_blur(x, win)
    my = _np_valid_sep_blur(y, win)
    sxx = _np_valid_sep_blur(x * x, win) - mx * mx
    syy = _np_valid_sep_blur(y * y, win) - my * my
    sxy = _np_valid_sep_blur(x * y, win) - mx * my
    num = (2 * mx * my + c1) * (2 * sxy + c2)
    den = (mx**2 + my**2 + c1) * (sxx + syy + c2)
    return (num / den).mean()


def test_psnr_known_value():
    a = jnp.zeros((1, 3, 8, 8))
    b = jnp.full((1, 3, 8, 8), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-3


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32))
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6


def test_ssim_matches_numpy_reference():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (40, 48)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal((40, 48)).astype(np.float32), 0, 1)
    ref = _np_ssim(x.astype(np.float64), y.astype(np.float64))
    got = float(ssim(jnp.asarray(x)[None, None], jnp.asarray(y)[None, None]))
    assert abs(got - ref) < 5e-4


def test_ms_ssim_bounds_and_ordering():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 192, 192)).astype(np.float32))
    near = jnp.clip(x + 0.02, 0, 1)
    far = jnp.clip(x + 0.4, 0, 1)
    m_same = float(ms_ssim(x, x))
    m_near = float(ms_ssim(near, x))
    m_far = float(ms_ssim(far, x))
    assert abs(m_same - 1.0) < 1e-5
    assert m_same > m_near > m_far >= 0.0


def test_loss_zoo_finite_and_reasonable():
    rng = np.random.default_rng(3)
    # MS-SSIM (Fusion4/hinerv) needs >= (win-1)*2^4 + 1 = 161 px per side
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 176, 176)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (1, 3, 176, 176)).astype(np.float32))
    for lt in ["L2", "L1", "SSIM", "Fusion1", "Fusion2", "Fusion3", "Fusion4",
               "Fusion_hinerv"]:
        v = float(loss_fn(x, y, lt))
        assert np.isfinite(v) and v >= 0.0, lt
    # identical images: all losses ~ 0
    for lt in ["L2", "L1", "SSIM", "Fusion2"]:
        assert float(loss_fn(x, x, lt)) < 1e-5
