"""Image quality metrics in pure jnp: PSNR, SSIM, MS-SSIM.

SSIM / MS-SSIM follow the pytorch-msssim semantics the reference evaluates
with (train.py:262, utils.py:29-39): separable 11-tap Gaussian window with
sigma 1.5, valid-mode convolution, K = (0.01, 0.03), data_range 1; MS-SSIM
uses the standard 5 level weights with 2x average-pool downsampling.

Inputs are NCHW ([B, C, H, W]) float arrays, like the reference's tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(win_size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(win_size, dtype=jnp.float32) - (win_size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / g.sum()


def _blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable valid-mode Gaussian filter on NCHW."""
    c = x.shape[1]
    k = win.shape[0]
    kern_h = jnp.tile(win.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kern_w = jnp.tile(win.reshape(1, 1, 1, k), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NCHW", "OIHW", "NCHW"))
    # full f32 accumulation: TPU convs default to bf16 inputs, which is far
    # too coarse for PSNR/SSIM-grade evaluation
    x = jax.lax.conv_general_dilated(x, kern_h, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kern_w, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def _ssim_per_channel(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur(x * x, win) - mu_xx
    sigma_yy = _blur(y * y, win) - mu_yy
    sigma_xy = _blur(x * y, win) - mu_xy

    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    # mean over spatial dims -> [B, C]
    return ssim_map.mean(axis=(2, 3)), cs_map.mean(axis=(2, 3))


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
) -> jnp.ndarray:
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    win = _gaussian_window(win_size, win_sigma)
    s, _ = _ssim_per_channel(x, y, win, data_range)
    return s.mean() if size_average else s.mean(axis=1)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
    weights=_MSSSIM_WEIGHTS,
) -> jnp.ndarray:
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    win = _gaussian_window(win_size, win_sigma)
    weights = jnp.asarray(weights, jnp.float32)
    levels = weights.shape[0]

    mcs = []
    s = None
    for i in range(levels):
        s, cs = _ssim_per_channel(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            pad_h, pad_w = x.shape[2] % 2, x.shape[3] % 2
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
            y = jnp.pad(y, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2),
                                      (1, 1, 2, 2), "VALID") / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 1, 2, 2),
                                      (1, 1, 2, 2), "VALID") / 4.0

    s = jax.nn.relu(s)  # [B, C]
    stack = jnp.stack(mcs + [s], axis=0)  # [levels, B, C]
    val = jnp.prod(stack ** weights[:, None, None], axis=0)  # [B, C]
    return val.mean() if size_average else val.mean(axis=1)
