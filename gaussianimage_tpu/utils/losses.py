"""Loss zoo — the 8 loss types of the reference (utils.py:20-40), in jnp.

Models default to L2 with lambda 0.7 (train.py:105); the 3DGS baseline uses
Fusion2 = 0.7*L1 + 0.3*(1 - SSIM) (train.py:122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianimage_tpu.utils.metrics import ms_ssim, ssim


def loss_fn(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "L2",
            lambda_value: float = 0.7) -> jnp.ndarray:
    """pred/target: NCHW float images in [0, 1]. target is treated as constant."""
    target = jax.lax.stop_gradient(target).astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    lam = lambda_value

    if loss_type == "L2":
        return jnp.mean((pred - target) ** 2)
    if loss_type == "L1":
        return jnp.mean(jnp.abs(pred - target))
    if loss_type == "SSIM":
        return 1.0 - ssim(pred, target, data_range=1.0)
    if loss_type == "Fusion1":
        return lam * jnp.mean((pred - target) ** 2) + (1 - lam) * (
            1.0 - ssim(pred, target, data_range=1.0))
    if loss_type == "Fusion2":
        return lam * jnp.mean(jnp.abs(pred - target)) + (1 - lam) * (
            1.0 - ssim(pred, target, data_range=1.0))
    if loss_type == "Fusion3":
        return lam * jnp.mean((pred - target) ** 2) + (1 - lam) * jnp.mean(
            jnp.abs(pred - target))
    if loss_type == "Fusion4":
        return lam * jnp.mean(jnp.abs(pred - target)) + (1 - lam) * (
            1.0 - ms_ssim(pred, target, data_range=1.0))
    if loss_type == "Fusion_hinerv":
        return lam * jnp.mean(jnp.abs(pred - target)) + (1 - lam) * (
            1.0 - ms_ssim(pred, target, data_range=1.0, win_size=5))
    raise ValueError(f"unknown loss_type: {loss_type}")
