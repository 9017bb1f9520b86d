"""LR schedules. ``step_lr`` mirrors torch StepLR as used by the reference
models (StepLR(step_size=20000, gamma=0.5), gaussianimage_cholesky.py:55)."""

from __future__ import annotations

import jax.numpy as jnp


def step_lr(init_value: float, step_size: int = 20000, gamma: float = 0.5):
    """Piecewise-constant decay: lr(t) = init * gamma ** floor(t / step_size)."""

    def schedule(count):
        return init_value * gamma ** (count // step_size)

    return schedule
