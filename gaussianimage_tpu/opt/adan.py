"""Adan — Adaptive Nesterov Momentum (arXiv 2208.06677) as an optax
GradientTransformation.

Matches the update rule of the reference's vendored PyTorch implementation
(optimizer.py:238-293, single-tensor path; betas default (0.98, 0.92, 0.99),
prox-style decoupled weight decay, optional global grad-norm clip). On TPU the
whole update is one fused XLA computation, so no "fused"/"foreach" variants are
needed — a jitted jnp Adan *is* the fused kernel.

Update rule, step t >= 1 (g_0 := g_1, so diff_1 = 0):
    diff_t = g_t - g_{t-1}
    m_t = b1 m_{t-1} + (1-b1) g_t
    d_t = b2 d_{t-1} + (1-b2) diff_t
    u_t = g_t + b2 diff_t
    n_t = b3 n_{t-1} + (1-b3) u_t^2
    denom = sqrt(n_t) / sqrt(1-b3^t) + eps
    p <- (p - lr/(1-b1^t) * m_t/denom - lr*b2/(1-b2^t) * d_t/denom) / (1 + lr*wd)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


class ScaleByAdanState(NamedTuple):
    count: jnp.ndarray  # int32 scalar, number of completed updates
    exp_avg: optax.Updates  # m
    exp_avg_sq: optax.Updates  # n
    exp_avg_diff: optax.Updates  # d
    prev_grad: optax.Updates  # g_{t-1}


def _lr_at(learning_rate: ScalarOrSchedule, count) -> jnp.ndarray:
    if callable(learning_rate):
        return learning_rate(count)
    return jnp.asarray(learning_rate)


def scale_by_adan(
    learning_rate: ScalarOrSchedule = 1e-3,
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
    no_prox: bool = False,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdanState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            exp_avg_diff=jax.tree.map(jnp.zeros_like, params),
            prev_grad=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("adan requires params for the prox weight-decay step")
        t = state.count + 1
        lr = _lr_at(learning_rate, state.count)

        if max_grad_norm > 0.0:
            gnorm = optax.global_norm(updates)
            clip = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
        else:
            clip = jnp.ones([], jnp.float32)
        grads = jax.tree.map(lambda g: g * clip, updates)

        # At t == 1 the reference seeds prev_grad with the first (clipped)
        # gradient so diff_1 == 0 (optimizer.py:187-189).
        is_first = (t == 1)
        prev = jax.tree.map(
            lambda pg, g: jnp.where(is_first, g, pg), state.prev_grad, grads
        )

        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.exp_avg, grads)
        diff = jax.tree.map(lambda g, pg: g - pg, grads, prev)
        d = jax.tree.map(lambda d_, df: b2 * d_ + (1 - b2) * df,
                         state.exp_avg_diff, diff)
        n = jax.tree.map(
            lambda n_, g, df: b3 * n_ + (1 - b3) * (g + b2 * df) ** 2,
            state.exp_avg_sq, grads, diff,
        )

        bc1 = 1.0 - b1 ** t.astype(jnp.float32)
        bc2 = 1.0 - b2 ** t.astype(jnp.float32)
        bc3_sqrt = jnp.sqrt(1.0 - b3 ** t.astype(jnp.float32))
        step_m = lr / bc1
        step_d = lr * b2 / bc2

        def delta(p, m_, d_, n_):
            denom = jnp.sqrt(n_) / bc3_sqrt + eps
            raw = -(step_m * m_ + step_d * d_) / denom
            if weight_decay == 0.0:
                return raw
            if no_prox:
                # p <- p(1 - lr*wd) + raw  =>  delta = raw - p*lr*wd
                return raw - p * lr * weight_decay
            # prox: p <- (p + raw) / (1 + lr*wd)
            return (p + raw) / (1.0 + lr * weight_decay) - p

        deltas = jax.tree.map(delta, params, m, d, n)
        new_state = ScaleByAdanState(
            count=t, exp_avg=m, exp_avg_sq=n, exp_avg_diff=d, prev_grad=grads
        )
        return deltas, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adan(
    learning_rate: ScalarOrSchedule = 1e-3,
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
    no_prox: bool = False,
) -> optax.GradientTransformation:
    """Adan optimizer; apply with ``optax.apply_updates``."""
    return scale_by_adan(learning_rate, betas, eps, weight_decay,
                         max_grad_norm, no_prox)
