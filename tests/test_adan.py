"""Adan parity vs a direct NumPy transcription of the reference single-tensor
path (optimizer.py:238-293), per SURVEY.md §4."""

import jax.numpy as jnp
import numpy as np
import optax

from gaussianimage_tpu.opt import adan, step_lr


def _numpy_adan_steps(p0, grads, lr=1e-3, betas=(0.98, 0.92, 0.99), eps=1e-8,
                      weight_decay=0.0, no_prox=False):
    """Direct transcription of reference _single_tensor_adan."""
    b1, b2, b3 = betas
    p = p0.astype(np.float64).copy()
    m = np.zeros_like(p)
    n = np.zeros_like(p)
    d = np.zeros_like(p)
    neg_pre = None
    out = []
    for t, g in enumerate(grads, start=1):
        g = g.astype(np.float64)
        if neg_pre is None:
            neg_pre = -g.copy()
        bc1, bc2, bc3 = 1 - b1**t, 1 - b2**t, 1 - b3**t
        tmp = neg_pre + g  # diff_t
        m = b1 * m + (1 - b1) * g
        d = b2 * d + (1 - b2) * tmp
        tmp = b2 * tmp + g  # g + b2*diff
        n = b3 * n + (1 - b3) * tmp * tmp
        denom = np.sqrt(n) / np.sqrt(bc3) + eps
        step = lr / bc1
        step_diff = lr * b2 / bc2
        if no_prox:
            p = p * (1 - lr * weight_decay)
            p = p - step * m / denom - step_diff * d / denom
        else:
            p = p - step * m / denom - step_diff * d / denom
            p = p / (1 + lr * weight_decay)
        neg_pre = -g.copy()
        out.append(p.copy())
    return out


def _run_jax_adan(p0, grads, **kw):
    opt = adan(**kw)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)
    out = []
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
        out.append(np.asarray(params["w"]))
    return out


def test_adan_matches_reference_transcription():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(20)]
    ref = _numpy_adan_steps(p0, grads, lr=1e-3)
    got = _run_jax_adan(p0, grads, learning_rate=1e-3)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-6)


def test_adan_with_weight_decay_prox():
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal((8,)).astype(np.float32)
    grads = [rng.standard_normal((8,)).astype(np.float32) for _ in range(10)]
    ref = _numpy_adan_steps(p0, grads, lr=1e-2, weight_decay=0.02)
    got = _run_jax_adan(p0, grads, learning_rate=1e-2, weight_decay=0.02)
    np.testing.assert_allclose(got[-1], ref[-1], rtol=1e-5, atol=1e-6)


def test_adan_no_prox_decay():
    rng = np.random.default_rng(2)
    p0 = rng.standard_normal((8,)).astype(np.float32)
    grads = [rng.standard_normal((8,)).astype(np.float32) for _ in range(10)]
    ref = _numpy_adan_steps(p0, grads, lr=1e-2, weight_decay=0.02, no_prox=True)
    got = _run_jax_adan(p0, grads, learning_rate=1e-2, weight_decay=0.02,
                        no_prox=True)
    np.testing.assert_allclose(got[-1], ref[-1], rtol=1e-5, atol=1e-6)


def test_adan_grad_clip():
    rng = np.random.default_rng(3)
    p0 = rng.standard_normal((8,)).astype(np.float32)
    grads = [10.0 * rng.standard_normal((8,)).astype(np.float32) for _ in range(5)]

    # reference clip: factor = min(max_norm / (||g|| + eps), 1)
    def clipped(gs, max_norm):
        out = []
        for g in gs:
            norm = np.linalg.norm(g)
            out.append(g * min(max_norm / (norm + 1e-8), 1.0))
        return out

    ref = _numpy_adan_steps(p0, clipped(grads, 1.0), lr=1e-3)
    got = _run_jax_adan(p0, grads, learning_rate=1e-3, max_grad_norm=1.0)
    np.testing.assert_allclose(got[-1], ref[-1], rtol=1e-4, atol=1e-6)


def test_step_lr_schedule():
    sch = step_lr(1e-3, step_size=20000, gamma=0.5)
    assert float(sch(0)) == 1e-3
    assert float(sch(19999)) == 1e-3
    assert abs(float(sch(20000)) - 5e-4) < 1e-12
    assert abs(float(sch(40000)) - 2.5e-4) < 1e-12
