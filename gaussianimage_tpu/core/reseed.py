"""Error-driven gaussian relocation ("reseeding") during a fit.

A constant-N analog of 3DGS densification, and a pure ADDITION over the
reference (which never moves capacity once initialized): at a few early
iterations the lowest-importance gaussians are relocated to the pixels the
current render reproduces worst —

 - victims: bottom ``frac`` of ``model.importance(params)`` (color energy x
   footprint area — capacity contributing least to the image),
 - targets: Gumbel-top-k samples (without replacement) from the squared
   per-pixel error density of the CURRENT render,
 - new state: position = target pixel (jittered), color = 0.7 x the GT
   residual there (for accumulated-sum blending, adding the residual
   directly reduces the error), isotropic sigma = 1.5 px,
 - the victims' optimizer-state rows (Adan moments) are zeroed so stale
   momentum does not drag them back.

Everything is jittable device code (no host readback — axon rule,
CLAUDE.md). Evidence (CPU proxy, results/init_ab/reseed_ab.txt): +0.35 dB
at 20k iters on flower, +0.1 on china over the adaptive-init baseline,
with the crossover by ~10-12k iters — reseeding trades early PSNR for a
better final configuration, so rounds are scheduled in the first ~40% of
the fit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# fractions of the total fit at which rounds fire — the exact ladder that
# won the 20k-iter proxy screening (38.56 dB vs 38.40 for a sparser 3-round
# ladder, 38.05 without reseeding; results/init_ab/reseed_ab.txt)
RESEED_FRACTIONS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.6)


def default_schedule(iterations: int, rounds: int = 6,
                     min_iterations: int = 5000) -> Tuple[int, ...]:
    """Reseed iterations at fixed fractions of the fit (scale-free: the
    last round always leaves 40% of the fit for recovery). Short fits skip
    reseeding entirely — a round needs thousands of iterations to pay off."""
    if iterations < min_iterations:
        return ()
    return tuple(int(f * iterations) for f in RESEED_FRACTIONS[:rounds])


def reseed_state(model, state, gt_image, key, frac: float = 0.05):
    """One relocation round. Returns the updated TrainState.

    ``model`` must set ``reseed_ok = True`` and provide ``importance`` and
    ``relocated`` (models/cholesky.py, models/rs.py)."""
    cfg = model.cfg
    H, W, N = cfg.H, cfg.W, cfg.num_points
    k = max(int(N * frac), 1)
    p = state.params

    render = jnp.clip(model.render(p)["render"], 0.0, 1.0)     # [1,3,H,W]
    gt = jnp.asarray(gt_image, jnp.float32).reshape(render.shape)
    err = ((render - gt) ** 2).sum(axis=(0, 1)).reshape(-1)    # [H*W]

    _, victims = jax.lax.top_k(-model.importance(p), k)

    k1, k2 = jax.random.split(key)
    pe = err / jnp.maximum(err.sum(), 1e-12)
    g = jnp.log(jnp.maximum(pe, 1e-20)) + jax.random.gumbel(k1, (H * W,))
    _, pix = jax.lax.top_k(g, k)                    # k distinct pixels
    y = (pix // W).astype(jnp.float32)
    x = (pix % W).astype(jnp.float32)
    u = jax.random.uniform(k2, (k, 2))
    xn = jnp.clip((x + u[:, 0]) / W * 2.0 - 1.0, -(1 - 1e-6), 1 - 1e-6)
    yn = jnp.clip((y + u[:, 1]) / H * 2.0 - 1.0, -(1 - 1e-6), 1 - 1e-6)
    new_xyz = jnp.arctanh(jnp.stack([xn, yn], axis=-1))
    resid = (gt - render)[0][:, pix // W, pix % W].T           # [k, 3]
    sigma = jnp.full((k,), 1.5, jnp.float32)

    new_params = model.relocated(p, victims, new_xyz, 0.7 * resid, sigma)

    def zero_rows(leaf):
        # per-gaussian moment rows -> 0 for the relocated ids; leaves whose
        # leading dim is not N (scalars, schedules) pass through
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == N:
            return leaf.at[victims].set(0.0)
        return leaf

    opt_state = jax.tree.map(zero_rows, state.opt_state)
    return state._replace(params=new_params, opt_state=opt_state)
