"""Content-adaptive Gaussian initialization.

The reference initializes positions uniformly at random
(gaussianimage_cholesky.py:29-31); at low point budgets that wastes
capacity on flat regions and starves edges/texture. Here initial positions
are sampled from a gradient-magnitude density over the ground-truth image:
smooth regions need few large gaussians, detailed regions many small ones.
This is a pure ADDITION over the reference (opt in via
ModelConfig.init_mode="adaptive"; the trainer CLI defaults to it, sweeps
can pass --init_mode uniform for exact reference behavior).

Everything runs as jax ops on device — no host readback (the axon runtime
permanently degrades dispatch after any D2H copy, CLAUDE.md), and the same
function works under the CPU test mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gradient_density(gt_image: jnp.ndarray, H: int, W: int,
                     power: float = 0.5, mix: float = 0.3) -> jnp.ndarray:
    """[H*W] sampling probabilities from the GT's local gradient magnitude.

    - luminance gradient magnitude (forward diffs), 3x3 box-blurred so mass
      covers both sides of an edge
    - raised to ``power`` (<1 flattens the density: edges win, but flat
      regions keep coverage)
    - mixed with a uniform floor (``mix``) so no region is starved —
      gaussians must exist everywhere for the accumulated-sum blend to
      reproduce flat colors
    """
    img = jnp.asarray(gt_image, jnp.float32).reshape(-1, H, W)
    gray = img.mean(axis=0)
    gx = jnp.diff(gray, axis=1, append=gray[:, -1:])
    gy = jnp.diff(gray, axis=0, append=gray[-1:, :])
    gm = jnp.sqrt(gx * gx + gy * gy)
    # 3x3 box blur via two separable 3-tap averages (cheap, fusible)
    p = jnp.pad(gm, 1, mode="edge")
    gm = (p[:-2, 1:-1] + p[1:-1, 1:-1] + p[2:, 1:-1]) / 3.0
    p = jnp.pad(gm, ((0, 0), (1, 1)), mode="edge")
    gm = (p[:, :-2] + p[:, 1:-1] + p[:, 2:]) / 3.0
    w = jnp.power(jnp.maximum(gm, 0.0), power)
    w = w / jnp.maximum(w.sum(), 1e-12)
    return ((1.0 - mix) * w + mix / (H * W)).reshape(-1)


def adaptive_init_xyz(key: jax.Array, gt_image: jnp.ndarray, n: int,
                      H: int, W: int, power: float = 0.5,
                      mix: float = 0.3) -> jnp.ndarray:
    """[n, 2] positions in atanh space, sampled without replacement from the
    gradient density (Gumbel top-k), jittered uniformly within each chosen
    pixel cell. Drop-in replacement for the uniform init's _xyz."""
    p = gradient_density(gt_image, H, W, power=power, mix=mix)
    k1, k2 = jax.random.split(key)
    # Gumbel-top-k = sampling n indices WITHOUT replacement ~ p
    scores = jnp.log(p) + jax.random.gumbel(k1, (H * W,))
    _, idx = jax.lax.top_k(scores, n)
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)
    u = jax.random.uniform(k2, (n, 2))
    xn = (x + u[:, 0]) / W * 2.0 - 1.0
    yn = (y + u[:, 1]) / H * 2.0 - 1.0
    pts = jnp.clip(jnp.stack([xn, yn], axis=-1), -(1 - 1e-6), 1 - 1e-6)
    return jnp.arctanh(pts).astype(jnp.float32)


def adaptive_init_sigma(gt_image: jnp.ndarray, xyz_atanh: jnp.ndarray,
                        n: int, H: int, W: int, coef: float = 0.35,
                        power: float = 0.5, mix: float = 0.3,
                        smin: float = 0.7, smax: float = 12.0
                        ) -> jnp.ndarray:
    """[n] isotropic initial sigma in PIXELS: ``coef`` x the expected local
    point spacing under the sampling density (lambda = n * p points per
    pixel^2, spacing = 1/sqrt(lambda)) — large blobs in flat regions, ~1 px
    at edges. The reference inits every gaussian at sigma ~ 1 px
    (rand + 0.5 bound, gaussianimage_cholesky.py:32). coef swept on the
    flower proxy at 20k iters: 0.35 -> 38.05 dB, 0.5 -> 37.71,
    0.75 -> 37.15, 1.0 -> 35.63, position-only baseline 37.35
    (results/init_ab/). Clipped to [smin, smax] so no gaussian starts
    degenerate or absurdly wide."""
    p = gradient_density(gt_image, H, W, power=power, mix=mix)
    pos = jnp.tanh(xyz_atanh)
    x = jnp.clip(((pos[:, 0] + 1) * 0.5 * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(((pos[:, 1] + 1) * 0.5 * H).astype(jnp.int32), 0, H - 1)
    lam = n * p.reshape(H, W)[y, x]
    return jnp.clip(coef / jnp.sqrt(jnp.maximum(lam, 1e-12)), smin, smax
                    ).astype(jnp.float32)


def init_colors_from_gt(gt_image: jnp.ndarray, xyz_atanh: jnp.ndarray,
                        H: int, W: int, scale: float = 0.5) -> jnp.ndarray:
    """[n, 3] color init: the GT pixel under each initial position, scaled
    down (accumulated-sum blending overlaps ~2-3 gaussians per pixel, so a
    full-strength copy overshoots; 0.5 starts near the right magnitude and
    Adan fixes the rest within a few hundred iters)."""
    img = jnp.asarray(gt_image, jnp.float32).reshape(-1, H, W)[:3]
    pos = jnp.tanh(xyz_atanh)
    x = jnp.clip(((pos[:, 0] + 1) * 0.5 * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(((pos[:, 1] + 1) * 0.5 * H).astype(jnp.int32), 0, H - 1)
    return (img[:, y, x].T * scale).astype(jnp.float32)
