"""Oracle renderer tests: value vs naive numpy, gradients vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.core import project_gaussians_2d, render_sum_dense


def _naive_numpy_render(xys, conics, colors, opac, H, W):
    out = np.zeros((H, W, colors.shape[-1]), np.float64)
    for i in range(xys.shape[0]):
        ys, xs = np.mgrid[0:H, 0:W]
        dx = xs - xys[i, 0]
        dy = ys - xys[i, 1]
        a, b, c = conics[i]
        q = a * dx * dx + 2 * b * dx * dy + c * dy * dy
        w = np.exp(-0.5 * q) * opac[i, 0]
        out += w[..., None] * colors[i]
    return out


def _random_scene(N, H, W, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.9, 0.9, (N, 2)).astype(np.float32)
    chol = rng.uniform(0.5, 1.5, (N, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    opac = np.ones((N, 1), np.float32)
    return means, chol, colors, opac


def test_render_matches_naive_numpy():
    N, H, W = 37, 24, 40
    means, chol, colors, opac = _random_scene(N, H, W)
    xys, _, _, conics, _ = project_gaussians_2d(
        jnp.asarray(means), jnp.asarray(chol), H, W, (3, 2, 1))
    img = render_sum_dense(xys, conics, jnp.asarray(colors), jnp.asarray(opac),
                           H, W, chunk=16)
    ref = _naive_numpy_render(np.asarray(xys), np.asarray(conics), colors, opac, H, W)
    np.testing.assert_allclose(np.asarray(img), ref, rtol=1e-4, atol=1e-4)


def test_render_grads_vs_finite_differences():
    N, H, W = 5, 12, 16
    means, chol, colors, opac = _random_scene(N, H, W, seed=7)
    target = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss(params):
        m, c, col = params
        xys, _, _, conics, _ = project_gaussians_2d(m, c, H, W, (1, 1, 1))
        img = render_sum_dense(xys, conics, col, jnp.asarray(opac), H, W, chunk=8)
        return jnp.mean((img - target) ** 2)

    params = (jnp.asarray(means), jnp.asarray(chol), jnp.asarray(colors))
    grads = jax.grad(loss)(params)

    eps = 1e-3
    for pi, g in enumerate(grads):
        g = np.asarray(g)
        flat_idx = [(0, 0), (2, 1)] if g.shape[1] >= 2 else [(0, 0)]
        for (i, j) in flat_idx:
            p_list = [np.array(p) for p in params]
            p_list[pi][i, j] += eps
            lp = float(loss(tuple(jnp.asarray(p) for p in p_list)))
            p_list[pi][i, j] -= 2 * eps
            lm = float(loss(tuple(jnp.asarray(p) for p in p_list)))
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - g[i, j]) < 5e-3 * max(1.0, abs(fd)), (
                f"param {pi} [{i},{j}]: fd={fd} grad={g[i, j]}")


def test_render_radius_culling_close_to_full():
    N, H, W = 64, 32, 48
    means, chol, colors, opac = _random_scene(N, H, W, seed=3)
    xys, _, radii, conics, _ = project_gaussians_2d(
        jnp.asarray(means), jnp.asarray(chol), H, W, (3, 2, 1))
    full = render_sum_dense(xys, conics, jnp.asarray(colors), jnp.asarray(opac), H, W)
    culled = render_sum_dense(xys, conics, jnp.asarray(colors), jnp.asarray(opac),
                              H, W, radii=radii)
    # 3-sigma cut drops < exp(-4.5) per gaussian; totals stay close
    assert float(jnp.abs(full - culled).max()) < 0.05
