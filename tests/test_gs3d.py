"""3DGS baseline tests: SH values, projection sanity, blend rasterizer vs a
naive NumPy compositor, end-to-end fit smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.core.camera3d import project_gaussians, quat_to_rotmat
from gaussianimage_tpu.core.sh import num_sh_bases, spherical_harmonics
from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.ops.rasterize_blend import (
    BlendConfig,
    rasterize_gaussians_blend,
)
from gaussianimage_tpu.utils.image_io import synthetic_image


def test_num_sh_bases():
    assert [num_sh_bases(d) for d in range(5)] == [1, 4, 9, 16, 25]


def test_sh_degree0_is_constant():
    dirs = jnp.asarray(np.random.default_rng(0).standard_normal((8, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = jnp.ones((8, 1, 3))
    out = spherical_harmonics(0, dirs, coeffs)
    np.testing.assert_allclose(np.asarray(out), 0.28209479177387814,
                               rtol=1e-6)


def test_sh_degree1_linearity():
    # along +z, the z-band contributes +C1 * coeff
    dirs = jnp.asarray([[0.0, 0.0, 1.0]])
    coeffs = jnp.zeros((1, 4, 3)).at[0, 2, 0].set(1.0)
    out = spherical_harmonics(1, dirs, coeffs)
    assert abs(float(out[0, 0]) - 0.4886025119029199) < 1e-6


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    R = np.asarray(quat_to_rotmat(q))
    for i in range(16):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R[i]) - 1.0) < 1e-5


def test_projection_center_point():
    # point at origin projects to image center, depth 8
    H, W = 64, 64
    viewmat = jnp.asarray([[1., 0, 0, 0], [0, 1., 0, 0],
                           [0, 0, 1., 8.], [0, 0, 0, 1.]])
    xys, depths, radii, conics, nth, _ = project_gaussians(
        jnp.zeros((1, 3)), jnp.full((1, 3), 0.1), 1.0,
        jnp.asarray([[1.0, 0, 0, 0]]), viewmat, viewmat,
        32.0, 32.0, 32.0, 32.0, H, W, (4, 4, 1))
    np.testing.assert_allclose(np.asarray(xys[0]), [32.0, 32.0], atol=1e-5)
    assert abs(float(depths[0]) - 8.0) < 1e-6
    assert float(radii[0]) > 0 and int(nth[0]) >= 1


def _np_blend(xys, conics, colors, opac, depths, H, W, bg):
    order = np.argsort(depths, kind="stable")
    out = np.tile(bg, (H, W, 1)).astype(np.float64)
    Tbuf = np.ones((H, W), np.float64)
    acc = np.zeros((H, W, 3), np.float64)
    ys, xs = np.mgrid[0:H, 0:W]
    for i in order:
        dx = xs - xys[i, 0]
        dy = ys - xys[i, 1]
        a, b, c = conics[i]
        q = a * dx * dx + 2 * b * dx * dy + c * dy * dy
        alpha = np.minimum(0.999, opac[i] * np.exp(-0.5 * np.maximum(q, 0)))
        alpha = np.where(alpha < 1 / 255.0, 0.0, alpha)
        acc += (Tbuf * alpha)[..., None] * colors[i]
        Tbuf = Tbuf * (1 - alpha)
    return acc + Tbuf[..., None] * bg, 1 - Tbuf


def test_blend_matches_numpy():
    rng = np.random.default_rng(2)
    N, H, W = 40, 32, 32
    xys = rng.uniform(0, 32, (N, 2)).astype(np.float32)
    # isotropic conics of moderate size
    inv_s2 = rng.uniform(0.05, 0.5, N).astype(np.float32)
    conics = np.stack([inv_s2, np.zeros(N, np.float32), inv_s2], -1)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
    depths = rng.uniform(1, 10, N).astype(np.float32)
    radii = np.full(N, 20.0, np.float32)
    bg = np.asarray([1.0, 1.0, 1.0], np.float32)

    img, alpha, aux = rasterize_gaussians_blend(
        jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
        jnp.asarray(conics), jnp.asarray(colors), jnp.asarray(opac),
        H, W, background=jnp.asarray(bg),
        config=BlendConfig(max_per_tile=64, tile_chunk=2))
    assert int(aux["n_dropped"]) == 0
    ref_img, ref_alpha = _np_blend(xys, conics, colors, opac, depths, H, W, bg)
    np.testing.assert_allclose(np.asarray(img), ref_img, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(alpha), ref_alpha, rtol=1e-4,
                               atol=1e-4)


def test_blend_differentiable():
    rng = np.random.default_rng(3)
    N, H, W = 20, 16, 16
    xys = jnp.asarray(rng.uniform(0, 16, (N, 2)).astype(np.float32))
    conics = jnp.asarray(
        np.stack([np.full(N, 0.2), np.zeros(N), np.full(N, 0.2)], -1)
        .astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.9, (N,)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 10, N).astype(np.float32))
    radii = jnp.full((N,), 10.0)

    def loss(args):
        xys, colors, opac = args
        img, _, _ = rasterize_gaussians_blend(
            xys, depths, radii, conics, colors, opac, H, W,
            config=BlendConfig(max_per_tile=32, tile_chunk=1))
        return jnp.mean(img ** 2)

    g = jax.grad(loss)((xys, colors, opac))
    for arr in g:
        assert bool(jnp.isfinite(arr).all())
    assert float(jnp.abs(g[1]).max()) > 0


def test_gs3d_fit_smoke():
    model = make_model("3DGS", num_points=256, H=32, W=32, loss_type="Fusion2",
                       sh_degree=1)
    gt = jnp.asarray(synthetic_image(32, 32, seed=0))
    state = model.init_state(jax.random.PRNGKey(0))
    pkg = model.render(state.params)
    assert pkg["render"].shape == (1, 3, 32, 32)
    state, metrics = model.train_chunk(state, gt, None, jnp.asarray(1), 40)
    losses, psnrs = metrics["loss"], metrics["psnr"]
    p = np.asarray(psnrs)
    assert np.isfinite(p).all()
    assert p[-1] > p[0]


def test_blend_pallas_grads_match_xla_oracle():
    # Pallas blend (hand-written log-space backward) vs exact autodiff of
    # the XLA compositing scan — forward and all four gradients.
    from gaussianimage_tpu.ops.rasterize_blend import (
        rasterize_gaussians_blend_xla)

    rng = np.random.default_rng(11)
    N, H, W = 120, 32, 48
    xys = jnp.asarray(rng.uniform(-4, 52, (N, 2)).astype(np.float32))
    s2 = rng.uniform(0.05, 0.6, N).astype(np.float32)
    b = (0.3 * s2 * rng.uniform(-1, 1, N)).astype(np.float32)
    conics = jnp.asarray(np.stack([s2, b, s2], -1))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.1, 0.95, (N,)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 10, N).astype(np.float32))
    radii = jnp.full((N,), 14.0)
    bg = jnp.asarray([0.2, 0.5, 0.8], jnp.float32)

    def loss(fn, args):
        xys, conics, colors, opac = args
        img, alpha, _ = fn(xys, depths, radii, conics, colors, opac, H, W,
                           background=bg, config=BlendConfig())
        return jnp.sum(img ** 2) + 0.3 * jnp.sum(alpha ** 2)

    args = (xys, conics, colors, opac)
    img_p, alpha_p, _ = rasterize_gaussians_blend(
        xys, depths, radii, conics, colors, opac, H, W, background=bg)
    img_x, alpha_x, _ = rasterize_gaussians_blend_xla(
        xys, depths, radii, conics, colors, opac, H, W, background=bg)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_x),
                               rtol=1e-4, atol=1e-5)

    gp = jax.grad(lambda a: loss(rasterize_gaussians_blend, a))(args)
    gx = jax.grad(lambda a: loss(rasterize_gaussians_blend_xla, a))(args)
    for a, b_, name in zip(gp, gx, ("xys", "conics", "colors", "opac")):
        scale = max(float(jnp.abs(b_).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b_) / scale,
            rtol=5e-4, atol=5e-5, err_msg=name)


def test_blend_aligned_stream_matches_flat():
    rng = np.random.default_rng(21)
    N, H, W = 100, 32, 48
    xys = jnp.asarray(rng.uniform(0, 48, (N, 2)).astype(np.float32))
    s2 = rng.uniform(0.05, 0.5, N).astype(np.float32)
    conics = jnp.asarray(np.stack([s2, np.zeros(N, np.float32), s2], -1))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.1, 0.9, (N,)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 10, N).astype(np.float32))
    radii = jnp.full((N,), 12.0)

    def loss(cfg, args):
        xys, colors, opac = args
        img, alpha, _ = rasterize_gaussians_blend(
            xys, depths, radii, conics, colors, opac, H, W, config=cfg)
        return jnp.sum(img ** 2) + 0.3 * jnp.sum(alpha ** 2)

    args = (xys, colors, opac)
    l1, g1 = jax.value_and_grad(
        lambda a: loss(BlendConfig(), a))(args)
    l2, g2 = jax.value_and_grad(
        lambda a: loss(BlendConfig(flat_stream_limit=0), a))(args)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_blend_early_stop_matches_and_truncates():
    # a deep stack of near-opaque gaussians saturates T quickly: with the
    # default early_stop_T the render+grads must match the no-early-stop
    # kernel (contributions behind saturation are < eps), while an absurdly
    # aggressive threshold must visibly change the image (i.e. the while
    # loop really does exit early)
    rng = np.random.default_rng(33)
    N, H, W = 512, 32, 32
    xys = jnp.asarray(rng.uniform(4, 28, (N, 2)).astype(np.float32))
    # wide gaussians (sigma ~5-10 px) so every pixel of every tile gets
    # covered — the stop condition is per-tile (max over pixels)
    s2 = rng.uniform(0.01, 0.04, N).astype(np.float32)
    conics = jnp.asarray(np.stack([s2, np.zeros(N, np.float32), s2], -1))
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.7, 0.95, (N,)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 10, N).astype(np.float32))
    radii = jnp.full((N,), 10.0)

    def render_loss(cfg, args):
        xys, colors, opac = args
        img, alpha, _ = rasterize_gaussians_blend(
            xys, depths, radii, conics, colors, opac, H, W, config=cfg)
        return jnp.sum(img ** 2) + 0.3 * jnp.sum(alpha ** 2), img

    args = (xys, colors, opac)
    (l_on, img_on), g_on = jax.value_and_grad(
        lambda a: render_loss(BlendConfig(early_stop_T=1e-4), a),
        has_aux=True)(args)
    (l_off, img_off), g_off = jax.value_and_grad(
        lambda a: render_loss(BlendConfig(early_stop_T=0.0), a),
        has_aux=True)(args)
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               atol=2e-3)
    for a, b, name in zip(g_on, g_off, ("xys", "colors", "opac")):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-3,
                                   err_msg=name)

    _, img_hard = render_loss(BlendConfig(early_stop_T=0.9), args)
    assert float(jnp.abs(img_hard - img_off).max()) > 0.01


def test_render_fast_fused_matches_render():
    """The fused 3DGS prep (ops/splat_prep3d.py) must reproduce render()
    within the fused-prep boundary-ulp envelope; with the flag off,
    render_fast IS render."""
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.utils.image_io import synthetic_image

    H, W, N = 64, 96, 384
    gt = jnp.asarray(synthetic_image(H, W, seed=11))
    m_off = make_model("3DGS", num_points=N, H=H, W=W, loss_type="Fusion2")
    st = m_off.init_state(jax.random.PRNGKey(5))
    st, _ = m_off.train_chunk(st, gt, None, jnp.asarray(1), 30)
    ref = np.asarray(m_off.render(st.params)["render"])
    np.testing.assert_array_equal(
        np.asarray(m_off.render_fast(st.params)), ref)

    m_on = make_model("3DGS", num_points=N, H=H, W=W, loss_type="Fusion2",
                      raster=RasterizeConfig(fused_prep=True))
    fast = np.asarray(m_on.render_fast(st.params))
    assert fast.shape == ref.shape
    err = np.abs(fast - ref)
    # compositing makes boundary flips slightly wider than the sum path's;
    # the envelope stays isolated-pixel-sized
    assert err.max() < 5e-4, err.max()
    assert (err > 5e-5).mean() < 1e-3


def test_render_fast_fused_sh0():
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig

    H, W, N = 64, 96, 256
    m_off = make_model("3DGS", num_points=N, H=H, W=W, loss_type="Fusion2",
                       sh_degree=0)
    st = m_off.init_state(jax.random.PRNGKey(6))
    ref = np.asarray(m_off.render(st.params)["render"])
    m_on = make_model("3DGS", num_points=N, H=H, W=W, loss_type="Fusion2",
                      sh_degree=0, raster=RasterizeConfig(fused_prep=True))
    fast = np.asarray(m_on.render_fast(st.params))
    err = np.abs(fast - ref)
    assert err.max() < 5e-4, err.max()
