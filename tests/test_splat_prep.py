"""Fused decode prep (ops/splat_prep.py): the one-pass dequantize +
projection + packing + binning-key kernel must reproduce the generic
decode path (QuantizeMixin.decompress_wo_ec) exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.ops import RasterizeConfig
from gaussianimage_tpu.utils.image_io import synthetic_image


def _quantized_state(H=64, W=96, N=512, model_name="GaussianImage_Cholesky",
                     **raster_kw):
    model = make_model(model_name, num_points=N, H=H, W=W,
                       quantize=True,
                       raster=RasterizeConfig(**raster_kw))
    gt = jnp.asarray(synthetic_image(H, W, seed=3))
    st = model.init_state(jax.random.PRNGKey(0))
    st = model.init_quantizer_data(st)
    # a few QAT steps so codes/codebooks are non-degenerate
    st, _ = model.train_chunk(st, gt, jax.random.PRNGKey(1),
                              jnp.asarray(1), 30)
    return model, st


def test_fused_decode_matches_generic():
    m_ref, st = _quantized_state()
    m_fused, _ = _quantized_state(fused_prep=True)
    enc = m_ref.compress_wo_ec(st.params, st.extra)
    enc_dev = {k: jnp.asarray(v) for k, v in enc.items()}

    ref = np.asarray(
        m_ref.decompress_wo_ec(st.params, st.extra, enc_dev)["render"])
    assert not m_ref.cfg.raster.fused_prep
    from gaussianimage_tpu.ops.splat_prep import fused_decode_supported
    assert fused_decode_supported(512, 64, 96, m_fused.cfg.raster)
    fused = np.asarray(
        m_fused.decompress_wo_ec(st.params, st.extra, enc_dev)["render"])
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=0)


import pytest


@pytest.mark.parametrize("cap,expect_drop", [(None, False), (256, True)])
def test_fused_decode_n_dropped_matches_generic(cap, expect_drop):
    """Accounting parity, incl. under a tight stream cap that forces
    truncation (cap=256 over ~512 gaussians' instances)."""
    from gaussianimage_tpu.models.cholesky import CHOLESKY_BOUND
    from gaussianimage_tpu.ops.splat_prep import (fused_decode_cholesky,
                                                  fused_decode_supported)
    from gaussianimage_tpu.ops import rasterize_gaussians_sum

    m_ref, st = _quantized_state()
    cfg = m_ref.cfg.raster._replace(fused_prep=True,
                                    max_instances=cap)
    assert fused_decode_supported(512, 64, 96, cfg)
    enc = m_ref.compress_wo_ec(st.params, st.extra)
    enc_dev = {k: jnp.asarray(v) for k, v in enc.items()}

    # generic path aux
    means, geo, colors = m_ref.dequantize_wo_ec(st.params, st.extra, enc_dev)
    xys, radii, conics, cols, opac = m_ref._quantized_splat(
        st.params, means, geo, colors)
    _, _, aux_ref = rasterize_gaussians_sum(
        xys, conics, cols, opac, 64, 96, radii=radii, config=cfg)

    embed = st.extra["vq"].embed
    combined = (embed[0][:, None, :] + embed[1][None, :, :]).reshape(-1, 3)
    _, _, aux = fused_decode_cholesky(
        jnp.asarray(enc["xyz"], jnp.float32),
        jnp.asarray(enc["quant_cholesky"]),
        st.params["cholesky_quant_scale"], st.params["cholesky_quant_beta"],
        CHOLESKY_BOUND, jnp.asarray(enc["feature_dc_index"]), combined,
        64, 96, cfg)
    assert int(aux["n_dropped"]) == int(aux_ref["n_dropped"])
    assert int(aux["max_per_tile_used"]) == int(aux_ref["max_per_tile_used"])
    if expect_drop:
        assert int(aux["n_dropped"]) > 0


def test_fused_decode_matches_generic_rs():
    m_ref, st = _quantized_state(model_name="GaussianImage_RS")
    m_fused, _ = _quantized_state(model_name="GaussianImage_RS",
                                  fused_prep=True)
    enc = m_ref.compress_wo_ec(st.params, st.extra)
    enc_dev = {k: jnp.asarray(v) for k, v in enc.items()}
    ref = np.asarray(
        m_ref.decompress_wo_ec(st.params, st.extra, enc_dev)["render"])
    fused = np.asarray(
        m_fused.decompress_wo_ec(st.params, st.extra, enc_dev)["render"])
    np.testing.assert_allclose(fused, ref, atol=2e-5, rtol=0)


def test_render_fast_matches_render_rs():
    H, W, N = 64, 96, 512
    gt = jnp.asarray(synthetic_image(H, W, seed=6))
    m_off = make_model("GaussianImage_RS", num_points=N, H=H, W=W)
    st = m_off.init_state(jax.random.PRNGKey(3), gt_image=gt)
    st, _ = m_off.train_chunk(st, gt, None, jnp.asarray(1), 50)
    ref = np.asarray(m_off.render(st.params)["render"])
    m_on = make_model("GaussianImage_RS", num_points=N, H=H, W=W,
                      raster=RasterizeConfig(fused_prep=True))
    fast = np.asarray(m_on.render_fast(st.params))
    np.testing.assert_allclose(fast, ref, atol=2e-5, rtol=0)


def test_render_fast_matches_render():
    """The raw-parameter fused prep must reproduce render() exactly; with
    the flag off, render_fast IS render."""
    H, W, N = 64, 96, 512
    gt = jnp.asarray(synthetic_image(H, W, seed=5))
    m_off = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    st = m_off.init_state(jax.random.PRNGKey(2), gt_image=gt)
    st, _ = m_off.train_chunk(st, gt, None, jnp.asarray(1), 50)
    ref = np.asarray(m_off.render(st.params)["render"])
    np.testing.assert_array_equal(
        np.asarray(m_off.render_fast(st.params)), ref)

    m_on = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                      raster=RasterizeConfig(fused_prep=True))
    fast = np.asarray(m_on.render_fast(st.params))
    np.testing.assert_allclose(fast, ref, atol=2e-5, rtol=0)


def test_wmask_opts_out_of_fused_prep():
    """wMask folds the learned mask into opacity; the fused prep kernel
    (opacity hardcoded 1) must never be picked for it even with the flag
    set."""
    from gaussianimage_tpu.models.base import MaskConfig
    m = make_model("GaussianImage_Cholesky_wMask", num_points=256, H=64,
                   W=96, quantize=True, mask=MaskConfig(),
                   raster=RasterizeConfig(fused_prep=True))
    assert m.fused_prep_ok is False
    gt = jnp.asarray(synthetic_image(64, 96, seed=7))
    st = m.init_state(jax.random.PRNGKey(0))
    st = m.init_quantizer_data(st)
    st, _ = m.train_chunk(st, gt, jax.random.PRNGKey(1), jnp.asarray(1), 20)
    enc = m.compress_wo_ec(st.params, st.extra)
    enc_dev = {k: jnp.asarray(v) for k, v in enc.items()}
    a = np.asarray(m.decompress_wo_ec(st.params, st.extra, enc_dev)["render"])
    m_off = make_model("GaussianImage_Cholesky_wMask", num_points=256, H=64,
                       W=96, quantize=True, mask=MaskConfig())
    b = np.asarray(
        m_off.decompress_wo_ec(st.params, st.extra, enc_dev)["render"])
    np.testing.assert_array_equal(a, b)


def test_render_fast_odd_image_size():
    """Non-tile-multiple H/W (DIV2K-style) through the fused path: the
    padded-tile crop must match the generic renderer."""
    H, W, N = 67, 101, 256
    gt = jnp.asarray(synthetic_image(H, W, seed=8))
    m_off = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    st = m_off.init_state(jax.random.PRNGKey(4), gt_image=gt)
    st, _ = m_off.train_chunk(st, gt, None, jnp.asarray(1), 40)
    ref = np.asarray(m_off.render(st.params)["render"])
    m_on = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                      raster=RasterizeConfig(fused_prep=True))
    fast = np.asarray(m_on.render_fast(st.params))
    assert fast.shape == (1, 3, H, W)
    np.testing.assert_allclose(fast, ref, atol=2e-5, rtol=0)


def test_fused_gate_rejects_aligned_and_wide_regimes():
    from gaussianimage_tpu.ops.splat_prep import fused_decode_supported
    cfg = RasterizeConfig(fused_prep=True)
    assert fused_decode_supported(10000, 512, 768, cfg)
    # aligned regime (instance budget over the flat-stream limit)
    assert not fused_decode_supported(
        10000, 512, 768, cfg._replace(flat_stream_limit=1000))
    # off by default
    assert not fused_decode_supported(10000, 512, 768, RasterizeConfig())
