"""End-to-end QAT + codec tests: training improves PSNR, compress/decompress
round-trips (with and without entropy coding), bpp accounting sane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.ops import RasterizeConfig
from gaussianimage_tpu.utils.image_io import synthetic_image

RASTER = RasterizeConfig()


@pytest.fixture(scope="module")
def qat_setup():
    H, W, N = 32, 48, 256
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       quantize=True, raster=RASTER)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    state = model.init_state(jax.random.PRNGKey(0))
    state = model.init_quantizer_data(state)
    state, losses, psnrs = model.train_chunk(
        state, gt, jax.random.PRNGKey(1), jnp.asarray(1), 150)
    return model, state, gt, np.asarray(psnrs)


def test_qat_training_improves(qat_setup):
    model, state, gt, psnrs = qat_setup
    assert np.isfinite(psnrs).all()
    assert psnrs[-1] > psnrs[0] + 1.0
    assert bool(state.extra["vq"].initted)


def test_compress_decompress_wo_ec_matches_eval_render(qat_setup):
    model, state, gt, _ = qat_setup
    enc = model.compress_wo_ec(state.params, state.extra)
    out = model.decompress_wo_ec(state.params, state.extra, enc)["render"]
    ref = model.render_quantize(state.params, extra=state.extra,
                                training=False)["render"]
    # xyz goes through fp16 in both paths; VQ/uniform dequant identical
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_entropy_coded_roundtrip_exact(qat_setup):
    model, state, gt, _ = qat_setup
    enc = model.compress(state.params, state.extra)
    out_ec = model.decompress(state.params, state.extra, enc)["render"]
    out = model.decompress_wo_ec(state.params, state.extra, enc)["render"]
    np.testing.assert_array_equal(np.asarray(out_ec), np.asarray(out))


def test_bit_accounting(qat_setup):
    model, state, gt, _ = qat_setup
    m, s, r, c = model.measure_unit_bits(state.params, state.extra)
    N = 256
    assert m == 16 * N * 2
    assert s > 0 and r == 0 and c > 0
    enc = model.compress_wo_ec(state.params, state.extra)
    d = model.analysis_wo_ec(state.params, state.extra, enc)
    assert d["bpp"] > 0
    assert abs(d["bpp"] - (d["position_bpp"] + d["cholesky_bpp"]
                           + d["feature_dc_bpp"])) < 1e-9
    d_ec = model.analysis(state.params, state.extra, enc)
    assert 0 < d_ec["bpp"]
    # entropy coding adds histogram side info (dominant at this tiny N) but
    # must stay within payload + side-info bounds
    side_info_bpp = (64 * (2 + 1) * 8) / (32 * 48)  # counts+unique worst case
    assert d_ec["cholesky_bpp"] < d["cholesky_bpp"] + side_info_bpp + 0.1


def test_rs_qat_smoke():
    H, W, N = 32, 48, 128
    model = make_model("GaussianImage_RS", num_points=N, H=H, W=W,
                       quantize=True, raster=RASTER)
    gt = jnp.asarray(synthetic_image(H, W, seed=1))
    state = model.init_state(jax.random.PRNGKey(0))
    state = model.init_quantizer_data(state)
    state, losses, psnrs = model.train_chunk(
        state, gt, jax.random.PRNGKey(1), jnp.asarray(1), 60)
    assert np.isfinite(np.asarray(psnrs)).all()
    m, s, r, c = model.measure_unit_bits(state.params, state.extra)
    assert s > 0 and r > 0 and c > 0
    enc = model.compress(state.params, state.extra)
    out = model.decompress(state.params, state.extra, enc)["render"]
    assert out.shape == (1, 3, H, W)
    assert bool(jnp.isfinite(out).all())


def test_quantizer_warm_start_ranges(qat_setup):
    model, state, gt, _ = qat_setup
    st2 = model.init_quantizer_data(state)
    chol = np.asarray(state.params["_cholesky"])
    scale = np.asarray(st2.params["cholesky_quant_scale"])
    beta = np.asarray(st2.params["cholesky_quant_beta"])
    np.testing.assert_allclose(beta, chol.min(axis=0), rtol=1e-5)
    np.testing.assert_allclose(scale, (chol.max(0) - chol.min(0)) / 63,
                               rtol=1e-5)
