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
    state, metrics = model.train_chunk(
        state, gt, jax.random.PRNGKey(1), jnp.asarray(1), 150)
    return model, state, gt, np.asarray(metrics["psnr"])


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
    state, metrics = model.train_chunk(
        state, gt, jax.random.PRNGKey(1), jnp.asarray(1), 60)
    assert np.isfinite(np.asarray(metrics["psnr"])).all()
    m, s, r, c = model.measure_unit_bits(state.params, state.extra)
    assert s > 0 and r > 0 and c > 0
    enc = model.compress(state.params, state.extra)
    out = model.decompress(state.params, state.extra, enc)["render"]
    assert out.shape == (1, 3, H, W)
    assert bool(jnp.isfinite(out).all())
    # per-component covariance bpp keys (reference RS analysis reports
    # scaling_bpp / rotation_bpp, gaussianimage_rs.py:186-192,265-273)
    for analysis in (model.analysis_wo_ec(state.params, state.extra, enc),
                     model.analysis(state.params, state.extra, enc)):
        assert analysis["scaling_bpp"] > 0
        assert analysis["rotation_bpp"] > 0
        assert abs(analysis["scaling_bpp"] + analysis["rotation_bpp"]
                   - analysis["cholesky_bpp"]) < 1e-9


def test_quantizer_warm_start_ranges(qat_setup):
    model, state, gt, _ = qat_setup
    st2 = model.init_quantizer_data(state)
    chol = np.asarray(state.params["_cholesky"])
    scale = np.asarray(st2.params["cholesky_quant_scale"])
    beta = np.asarray(st2.params["cholesky_quant_beta"])
    np.testing.assert_allclose(beta, chol.min(axis=0), rtol=1e-5)
    np.testing.assert_allclose(scale, (chol.max(0) - chol.min(0)) / 63,
                               rtol=1e-5)


def test_overflow_surfaces_in_chunk_metrics():
    # VERDICT r1 #5: a deliberately under-capacitated fit must report
    # instance-stream overflow within one training chunk, not at final test
    H, W, N = 32, 48, 256
    tiny = RasterizeConfig(max_instances=64)  # far below demand
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       raster=tiny)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    state = model.init_state(jax.random.PRNGKey(0))
    state, metrics = model.train_chunk(state, gt, None, jnp.asarray(1), 5)
    assert int(np.asarray(metrics["n_dropped_max"])) > 0


def test_trainer_warns_on_overflow(tmp_path):
    from types import SimpleNamespace
    from gaussianimage_tpu.train import SimpleTrainer2d

    img = np.asarray(synthetic_image(32, 48, seed=0))
    args = SimpleNamespace(save_imgs=False, profile=None, lr=1e-3,
                           opt_type="adan", seed=1, viz_every=0, log_every=0)
    tr = SimpleTrainer2d(img, "tiny", num_points=256, iterations=20,
                         args=args, log_dir=tmp_path, chunk_size=10)
    tr.model = make_model("GaussianImage_Cholesky", num_points=256, H=32,
                          W=48, raster=RasterizeConfig(max_instances=64))
    tr._chunk_fn = jax.jit(
        lambda st, gt, key, start: tr.model.train_chunk(
            st, gt, key, start, tr.chunk_size), donate_argnums=(0,))
    tr.state = tr.model.init_state(jax.random.PRNGKey(1))
    tr.train()
    log = (tmp_path / "train.txt").read_text()
    assert "WARNING" in log and "dropped" in log


def test_mask_prune_qat_compress_roundtrip():
    # VERDICT r1 #6: mask -> prune -> QAT -> compress must respect the mask
    from gaussianimage_tpu.models.base import MaskConfig

    H, W, N = 32, 48, 192
    mask_cfg = MaskConfig(start_mask_training=0, stop_mask_training=10,
                          reg_type="l1", lambda_reg=0.05)
    m = make_model("GaussianImage_Cholesky_wMask", num_points=N, H=H, W=W,
                   quantize=True, mask=mask_cfg, raster=RASTER)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    state = m.init_state(jax.random.PRNGKey(0))
    # force a mixed mask so the fold actually matters
    logits = np.full((N, 1), 10.0, np.float32)
    logits[::3] = -10.0
    params = dict(state.params)
    params["_mask_logits"] = jnp.asarray(logits)
    state = state._replace(params=params)
    state = m.init_quantizer_data(state)
    state, _ = m.train_chunk(state, gt, jax.random.PRNGKey(1),
                             jnp.asarray(50), 30)  # past stop: det phase

    # (a) unpruned: decode must use the deterministic mask as opacity
    enc = m.compress_wo_ec(state.params, state.extra)
    dec = m.decompress_wo_ec(state.params, state.extra, enc)["render"]
    qr = m.render_quantize(state.params, extra=state.extra,
                           training=False)["render"]
    np.testing.assert_allclose(np.asarray(dec), np.asarray(qr),
                               atol=1e-5, rtol=1e-5)
    # masked-off gaussians must not contribute: all-off mask decodes black
    params_off = dict(state.params)
    params_off["_mask_logits"] = jnp.full((N, 1), -10.0)
    dec_off = m.decompress_wo_ec(params_off, state.extra, enc)["render"]
    assert float(jnp.abs(dec_off).max()) == 0.0

    # (b) pruned: prune -> fresh QAT-sized model -> compress round-trips
    pruned = m.prune_points(state, threshold=0.5)
    n2 = int(pruned.params["_xyz"].shape[0])
    assert 0 < n2 < N
    m2 = make_model("GaussianImage_Cholesky_wMask", num_points=n2, H=H, W=W,
                    quantize=True, mask=mask_cfg, raster=RASTER)
    st2 = m2.init_state(jax.random.PRNGKey(2))
    p2 = dict(st2.params)
    for k, v in pruned.params.items():
        p2[k] = v
    st2 = m2.init_quantizer_data(st2._replace(params=p2))
    enc2 = m2.compress(st2.params, st2.extra)
    out2 = m2.decompress(st2.params, st2.extra, enc2)["render"]
    assert np.isfinite(np.asarray(out2)).all()


def test_serving_config_decode_matches_default(qat_setup):
    """RasterizeConfig.serving (tight 3N stream + fused prep) must decode
    the SAME image as the default config — the cap only shrinks the sort
    and window-bounds glue; any overflow must surface in raster_aux."""
    model, state, gt, _ = qat_setup
    cfg = model.cfg
    enc = model.compress_wo_ec(state.params, state.extra)
    ref = model.decompress_wo_ec(state.params, state.extra, enc)
    m_s = make_model("GaussianImage_Cholesky", num_points=cfg.num_points,
                     H=cfg.H, W=cfg.W, quantize=True,
                     raster=RasterizeConfig.serving(cfg.num_points))
    out = m_s.decompress_wo_ec(state.params, state.extra, enc)
    assert int(np.asarray(out["raster_aux"]["n_dropped"])) == 0
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]),
                               rtol=2e-5, atol=2e-5)
