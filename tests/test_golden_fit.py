"""Golden-metric integration test (SURVEY.md §4): a fixed-seed fit of the
flagship model on a synthetic image must reach an absolute PSNR. Guards the
whole pipeline (projection -> binning -> Pallas kernels -> analytic VJP ->
Adan -> schedule) against silent quality regressions."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.utils.image_io import synthetic_image


def test_flagship_fit_reaches_golden_psnr():
    H, W, N = 64, 96, 768
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    state = model.init_state(jax.random.PRNGKey(1))
    chunk = jax.jit(lambda st, s: model.train_chunk(st, gt, None, s, 250))
    it = 0
    psnrs = None
    for _ in range(4):
        state, metrics = chunk(state, jnp.asarray(it + 1))
        psnrs = metrics["psnr"]
        it += 250
    final = float(np.asarray(psnrs)[-1])
    # calibrated: 30.88 dB on CPU f32 at 1000 iters (re-measured r2; the
    # r1 "~34 dB" note was wrong) — a 0.5 dB band catches real regressions
    assert final > 30.4, f"golden PSNR regression: {final:.2f} dB"


def test_rs_fit_improves_matching_cholesky_ballpark():
    H, W, N = 64, 96, 768
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    finals = {}
    for name in ("GaussianImage_Cholesky", "GaussianImage_RS"):
        model = make_model(name, num_points=N, H=H, W=W)
        state = model.init_state(jax.random.PRNGKey(1))
        chunk = jax.jit(lambda st, s, m=model: m.train_chunk(st, gt, None, s, 250))
        metrics = None
        it = 0
        for _ in range(2):
            state, metrics = chunk(state, jnp.asarray(it + 1))
            it += 250
        finals[name] = float(np.asarray(metrics["psnr"])[-1])
    # the two covariance parameterizations represent the same family
    assert abs(finals["GaussianImage_Cholesky"] - finals["GaussianImage_RS"]) < 6.0, finals
    assert min(finals.values()) > 22.0, finals


def test_shape_bucketing_pads_and_crops(tmp_path):
    # non-multiple image size + --shape_bucket: the fit runs at the padded
    # shape, metrics/artifacts use the original crop
    from types import SimpleNamespace
    from gaussianimage_tpu.train import SimpleTrainer2d

    img = synthetic_image(50, 70, seed=3)  # [1, 3, 50, 70]
    args = SimpleNamespace(shape_bucket=64, save_imgs=False, profile=None,
                           lr=1e-3, opt_type="adan", seed=1, viz_every=0,
                           log_every=0)
    tr = SimpleTrainer2d(img, "tiny", num_points=256, iterations=600,
                         args=args, log_dir=tmp_path, chunk_size=100)
    assert (tr.H, tr.W) == (64, 128)       # padded model shape
    assert (tr.crop_h, tr.crop_w) == (50, 70)
    tr.train()
    psnr, msv, n = tr.test()
    # calibrated: 12.2 dB at 600 iters (slow-start config, still climbing);
    # a broken padded-fit path stays at the ~6 dB init, so 11 dB is a real
    # floor where the old >5 dB never was
    assert np.isfinite(psnr) and psnr > 11.0, psnr
