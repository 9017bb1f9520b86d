"""Error-driven relocation (core/reseed.py): mechanics, trainer wiring and
the resume-replay contract."""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.core.reseed import default_schedule, reseed_state
from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.train import SimpleTrainer2d
from gaussianimage_tpu.utils.image_io import synthetic_image


def _fit_a_bit(m, gt, chunks=2, n=200):
    st = m.init_state(jax.random.PRNGKey(1), gt_image=gt)
    chunk = jax.jit(lambda s, g, i: m.train_chunk(s, g, None, i, n),
                    donate_argnums=(0,))
    for c in range(chunks):
        st, _ = chunk(st, gt, jnp.asarray(c * n + 1))
    return st


def test_default_schedule_fractions():
    assert default_schedule(50000) == (2500, 5000, 10000, 15000, 20000,
                                       30000)
    assert default_schedule(50000, rounds=3) == (2500, 5000, 10000)
    assert default_schedule(300) == ()    # short fits: no reseeding
    assert default_schedule(4999) == ()


def test_reseed_relocates_lowest_importance_rows():
    H, W, N = 48, 64, 256
    gt = jnp.asarray(synthetic_image(H, W, seed=3))
    m = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                   init_mode="adaptive")
    st = _fit_a_bit(m, gt)
    frac = 0.1
    k = int(N * frac)
    score = np.asarray(m.importance(st.params))
    victims = np.argsort(score)[:k]

    st2 = reseed_state(m, st, gt, jax.random.PRNGKey(5), frac=frac)

    old_p, new_p = st.params, st2.params
    moved = np.where(np.any(np.asarray(old_p["_xyz"])
                            != np.asarray(new_p["_xyz"]), axis=1))[0]
    assert set(moved) <= set(victims.tolist())
    keep = np.setdiff1d(np.arange(N), victims)
    for key in ("_xyz", "_cholesky", "_features_dc"):
        np.testing.assert_array_equal(np.asarray(old_p[key])[keep],
                                      np.asarray(new_p[key])[keep])
    # victims got isotropic sigma-1.5 covariance rows
    chol = np.asarray(new_p["_cholesky"])[victims] + np.asarray(
        [0.5, 0.0, 0.5])
    np.testing.assert_allclose(chol[:, 0], 1.5, atol=1e-6)
    np.testing.assert_allclose(chol[:, 1], 0.0, atol=1e-6)
    # victims' optimizer moment rows were zeroed, survivors' kept
    zeroed = kept_nonzero = False
    for leaf in jax.tree.leaves(st2.opt_state):
        a = np.asarray(leaf)
        if a.ndim >= 1 and a.shape[0] == N:
            zeroed |= bool((a[victims] == 0).all())
            kept_nonzero |= bool((a[keep] != 0).any())
    assert zeroed and kept_nonzero


def test_reseed_targets_high_error_regions():
    """All-gray init vs a half black / half white image: relocated points
    must land where the residual is large (everywhere equally) — weaker
    scenes: a flat region rendered perfectly attracts no reseeds."""
    H, W, N = 32, 64, 128
    gt_np = np.full((1, 3, H, W), 0.5, np.float32)
    gt_np[..., :, W // 2:] = 1.0  # right half wrong after gray-ish fit
    gt = jnp.asarray(gt_np)
    m = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                   init_mode="adaptive")
    st = _fit_a_bit(m, gt, chunks=3)
    # make the LEFT half exact: error only on the right
    render = np.asarray(jnp.clip(m.render(st.params)["render"], 0, 1))
    err = ((render - gt_np) ** 2).sum(axis=(0, 1))
    if err[:, : W // 2].sum() > err[:, W // 2:].sum():
        return  # fit landed opposite; sampling claim untestable, skip
    st2 = reseed_state(m, st, gt, jax.random.PRNGKey(2), frac=0.2)
    moved = np.where(np.any(np.asarray(st.params["_xyz"])
                            != np.asarray(st2.params["_xyz"]), axis=1))[0]
    pos = np.tanh(np.asarray(st2.params["_xyz"])[moved])
    frac_right = (pos[:, 0] > 0).mean()
    assert frac_right >= 0.5, frac_right


def test_reseed_improves_fit_and_is_resume_stable(tmp_path):
    """Trainer wiring: a fit with reseed rounds completes, and kill+resume
    across a round boundary reproduces the uninterrupted result."""
    img = synthetic_image(48, 64, seed=7)

    def args(**kw):
        base = dict(shape_bucket=0, save_imgs=False, profile=None, lr=1e-3,
                    opt_type="adan", seed=1, viz_every=0, log_every=0,
                    ckpt_every=0, resume=False,
                    reseed_rounds=2, reseed_frac=0.1)
        base.update(kw)
        return SimpleNamespace(**base)

    # schedule (2000, 4000) is beyond a 600-iter fit; shrink via monkey
    # schedule: rounds fire at 200/400 with iterations=1200 (0.4*1200=480
    # allows 200 only) -> use iterations high enough for two rounds
    tr = SimpleTrainer2d(img, "r", num_points=192, iterations=600,
                         args=args(), log_dir=tmp_path / "r",
                         chunk_size=100)
    tr._reseed_iters = (100, 300)
    tr.train()
    psnr, _, _ = tr.test()
    assert np.isfinite(psnr) and psnr > 10

    # uninterrupted vs resumed-across-the-round: snapshot at 200, rounds at
    # 100 and 300 -> the 300 round must replay identically after resume
    tr_a = SimpleTrainer2d(img, "s", num_points=192, iterations=400,
                           args=args(ckpt_every=200),
                           log_dir=tmp_path / "s", chunk_size=100)
    tr_a._reseed_iters = (100, 300)
    tr_a.train()
    psnr_a, _, _ = tr_a.test()

    tr_b = SimpleTrainer2d(img, "s", num_points=192, iterations=400,
                           args=args(ckpt_every=200, resume=True),
                           log_dir=tmp_path / "s", chunk_size=100)
    tr_b._reseed_iters = (100, 300)
    assert tr_b.start_iter == 200
    tr_b.train()
    psnr_b, _, _ = tr_b.test()
    assert abs(psnr_a - psnr_b) < 1e-3, (psnr_a, psnr_b)


def test_no_reseed_flag_disables(tmp_path):
    img = synthetic_image(32, 48, seed=1)
    a = SimpleNamespace(shape_bucket=0, save_imgs=False, profile=None,
                        lr=1e-3, opt_type="adan", seed=1, viz_every=0,
                        log_every=0, ckpt_every=0, resume=False,
                        no_reseed=True)
    tr = SimpleTrainer2d(img, "n", num_points=64, iterations=100, args=a,
                         chunk_size=50, log_dir=tmp_path / "n")
    assert tr._reseed_iters == ()
