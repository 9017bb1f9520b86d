"""Mid-fit checkpoint/resume (SURVEY §5 failure-detection row) + wMask
sparsity observability (reference train.py:153-161).

The kill-and-resume contract: a fit interrupted after a snapshot and resumed
from it must reproduce the uninterrupted fit's final metrics — the snapshot
carries params, optimizer moments, extra state, the PRNG carry key, and the
metric history.
"""

import json
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.train import SimpleTrainer2d
from gaussianimage_tpu.utils.checkpoint import (load_train_state,
                                                save_train_state)
from gaussianimage_tpu.utils.image_io import synthetic_image


def _args(**kw):
    base = dict(shape_bucket=0, save_imgs=False, profile=None, lr=1e-3,
                opt_type="adan", seed=1, viz_every=0, log_every=0,
                ckpt_every=0, resume=False)
    base.update(kw)
    return SimpleNamespace(**base)


def test_kill_and_resume_reproduces_final_psnr(tmp_path):
    img = synthetic_image(48, 64, seed=2)

    # uninterrupted 300-iter fit, snapshotting every 100 iters: the last
    # mid-fit snapshot is taken at iteration 200
    tr_a = SimpleTrainer2d(img, "a", num_points=256, iterations=300,
                           args=_args(ckpt_every=100), log_dir=tmp_path / "a",
                           chunk_size=100)
    tr_a.train()
    psnr_a, _, _ = tr_a.test()
    assert (tmp_path / "a" / "resume.npz").exists()

    # "crash after iteration 200": a fresh trainer resumes from the snapshot
    # and replays only the final chunk — it must land on the same fit
    tr_b = SimpleTrainer2d(img, "a", num_points=256, iterations=300,
                           args=_args(ckpt_every=100, resume=True),
                           log_dir=tmp_path / "a", chunk_size=100)
    assert tr_b.start_iter == 200
    tr_b.train()
    psnr_b, _, _ = tr_b.test()
    assert abs(psnr_a - psnr_b) < 1e-3, (psnr_a, psnr_b)

    # the resumed run's history covers all 300 iterations, not just 100
    rec = np.load(tmp_path / "a" / "training.npy", allow_pickle=True).item()
    assert len(rec["iterations"]) == 300
    assert rec["iterations"][0] == 1 and rec["iterations"][-1] == 300


def test_resume_without_snapshot_starts_fresh(tmp_path):
    img = synthetic_image(32, 48, seed=0)
    tr = SimpleTrainer2d(img, "x", num_points=128, iterations=100,
                         args=_args(resume=True), log_dir=tmp_path / "x",
                         chunk_size=50)
    assert tr.start_iter == 0


def test_train_state_roundtrip_preserves_opt_state():
    from gaussianimage_tpu.models import make_model
    import tempfile, os

    m = make_model("GaussianImage_Cholesky", num_points=64, H=16, W=16)
    state = m.init_state(jax.random.PRNGKey(0))
    gt = jnp.asarray(synthetic_image(16, 16, seed=0))
    state, _ = m.train_chunk(state, gt, None, jnp.asarray(1), 5)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.npz")
        save_train_state(p, state, 5, {"key": np.arange(2, dtype=np.uint32)})
        template = m.init_state(jax.random.PRNGKey(3))
        loaded, it, aux = load_train_state(p, template)
        assert it == 5 and aux["key"].tolist() == [0, 1]
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_wmask_sparsity_scalars_logged(tmp_path):
    img = synthetic_image(32, 48, seed=1)
    args = _args(log_every=20, start_mask_training=0, stop_mask_training=80,
                 reg_type="kl", target_sparsity=0.6, lambda_reg=0.01,
                 init_mask_logit=2.0, use_ema=False, use_score=False,
                 temp_init=0.5, temp_final=0.5)
    tr = SimpleTrainer2d(img, "m", num_points=128,
                         model_name="GaussianImage_Cholesky_wMask",
                         iterations=40, args=args, log_dir=tmp_path / "m",
                         chunk_size=20)
    tr.train()
    lines = [json.loads(l) for l in
             (tmp_path / "m" / "scalars.jsonl").read_text().splitlines()]
    assert lines, "no scalars logged"
    for rec in lines:
        assert {"sparsity_hard", "sparsity_soft",
                "num_points_active"} <= set(rec)
        assert 0.0 <= rec["sparsity_soft"] <= 1.0
        assert rec["num_points_active"] == int(128 * rec["sparsity_hard"])
