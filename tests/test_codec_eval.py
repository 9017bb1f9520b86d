"""Codec-eval CLI surface (test_quantize.py): single-image eval writes the
full metric schema including the entropy-coded decode timing, and the
whole-dataset batched decode probe agrees with per-frame decodes."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_tpu.test_quantize import (CodecEvaluator2d,
                                             batched_dataset_decode_fps)
from gaussianimage_tpu.utils.image_io import synthetic_image


def _evaluator(tmp_path, seed, name):
    img = synthetic_image(32, 64, seed=seed)
    ev = CodecEvaluator2d(img, name, num_points=128,
                          log_dir=tmp_path / name)
    # warm-start the quantizer ranges/codebooks as the two-stage contract
    # does (otherwise codes are degenerate and the probe is unrealistic)
    ev.state = ev.model.init_quantizer_data(ev.state)
    return ev


def test_eval_schema_includes_ec_timing(tmp_path):
    ev = _evaluator(tmp_path, 0, "a")
    d = ev.test()
    for key in ("psnr", "ms-ssim", "bpp", "rendering_fps",
                "rendering_fps_ec", "rendering_time_ec", "bpp_ec",
                "ec_roundtrip_err", "position_bpp", "cholesky_bpp",
                "feature_dc_bpp"):
        assert key in d, key
    assert d["rendering_fps_ec"] > 0
    # EC round trip reproduces the w/o-EC decode (codes are lossless; the
    # residual is jit-vs-eager fusion-order float noise)
    assert d["ec_roundtrip_err"] < 1e-6
    assert (tmp_path / "a" / "test.npy").exists()


def test_batched_dataset_decode_matches_per_frame(tmp_path):
    evs = [_evaluator(tmp_path, i, f"im{i}") for i in range(3)]
    for ev in evs:
        ev.test()
    b, fps, strategy = batched_dataset_decode_fps(evs, reps=1)
    assert b == 3 and fps is not None and fps > 0
    assert strategy in ("batched", "scan")

    # the batched pass must render the same frames as per-frame decodes
    from gaussianimage_tpu.batched import decompress_wo_ec_batch
    model = evs[0].model
    params_b = jax.tree.map(lambda *x: jnp.stack(x),
                            *[ev.state.params for ev in evs])
    extra_b = jax.tree.map(lambda *x: jnp.stack(x),
                           *[ev.state.extra for ev in evs])
    enc_b = {k: jnp.asarray(np.stack([np.asarray(ev.enc[k]) for ev in evs]))
             for k in evs[0].enc}
    batch = decompress_wo_ec_batch(model, params_b, extra_b, enc_b)["render"]
    for i, ev in enumerate(evs):
        single = model.decompress_wo_ec(
            ev.state.params, ev.state.extra,
            {k: jnp.asarray(v) for k, v in ev.enc.items()})["render"]
        np.testing.assert_allclose(np.asarray(batch[i]),
                                   np.asarray(single[0]), atol=1e-5)
