"""Measure the decode stream's REAL occupancy on the committed serving
artifact (china@10k two-stage checkpoint): n_total (live instances),
truncation at several per-gaussian span caps, and max per-tile count.

The auto instance cap (stream_common.auto_max_instances) provisions
I0=40960 at N=10k and m_span=12 (keys array 120k) — if the artifact's real
stream is ~25k, a serving config with a measured cap shrinks the sort,
bounds compare-reduce, and gather proportionally with ZERO output change
(identical instance set as long as nothing truncates or overflows).

Run: python scripts/probe_occupancy.py   (TPU or CPU; readbacks are fine —
this is a measurement of sizes, not a timing run)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pathlib import Path

    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.ops import stream_common as sc
    from gaussianimage_tpu.ops.splat_prep import fused_prep_cholesky
    from gaussianimage_tpu.models.cholesky import CHOLESKY_BOUND
    from gaussianimage_tpu.utils.checkpoint import (load_checkpoint,
                                                    merge_matching)

    H, W, N = 512, 768, 10000
    qmodel = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                        quantize=True)
    qstate = qmodel.init_state(jax.random.PRNGKey(2))
    ckpt_path = Path("results_quant/photos/GaussianImage_Cholesky_50000_10000"
                     "/china/gaussian_model.best.npz")
    ckpt = load_checkpoint(ckpt_path)
    qparams = merge_matching(qstate.params, ckpt["params"])
    extra = dict(qstate.extra)
    extra["vq"] = extra["vq"]._replace(**{
        k.split("/", 1)[1]: jnp.asarray(v)
        for k, v in ckpt["extra"].items() if k.startswith("vq/")})
    qstate = qstate._replace(params=qparams, extra=extra)
    enc = qmodel.compress_wo_ec(qstate.params, qstate.extra)

    embed = qstate.extra["vq"].embed
    combined = (embed[0][:, None, :] + embed[1][None, :, :]
                ).reshape(-1, embed.shape[-1])

    for m_span in (25, 16, 12, 10, 8, 6):
        cfg = RasterizeConfig(fused_prep=True)
        I0, auto_span, aligned = sc.stream_caps(N, cfg)
        feat, keys, trunc, n_total = fused_prep_cholesky(
            jnp.asarray(enc["xyz"], jnp.float32),
            jnp.asarray(enc["quant_cholesky"]),
            qstate.params["cholesky_quant_scale"],
            qstate.params["cholesky_quant_beta"],
            CHOLESKY_BOUND, jnp.asarray(enc["feature_dc_index"]),
            combined, H, W, cfg, m_span)
        live = int(np.sum(np.asarray(keys) != np.int32(2 ** 31 - 1)))
        print(f"m_span={m_span:3d}: keys_len={keys.shape[0]:7d} "
              f"live={live:6d} n_total={int(n_total):6d} "
              f"trunc={int(trunc):5d} (auto I0={I0}, auto span={auto_span})")

    # per-tile max (kernel inner-loop depth) at the auto config
    cfg = RasterizeConfig(fused_prep=True)
    out = qmodel.decompress_wo_ec(qstate.params, qstate.extra,
                                  jax.device_put(enc))
    img = np.asarray(out["render"])
    print("render checksum:", float(img.sum()), "shape:", img.shape)


if __name__ == "__main__":
    main()
