"""Driver benchmark: render FPS on the flagship config (768x512 image,
10k Gaussians, GaussianImage-Cholesky — the reference's headline setting,
BASELINE.md: 1500-2000 FPS on a V100). Prints ONE JSON line.

Fits the image briefly first so the measured scene has realistic Gaussian
statistics (spread + scales affect tile occupancy, hence FPS).

Timing methodology for the axon TPU runtime (see memory/verify notes):
- `block_until_ready` returns before the remote queue drains, so a plain
  dispatch loop measures enqueue rate (absurdly fast). The honest recipe is
  to enqueue N iterations and force ONE device->host readback of the last
  result: the in-order queue must drain, so wall time = N * device time.
- That first readback permanently degrades dispatch to sync mode, so it is
  also the fence between measurements: everything timed afterwards
  (training chunk) pays a fixed ~0.5 ms/call dispatch cost that a 500-step
  on-device scan amortizes away.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.utils.image_io import synthetic_image

    H, W, N = 512, 768, 10000
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    state = model.init_state(jax.random.PRNGKey(1))

    # short fit so the measured scene is realistic (spread fitted gaussians);
    # NO readbacks yet — results stay on device
    chunk = jax.jit(
        lambda st, g, s: model.train_chunk(st, g, None, s, 500),
        donate_argnums=(0,))
    it = 0
    psnrs = None
    for _ in range(4):
        state, losses, psnrs = chunk(state, gt, jnp.asarray(it + 1))
        it += 500
    jax.block_until_ready(state.params)

    render = jax.jit(lambda p: model.render(p)["render"])
    img = render(state.params)
    img.block_until_ready()
    # switch the runtime to synchronous dispatch NOW (first readback does
    # it irreversibly); afterwards every call's wall time is its true
    # latency. Enqueue-then-drain of a deep queue triggers a ~130 ms/call
    # journal replay on this runtime, so a plain sync loop is the honest
    # and cheapest methodology.
    _ = np.asarray(img)

    reps = 200
    img = render(state.params)
    img.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        img = render(state.params)
    img.block_until_ready()
    dt = (time.time() - t0) / reps
    fps = 1.0 / dt

    psnr_fit = float(np.asarray(psnrs)[-1])  # read BEFORE the extra chunks

    # training throughput: one dispatch per 500-step on-device scan
    state, losses, psnrs = chunk(state, gt, jnp.asarray(it + 1))
    _ = np.asarray(losses[-1])
    t0 = time.time()
    state, losses, psnrs = chunk(state, gt, jnp.asarray(it + 501))
    _ = np.asarray(losses[-1])
    fit_iters_per_s = 500 / (time.time() - t0)

    # decode throughput: quantize the fitted scene on the fly and time the
    # codec decode path (dequantize + project + rasterize), the reference's
    # "~2000 FPS" headline (README.md:30)
    qmodel = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                        quantize=True)
    qstate = qmodel.init_state(jax.random.PRNGKey(2))
    qparams = dict(qstate.params)
    for k, v in state.params.items():
        qparams[k] = v
    qstate = qstate._replace(params=qparams)
    qstate = qmodel.init_quantizer_data(qstate)
    qchunk = jax.jit(lambda st, g, s: qmodel.train_chunk(st, g, None, s, 200),
                     donate_argnums=(0,))
    qstate, _, _ = qchunk(qstate, gt, jnp.asarray(1))
    enc = jax.device_put(qmodel.compress_wo_ec(qstate.params, qstate.extra))
    dec = jax.jit(lambda e: qmodel.decompress_wo_ec(
        qstate.params, qstate.extra, e)["render"])
    out = dec(enc)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(200):
        out = dec(enc)
    out.block_until_ready()
    decode_ms = (time.time() - t0) / 200 * 1e3

    baseline_fps = 2000.0  # reference README headline (V100)
    print(json.dumps({
        "metric": "render_fps_768x512_10k_gaussians",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 3),
        "extra": {"fit_psnr_at_2k_iters": round(psnr_fit, 2),
                  "ms_per_frame": round(dt * 1e3, 3),
                  "fit_iters_per_s": round(fit_iters_per_s, 1),
                  "decode_fps": round(1e3 / decode_ms, 1),
                  "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
