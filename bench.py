"""Driver benchmark: render FPS on the flagship config (768x512 image,
10k Gaussians, GaussianImage-Cholesky — the reference's headline setting,
BASELINE.md: 1500-2000 FPS on a V100). Prints ONE JSON line.

Also fits the image briefly first so the measured scene has realistic
Gaussian statistics (spread + scales affect tile occupancy, hence FPS).
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

    # short fit so the measured scene is realistic (spread fitted Gaussians)
    chunk = jax.jit(
        lambda st, g, s: model.train_chunk(st, g, None, s, 500),
        donate_argnums=(0,))
    it = 0
    for _ in range(4):
        state, losses, psnrs = chunk(state, gt, jnp.asarray(it + 1))
        it += 500
    psnr_fit = float(np.asarray(psnrs)[-1])

    render = jax.jit(lambda p: model.render(p)["render"])
    img = render(state.params)
    img.block_until_ready()
    t0 = time.time()
    reps = 200
    for _ in range(reps):
        img = render(state.params)
    img.block_until_ready()
    dt = (time.time() - t0) / reps
    fps = 1.0 / dt

    baseline_fps = 2000.0  # reference README headline (V100)
    print(json.dumps({
        "metric": "render_fps_768x512_10k_gaussians",
        "value": round(fps, 1),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 3),
        "extra": {"fit_psnr_at_2k_iters": round(psnr_fit, 2),
                  "ms_per_frame": round(dt * 1e3, 3),
                  "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
