"""Worker for the 2-process distributed-fit test (run via subprocess).

Each process owns 2 virtual CPU devices (XLA_FLAGS set by the launcher);
the mesh is (data=1, gauss=1, tile=4), so the per-step gradient psum over
the tile axis crosses the process boundary — a REAL cross-process
collective (gloo), not just a cross-process launch. The final params are
process_allgather'd and saved by process 0 for the launching test to
compare against a single-process run of the identical program.
"""

import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussianimage_tpu.parallel import (
        init_sharded_fit,
        make_mesh,
        make_sharded_train_step,
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed() is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from gaussianimage_tpu.models import make_model
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.utils.image_io import synthetic_image

    H, W, N = 64, 48, 256
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       raster=RasterizeConfig(tile_px=16))
    mesh = make_mesh({"data": 1, "gauss": 1, "tile": 4})
    images = synthetic_image(H, W, seed=0)  # [1, 3, H, W]
    params, opt_state, gt = init_sharded_fit(model, mesh, images, seed=3)
    step = make_sharded_train_step(model, mesh, n_steps=3)(
        params, opt_state, gt)
    params, opt_state, loss, psnr, _nd = step(params, opt_state, gt,
                                              jnp.asarray(1))

    from jax.experimental import multihost_utils
    gathered = {k: np.asarray(multihost_utils.process_allgather(v,
                                                                tiled=True))
                for k, v in params.items()}
    loss_h = np.asarray(multihost_utils.process_allgather(loss, tiled=True))
    if jax.process_index() == 0:
        np.savez(os.environ["MP_OUT"], loss=loss_h, **gathered)
    jax.distributed.shutdown()
    print(f"worker {os.environ['JAX_PROCESS_ID']} done", flush=True)


if __name__ == "__main__":
    sys.exit(main())
