"""Sharded dataset fitting CLI — the multi-chip counterpart of train.py.

The reference fits images one at a time on a single GPU (train.py:366-389).
This driver fits a whole dataset in ONE SPMD program over a
(data, gauss, tile) device mesh: each data shard carries an independent
image + parameter set; gaussians and image row-tiles are sharded within each
fit and combined with psum collectives over ICI (parallel/fit.py,
SURVEY.md §2.3). Images are fitted in groups of the data-axis size; per-image
artifacts (train.txt, training.npy, gaussian_model.npz) match train.py's
schema.

Examples:
    # 8 virtual CPU devices (functional validation without a TPU slice):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python -m gaussianimage_tpu.train_sharded --data_name synthetic \\
        --num_points 2048 --iterations 1000 --mesh 2,2,2

    # on a real multi-chip slice the same command shards over the hardware
    # (jax.distributed.initialize() is called when processes > 1).
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.datasets import iterate_dataset
from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.ops import RasterizeConfig
from gaussianimage_tpu.parallel import (
    init_sharded_fit, make_mesh, make_sharded_train_step,
    maybe_initialize_distributed, mesh_axes_for)
from gaussianimage_tpu.utils.checkpoint import (
    load_train_state, save_checkpoint, save_train_state)
from gaussianimage_tpu.utils.logwriter import LogWriter


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-d", "--dataset", type=str, default="./datasets/kodak/")
    p.add_argument("--data_name", type=str, default="synthetic")
    p.add_argument("--model_name", type=str,
                   default="GaussianImage_Cholesky",
                   help="any 2D model exposing splat() (Cholesky, RS, "
                        "wMask) — the sharded step is model-agnostic")
    p.add_argument("--iterations", type=int, default=50000)
    p.add_argument("--num_points", type=int, default=10000)
    p.add_argument("--chunk_size", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--checkpoint_root", type=str, default="./checkpoints")
    p.add_argument("--ckpt_every", type=int, default=10000,
                   help="save a mid-fit resume snapshot per image group "
                        "every N iterations; 0 = off")
    p.add_argument("--resume", action="store_true",
                   help="skip finished groups / continue interrupted ones "
                        "from their resume snapshots")
    p.add_argument("--mesh", type=str, default=None,
                   help="data,gauss,tile axis sizes (default: auto from "
                        "device count)")
    p.add_argument("--tile_px", type=int, default=16,
                   help="raster tile (16 keeps small row-shards whole)")
    p.add_argument("--init_mode", type=str, default="adaptive",
                   choices=["uniform", "adaptive"],
                   help="per-image Gaussian init (core/init.py); 'uniform' "
                        "is the reference behavior")
    return p.parse_args(argv)


def main(argv=None):
    import os
    # sitecustomize registers the axon TPU plugin before env vars are read;
    # honor JAX_PLATFORMS=cpu the way tests/conftest.py does
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # multi-host runtime init (no-op single-process; wires the coordinator
    # and global device list under SLURM / TPU-pod / explicit env launches)
    maybe_initialize_distributed()
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.mesh:
        d, g, t = (int(x) for x in args.mesh.split(","))
        axes = {"data": d, "gauss": g, "tile": t}
    else:
        axes = mesh_axes_for(len(jax.devices()))
    mesh = make_mesh(axes)
    D = axes["data"]

    folder = f"sharded_{args.iterations}_{args.num_points}"
    root = Path(args.checkpoint_root) / args.data_name / folder
    logwriter = LogWriter(root)
    logwriter.write(f"mesh axes: {axes} over {len(jax.devices())} devices")

    # group the dataset into data-axis-sized batches of equal-shape images;
    # bucket by shape first so mixed-orientation datasets (kodak has both
    # 768x512 and 512x768) still fit every image
    items = list(iterate_dataset(args.data_name, args.dataset))
    by_shape = {}
    for name, im in items:
        by_shape.setdefault(im.shape, []).append((name, im))
    groups = []
    for shape_items in by_shape.values():
        for base in range(0, len(shape_items), D):
            groups.append(shape_items[base:base + D])
    stats = []
    for group in groups:
        group = list(group)
        while len(group) < D:  # pad the tail group by repeating its last
            group.append(group[-1])
        names = [n for n, _ in group]
        if args.resume and all(
                (root / n / "training.npy").exists() for n in set(names)):
            continue  # whole group already fitted
        images = np.concatenate([im for _, im in group], axis=0)
        H, W = images.shape[2], images.shape[3]
        model = make_model(
            args.model_name, num_points=args.num_points, H=H, W=W,
            lr=args.lr, raster=RasterizeConfig(tile_px=args.tile_px),
            block_h=args.tile_px, block_w=args.tile_px,
            init_mode=args.init_mode)
        params, opt_state, gt = init_sharded_fit(model, mesh, images,
                                                 seed=args.seed)
        it = 0
        resume_path = root / f"resume_{names[0]}.npz"
        if args.resume and resume_path.exists():
            shardings = jax.tree.map(lambda x: x.sharding,
                                     (params, opt_state))
            (params, opt_state), it, _ = load_train_state(
                resume_path, (params, opt_state))
            # re-place the loaded host leaves with the step's shardings
            params, opt_state = jax.tree.map(
                jax.device_put, (params, opt_state), shardings)
            logwriter.write(f"resumed group {names} at iteration {it}")
        step = make_sharded_train_step(model, mesh,
                                       n_steps=args.chunk_size)(
            params, opt_state, gt)
        t0 = time.time()
        loss = psnr = None
        warned_overflow = False
        while it < args.iterations:
            params, opt_state, loss, psnr, nd = step(
                params, opt_state, gt, jnp.asarray(it + 1))
            it += args.chunk_size
            nd_max = int(np.asarray(nd).max())
            if nd_max > 0 and not warned_overflow:
                warned_overflow = True
                logwriter.write(
                    f"WARNING: iter {it}: rasterizer dropped up to {nd_max} "
                    "gaussian-tile instances this chunk (raise "
                    "RasterizeConfig.max_instances / max_tiles_per_gauss)")
            if it % 5000 < args.chunk_size:
                lv = np.asarray(loss)
                pv = np.asarray(psnr)
                logwriter.write(
                    f"iter {it}: loss {lv.mean():.7f} psnr/image "
                    f"{np.round(pv, 3).tolist()}")
            if (args.ckpt_every and it < args.iterations
                    and it % args.ckpt_every < args.chunk_size):
                save_train_state(resume_path, (params, opt_state), it)
        dt = time.time() - t0
        pv = np.asarray(psnr)
        host_params = jax.tree.map(np.asarray, params)  # gather shards
        for di, name in enumerate(names[:len(set(names))]):
            img_dir = root / name
            img_dir.mkdir(parents=True, exist_ok=True)
            pslice = jax.tree.map(lambda x: x[di], host_params)
            save_checkpoint(img_dir / "gaussian_model.npz", pslice, {})
            np.save(img_dir / "training.npy",
                    {"iterations": args.iterations,
                     "training_time": dt, "psnr": float(pv[di]),
                     "initial_points": args.num_points})
            logwriter.write(
                f"{name}: {H}x{W}, PSNR:{pv[di]:.4f}, "
                f"Training(group):{dt:.1f}s")
            stats.append(pv[di])
    if stats:
        logwriter.write(f"Average PSNR: {np.mean(stats):.4f} over "
                        f"{len(stats)} images")


if __name__ == "__main__":
    main()
