"""Sharded training — SPMD fitting over a (data, gauss, tile) mesh.

The reference has no parallelism (single cuda:0 device, python loop over
images — SURVEY.md §2.3). Here one jitted step composes all three axes:

- ``data``:  independent images; params carry a leading [D] dim sharded over
             the axis. No cross-shard communication.
- ``gauss``: each shard rasterizes its N/g Gaussians over the (local) image
             region; partial images combine with ONE ``psum`` per render.
             Exact because accumulated-sum blending is commutative.
- ``tile``:  each shard renders/losses its own H/t row-slice against its
             slice of the ground truth; per-parameter gradients combine with
             ONE ``psum`` per backward (replacing CUDA atomicAdd with an XLA
             collective that rides ICI).

Loss is restricted to L2 in the sharded path (window-based SSIM losses would
need halo exchange across tile shards; L2 is the canonical GaussianImage
config, reference train.py:105).

Optimizer-state leaves are classified batched-vs-global by comparing against
an ``eval_shape`` template of the unbatched state (a leaf is data-batched iff
it gained exactly one leading dim), so optimizers with 1-D per-gaussian or
2-D global state shard correctly — not by a leaf-rank heuristic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from gaussianimage_tpu.ops import rasterize_gaussians_sum


def _opt_batched_mask(model, opt, batched_opt_state):
    """Bool pytree: True where an opt-state leaf carries the leading [D]
    data-batch dim (its rank is template-rank + 1)."""
    template = jax.eval_shape(
        lambda k: opt.init(model.init_params(k)), jax.random.PRNGKey(0))
    return jax.tree.map(
        lambda b, t: hasattr(b, "ndim") and b.ndim == t.ndim + 1,
        batched_opt_state, template)


def sharded_render(model, mesh: Mesh, params_local, tile_idx, n_tiles: int):
    """Per-shard render of the local tile row-slice using the local Gaussian
    shard; returns ([H/t, W, 3], n_dropped) AFTER the gauss-axis psum. Call
    inside shard_map."""
    cfg = model.cfg
    assert cfg.H % (n_tiles * cfg.raster.tile_px) == 0, (
        "H must split into whole raster tiles across the tile axis")
    h_loc = cfg.H // n_tiles
    xys, radii, conics, colors, opac = model.splat(params_local)
    offset = jnp.stack([jnp.zeros((), jnp.float32),
                        (tile_idx * h_loc).astype(jnp.float32)])
    img, _, aux = rasterize_gaussians_sum(
        xys - offset, conics, colors, opac, h_loc, cfg.W,
        radii=radii, config=cfg.raster)
    img = jax.lax.psum(img, "gauss")
    if not cfg.no_clamp:
        img = jnp.clip(img, 0.0, 1.0)
    return img, aux["n_dropped"]  # [h_loc, W, 3], scalar


def make_sharded_train_step(model, mesh: Mesh, n_steps: int = 1):
    """Builds a jitted multi-step sharded train function.

    Arguments of the returned fn:
      params:    leaves [D, N, k]  sharded P("data", "gauss")
      opt_state: adan state, leaves mirroring params
      gt:        [D, 3, H, W]      sharded P("data", None, "tile", None)
      start_iteration: scalar int

    Returns (params, opt_state, loss [D], psnr [D], n_dropped_max [D]) with
    per-image metrics; n_dropped_max is the chunk's worst instance-stream
    overflow (overflow must surface during training, VERDICT r1 #5).
    """
    cfg = model.cfg
    assert cfg.loss_type == "L2", "sharded path supports the canonical L2 loss"
    data_ax, gauss_ax, tile_ax = "data", "gauss", "tile"
    n_tiles = mesh.shape[tile_ax]
    opt = model._optimizer()

    def shard_fn(obatched, params, opt_state, gt, start_iteration):
        # local leaves: params [1, Nloc, k], gt [1, 3, Hloc, W]
        tile_idx = jax.lax.axis_index(tile_ax)
        p_loc = jax.tree.map(lambda x: x[0], params)
        o_loc = jax.tree.map(
            lambda b, x: x[0] if b else x, obatched, opt_state)
        gt_loc = gt[0]  # [3, Hloc, W]

        def one_step(carry, i):
            p, o = carry

            def loss_fn(pp):
                img, nd = sharded_render(model, mesh, pp, tile_idx, n_tiles)
                return jnp.mean((img.transpose(2, 0, 1) - gt_loc) ** 2), nd

            (loss, nd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            # gradient all-reduce across tile shards (params replicated there)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g, tile_ax) / n_tiles, grads)
            loss = jax.lax.psum(loss, tile_ax) / n_tiles
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(loss, 1e-12))
            return (p, o), (loss, psnr, nd)

        (p_loc, o_loc), (losses, psnrs, dropped) = jax.lax.scan(
            one_step, (p_loc, o_loc), start_iteration + jnp.arange(n_steps))

        params = jax.tree.map(lambda x: x[None], p_loc)
        opt_state = jax.tree.map(
            lambda b, x: x[None] if b else x, obatched, o_loc)
        nd_max = jax.lax.pmax(jax.lax.pmax(dropped.max(), tile_ax), gauss_ax)
        return params, opt_state, losses[-1][None], psnrs[-1][None], \
            nd_max[None]

    def build(params, opt_state, gt):
        obatched = _opt_batched_mask(model, opt, opt_state)

        def specs_like(tree, mask):
            return jax.tree.map(
                lambda x, b: P(data_ax, gauss_ax) if b else P(), tree, mask)

        pmask = jax.tree.map(lambda x: True, params)
        in_specs = (specs_like(params, pmask), specs_like(opt_state, obatched),
                    P(data_ax, None, tile_ax, None), P())
        out_specs = (specs_like(params, pmask), specs_like(opt_state, obatched),
                     P(data_ax), P(data_ax), P(data_ax))
        fn = jax.shard_map(functools.partial(shard_fn, obatched), mesh=mesh,
                           in_specs=in_specs, out_specs=out_specs,
                           check_vma=False)
        return jax.jit(fn, donate_argnums=(0, 1))

    return build


def init_sharded_fit(model, mesh: Mesh, images, seed: int = 1):
    """Initialize a sharded multi-image fit. images: [D, 3, H, W] with
    D == mesh data-axis size. Returns (params, opt_state, gt) placed with the
    step's shardings (data-parallel over images is pure data-parallelism —
    every image gets an independent random init and optimizer state)."""
    D = images.shape[0]
    assert D == mesh.shape["data"], (D, dict(mesh.shape))
    keys = jax.random.split(jax.random.PRNGKey(seed), D)
    params = jax.vmap(model.init_params)(keys)  # leaves [D, N, k]
    opt = model._optimizer()
    opt_state = opt.init(params)  # moment leaves mirror [D, N, k]
    obatched = _opt_batched_mask(model, opt, opt_state)

    def put(x, batched):
        spec = P("data", "gauss") if batched else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree.map(lambda x: put(x, True), params)
    opt_state = jax.tree.map(put, opt_state, obatched)
    gt = jax.device_put(jnp.asarray(images, jnp.float32),
                        NamedSharding(mesh, P("data", None, "tile", None)))
    return params, opt_state, gt
