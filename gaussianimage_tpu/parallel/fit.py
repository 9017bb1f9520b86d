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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_replicated_cotangent(x, axis_name):
    """``psum`` whose backward is the identity.

    Inside shard_map with ``check_vma=False`` JAX cannot prove the
    cotangent of a psum output is replicated, so autodiff transposes psum
    into a SECOND psum — a redundant [H/t, W, 3] all-reduce per step that
    doubles the gauss-axis wire bytes (found by
    scripts/validate_collectives.py reconciling compiled HLO against
    comm_accounting). Here the loss is computed identically on every gauss
    shard from the psum'd image, so the incoming cotangent IS replicated
    and the mathematically correct transpose is the identity."""
    return jax.lax.psum(x, axis_name)


def _psum_rc_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _psum_rc_bwd(axis_name, _, g):
    return (g,)


_psum_replicated_cotangent.defvjp(_psum_rc_fwd, _psum_rc_bwd)


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
    img = _psum_replicated_cotangent(img, "gauss")
    if not cfg.no_clamp:
        img = jnp.clip(img, 0.0, 1.0)
    return img, aux["n_dropped"]  # [h_loc, W, 3], scalar


def make_sharded_train_step(model, mesh: Mesh, n_steps: int = 1,
                            shard_opt: bool = False):
    """Builds a jitted multi-step sharded train function.

    Arguments of the returned fn:
      params:    leaves [D, N, k]  sharded P("data", "gauss")
      opt_state: adan state, leaves mirroring params — sharded
                 P("data", ("gauss", "tile")) when ``shard_opt``
      gt:        [D, 3, H, W]      sharded P("data", None, "tile", None)
      start_iteration: scalar int

    Returns (params, opt_state, loss [D], psnr [D], n_dropped_max [D]) with
    per-image metrics; n_dropped_max is the chunk's worst instance-stream
    overflow (overflow must surface during training, VERDICT r1 #5).

    When the gauss axis is 1, the loss+backward run through the fused
    render+L2 Pallas kernel (ops/rasterize_sum.py rasterize_gaussians_sum_l2)
    on each tile shard's row-slice — the same single-pass objective the
    single-chip trainer uses. With gauss > 1 the partial images must be
    psum'd before the (nonlinear) clamp+L2, so the unfused path remains.

    ``shard_opt`` (tile-axis optimizer-state sharding, the ZeRO-1 analog):
    instead of every tile shard all-reducing full gradients and redundantly
    running Adan on replicated moments, gradients are reduce_scatter'd over
    the tile axis, each shard updates its 1/t slice of the parameters with
    its 1/t slice of the moments, and the updated slices all_gather back.
    Per-step comm drops from 2(t-1)/t·B (ring all-reduce) to (t-1)/t·B
    (scatter) + (t-1)/t·B (gather) — same wire bytes, but optimizer math
    and moment memory shrink t-fold. Requires N divisible by
    (gauss·tile) axis sizes.
    """
    cfg = model.cfg
    assert cfg.loss_type == "L2", "sharded path supports the canonical L2 loss"
    data_ax, gauss_ax, tile_ax = "data", "gauss", "tile"
    n_tiles = mesh.shape[tile_ax]
    n_gauss = mesh.shape[gauss_ax]
    opt = model._optimizer()
    use_fused = (n_gauss == 1 and getattr(model, "fused_l2", False)
                 and not cfg.quantize and hasattr(model, "splat"))
    if shard_opt:
        assert cfg.num_points % (n_gauss * n_tiles) == 0, (
            "shard_opt needs num_points divisible by gauss*tile axis sizes")

    def shard_fn(obatched, params, opt_state, gt, start_iteration):
        # local leaves: params [1, Nloc, k], gt [1, 3, Hloc, W];
        # opt moments [1, Nloc/t, k] when shard_opt else [1, Nloc, k]
        tile_idx = jax.lax.axis_index(tile_ax)
        p_loc = jax.tree.map(lambda x: x[0], params)
        o_loc = jax.tree.map(
            lambda b, x: x[0] if b else x, obatched, opt_state)
        gt_loc = gt[0]  # [3, Hloc, W]
        h_loc = cfg.H // n_tiles
        n_slice = cfg.num_points // (n_gauss * n_tiles)

        def one_step(carry, i):
            p, o = carry

            if use_fused:
                def loss_fn(pp):
                    from gaussianimage_tpu.ops.rasterize_sum import (
                        rasterize_gaussians_sum_l2)
                    xys, radii, conics, colors, opac = model.splat(pp)
                    offset = jnp.stack([
                        jnp.zeros((), jnp.float32),
                        (tile_idx * h_loc).astype(jnp.float32)])
                    mse, raux = rasterize_gaussians_sum_l2(
                        xys - offset, conics, colors, opac, gt_loc,
                        h_loc, cfg.W, radii=radii, config=cfg.raster,
                        clamp=not cfg.no_clamp)
                    return mse, raux["n_dropped"]
            else:
                def loss_fn(pp):
                    img, nd = sharded_render(model, mesh, pp, tile_idx,
                                             n_tiles)
                    return jnp.mean(
                        (img.transpose(2, 0, 1) - gt_loc) ** 2), nd

            (loss, nd), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            loss = jax.lax.psum(loss, tile_ax) / n_tiles
            if shard_opt:
                # ZeRO-1 over the tile axis: reduce_scatter grads, update
                # this shard's parameter/moment slice, all_gather params
                def rs(g):
                    return jax.lax.psum_scatter(
                        g, tile_ax, scatter_dimension=0, tiled=True
                    ) / n_tiles
                g_slice = jax.tree.map(rs, grads)
                p_slice = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, tile_idx * n_slice, n_slice, axis=0), p)
                updates, o = opt.update(g_slice, o, p_slice)
                p_slice = optax.apply_updates(p_slice, updates)
                p = jax.tree.map(
                    lambda x: jax.lax.all_gather(
                        x, tile_ax, axis=0, tiled=True), p_slice)
            else:
                # gradient all-reduce across tile shards (params replicated)
                grads = jax.tree.map(
                    lambda g: jax.lax.psum(g, tile_ax) / n_tiles, grads)
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
        ospec = (P(data_ax, (gauss_ax, tile_ax)) if shard_opt
                 else P(data_ax, gauss_ax))

        def specs_like(tree, mask, batched_spec):
            return jax.tree.map(
                lambda x, b: batched_spec if b else P(), tree, mask)

        pmask = jax.tree.map(lambda x: True, params)
        in_specs = (specs_like(params, pmask, P(data_ax, gauss_ax)),
                    specs_like(opt_state, obatched, ospec),
                    P(data_ax, None, tile_ax, None), P())
        out_specs = (specs_like(params, pmask, P(data_ax, gauss_ax)),
                     specs_like(opt_state, obatched, ospec),
                     P(data_ax), P(data_ax), P(data_ax))
        fn = jax.shard_map(functools.partial(shard_fn, obatched), mesh=mesh,
                           in_specs=in_specs, out_specs=out_specs,
                           check_vma=False)
        return jax.jit(fn, donate_argnums=(0, 1))

    return build


def init_sharded_fit(model, mesh: Mesh, images, seed: int = 1,
                     shard_opt: bool = False):
    """Initialize a sharded multi-image fit. images: [D, 3, H, W] with
    D == mesh data-axis size. Returns (params, opt_state, gt) placed with the
    step's shardings (data-parallel over images is pure data-parallelism —
    every image gets an independent random init and optimizer state).
    ``shard_opt`` must match make_sharded_train_step's flag: optimizer
    moments then shard over (gauss, tile) so each tile shard holds 1/t of
    them."""
    D = images.shape[0]
    assert D == mesh.shape["data"], (D, dict(mesh.shape))
    keys = jax.random.split(jax.random.PRNGKey(seed), D)
    if model.cfg.init_mode == "adaptive":
        params = jax.vmap(
            lambda k, im: model.init_params(k, gt_image=im))(
            keys, jnp.asarray(images, jnp.float32))  # leaves [D, N, k]
    else:
        params = jax.vmap(model.init_params)(keys)  # leaves [D, N, k]
    opt = model._optimizer()
    opt_state = opt.init(params)  # moment leaves mirror [D, N, k]
    obatched = _opt_batched_mask(model, opt, opt_state)
    ospec = P("data", ("gauss", "tile")) if shard_opt else P("data", "gauss")

    def put(x, batched, spec=P("data", "gauss")):
        return jax.device_put(
            x, NamedSharding(mesh, spec if batched else P()))

    params = jax.tree.map(lambda x: put(x, True), params)
    opt_state = jax.tree.map(
        lambda x, b: put(x, b, ospec), opt_state, obatched)
    gt = jax.device_put(jnp.asarray(images, jnp.float32),
                        NamedSharding(mesh, P("data", None, "tile", None)))
    return params, opt_state, gt
