"""Depth-sorted alpha-blend rasterizer — the TPU-native equivalent of
gsplat's 3D ``rasterize_gaussians`` (reference contract at
gaussiansplatting_3d.py:117-118: front-to-back compositing
c += T * alpha * rgb, T *= (1 - alpha), background composited with the final
transmittance, returns (img, alpha)).

Design: this is the baseline model's kernel (the paper's contribution is the
*sum* rasterizer, ops/rasterize_sum.py, which is Pallas). Here sorting and
order-dependence make XLA the right tool: a global depth sort, sort-based
per-tile depth-ordered index lists (ops/tiles.py), and a blending scan
over tile chunks with rematerialization. Everything is fused XLA with static
shapes; autodiff gives exact gradients through the compositing order.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussianimage_tpu.ops.tiles import bin_gaussians_per_tile


class BlendConfig(NamedTuple):
    tile_px: int = 16
    max_per_tile: int = 256     # per-tile gaussian cap (overflow reported)
    max_tiles_per_gauss: int = 64   # bbox cap per gaussian (8x8 tiles)
    gauss_chunk: int = 1024     # binning scan chunk
    tile_chunk: int = 32        # blending scan chunk
    alpha_clip: float = 0.999
    alpha_min: float = 1.0 / 255.0


def rasterize_gaussians_blend(
    xys: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    H: int,
    W: int,
    background: Optional[jnp.ndarray] = None,
    config: BlendConfig = BlendConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Front-to-back alpha compositing. Returns (img [H,W,3], alpha [H,W],
    aux). Differentiable w.r.t. xys/conics/colors/opacities."""
    cfg = config
    tp = cfg.tile_px
    tiles_x, tiles_y = -(-W // tp), -(-H // tp)
    T = tiles_x * tiles_y
    K = cfg.max_per_tile
    P = tp * tp
    N = xys.shape[0]
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    order = jnp.argsort(jax.lax.stop_gradient(depths), stable=True)
    order = order.astype(jnp.int32)
    # sort-based binning (ops/tiles.py); passing the depth order keeps each
    # tile's index list depth-sorted, which the compositing scan requires
    bins = bin_gaussians_per_tile(
        jax.lax.stop_gradient(xys).astype(jnp.float32),
        jax.lax.stop_gradient(radii).astype(jnp.float32),
        tiles_x, tiles_y, tp, K, order=order,
        max_tiles_per_gauss=cfg.max_tiles_per_gauss)
    table, counts, dropped = bins.index, bins.counts, bins.n_dropped

    opac = opacities.reshape(N)
    tc = cfg.tile_chunk
    pad_t = (-T) % tc
    table_p = jnp.concatenate(
        [table, jnp.full((pad_t, K), -1, jnp.int32)]) if pad_t else table
    n_tchunks = (T + pad_t) // tc

    tile_ids_all = jnp.arange(T + pad_t, dtype=jnp.int32)

    def blend_chunk(_, args):
        tids, tbl = args  # [tc], [tc, K]
        safe = jnp.maximum(tbl, 0)
        g_xy = xys[safe]          # [tc, K, 2]
        g_con = conics[safe]      # [tc, K, 3]
        g_col = colors[safe]      # [tc, K, 3]
        g_op = jnp.where(tbl >= 0, opac[safe], 0.0)  # [tc, K]

        px0 = (tids % tiles_x) * tp
        py0 = (tids // tiles_x) * tp
        pidx = jnp.arange(P, dtype=jnp.int32)
        px = (px0[:, None] + pidx[None] % tp).astype(jnp.float32)  # [tc, P]
        py = (py0[:, None] + pidx[None] // tp).astype(jnp.float32)

        dx = px[:, None, :] - g_xy[..., 0:1]  # [tc, K, P]
        dy = py[:, None, :] - g_xy[..., 1:2]
        q = (g_con[..., 0:1] * dx * dx + 2 * g_con[..., 1:2] * dx * dy
             + g_con[..., 2:3] * dy * dy)
        w = jnp.exp(-0.5 * jnp.maximum(q, 0.0))
        alpha = jnp.minimum(cfg.alpha_clip, g_op[..., None] * w)
        alpha = jnp.where(alpha < cfg.alpha_min, 0.0, alpha)  # [tc, K, P]

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=1)  # inclusive transmittance products
        T_excl = jnp.concatenate(
            [jnp.ones_like(alpha[:, :1]), cum[:, :-1]], axis=1)
        vis = alpha * T_excl  # [tc, K, P]
        rgb = jnp.einsum("ckp,cke->cpe", vis, g_col,
                         precision=jax.lax.Precision.HIGHEST)
        t_final = cum[:, -1]  # [tc, P]
        img = rgb + t_final[..., None] * background[None, None]
        return None, (img, 1.0 - t_final)

    _, (tiles_img, tiles_alpha) = jax.lax.scan(
        jax.checkpoint(blend_chunk), None,
        (tile_ids_all.reshape(n_tchunks, tc), table_p.reshape(n_tchunks, tc, K)))

    img = (tiles_img.reshape(tiles_y * tiles_x + pad_t, tp, tp, 3)
           [:T].reshape(tiles_y, tiles_x, tp, tp, 3)
           .transpose(0, 2, 1, 3, 4)
           .reshape(tiles_y * tp, tiles_x * tp, 3))[:H, :W]
    alpha = (tiles_alpha.reshape(-1, tp, tp)[:T]
             .reshape(tiles_y, tiles_x, tp, tp)
             .transpose(0, 2, 1, 3)
             .reshape(tiles_y * tp, tiles_x * tp))[:H, :W]
    aux = {"n_dropped": dropped, "max_count": counts.max()}
    return img, alpha, aux
