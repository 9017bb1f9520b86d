"""Batched rendering/decoding — B frames in ONE rasterizer pass.

TPU-idiomatic throughput path (SURVEY.md: "keep work large and batched"):
B same-size frames are stacked VERTICALLY into one H*B x W canvas, their
gaussians offset into the matching row band, and the whole stack renders
through a single binning sort + stream gather + Pallas launch. Fixed
per-op launch overhead (~0.1 ms/frame on the axon runtime) amortizes over
the batch, and every array is B times larger — better lane/MXU utilization
throughout.

Per-frame containment is exact, not approximate: each gaussian carries an
inclusive tile-row ``band`` (ops/tiles.py) so its instances can only bin
into its own frame's rows, and the q <= q_cut kernel gate is unchanged —
the stacked render equals the per-frame renders bit-for-bit (up to f32
accumulation order inside shared tiles, which does not occur across bands).

Use cases: whole-dataset codec decode (test_quantize evaluates 24 Kodak
images), multi-frame FPS probes, serving many small images per chip.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussianimage_tpu.ops.rasterize_sum import rasterize_gaussians_sum_chw


def _batched_raster_config(model, B: int):
    """Raster config for the stacked canvas: the instance budget scales with
    B*N (3x average occupancy; measured ~2.5 on fitted scenes), and the
    flat-stream ceiling rises to flat_stream_limit=196608 instances — at
    I*512 bytes of VMEM after lane padding that is ~96 MiB, the most the
    fast flat [I, 16] layout can hold under the 100 MB limit. Larger batches
    spill to the BK-aligned transposed-block layout automatically."""
    cfg = model.cfg.raster
    cap = 3 * B * model.cfg.num_points
    # keep the auto path's tapered per-gaussian span (3x the 3-slot average
    # budget = 9 tiles); the explicit max_instances below would otherwise
    # re-enable the full max_tiles_per_gauss and inflate the binning sort ~2x
    span = min(cfg.max_tiles_per_gauss, 9)
    return cfg._replace(max_instances=max(cap, 16384),
                        max_tiles_per_gauss=span,
                        flat_stream_limit=max(cfg.flat_stream_limit, 196608))


def _stack_splats(model, splats: Tuple[jnp.ndarray, ...]):
    """vmapped splat tuples (leaves [B, N, ...]) -> flattened stacked scene
    plus the per-gaussian tile-row band."""
    cfg = model.cfg
    tp = cfg.raster.tile_px
    assert cfg.H % tp == 0, "batched stacking needs H % tile_px == 0"
    xys, radii, conics, colors, opac = splats
    B, N = xys.shape[0], xys.shape[1]
    yoff = (jnp.arange(B, dtype=jnp.float32) * cfg.H)[:, None]
    xys = jnp.concatenate(
        [xys[..., 0:1], xys[..., 1:2] + yoff[..., None]], axis=-1)
    rows = cfg.H // tp
    frame = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
    band = (frame * rows, frame * rows + rows - 1)

    def flat(x):
        return x.reshape((B * N,) + x.shape[2:])

    return (flat(xys), flat(radii), flat(conics), flat(colors), flat(opac),
            band)


def _raster_stacked(model, flat_splat, band):
    cfg = model.cfg
    xys, radii, conics, colors, opac = flat_splat
    B = band[0].shape[0] // cfg.num_points
    img, alpha, aux = rasterize_gaussians_sum_chw(
        xys, conics, colors, opac, cfg.H * B, cfg.W, radii=radii,
        config=_batched_raster_config(model, B), band=band)
    img = jnp.clip(img, 0.0, 1.0)
    # [3, H*B, W] -> [B, 3, H, W]: ONE transpose (the inference rasterizer
    # already returns channel-major, skipping the HWC round trip)
    img = img.reshape(3, B, cfg.H, cfg.W).transpose(1, 0, 2, 3)
    alpha = alpha.reshape(B, cfg.H, cfg.W)
    return img, alpha, aux


def render_batch(model, params_b) -> Dict[str, jnp.ndarray]:
    """Render B parameter sets (pytree leaves stacked on axis 0) in one
    rasterizer pass. Returns {"render": [B, 3, H, W], "alpha_map":
    [B, 1, H, W], "raster_aux": aux}."""
    splats = jax.vmap(model.splat)(params_b)
    *flat, band = _stack_splats(model, splats)
    img, alpha, aux = _raster_stacked(model, tuple(flat), band)
    return {"render": img, "alpha_map": alpha[:, None], "raster_aux": aux}


def decompress_wo_ec_batch(model, params_b, extra_b, enc_b
                           ) -> Dict[str, jnp.ndarray]:
    """Decode B encodings (leaves stacked on axis 0) in one rasterizer pass
    — the whole-dataset decode path. Returns {"render": [B, 3, H, W]}.

    ``model`` must be a quantize=True model; params/extra/enc carry each
    frame's quantizer state, VQ codebooks, and code arrays.

    Models with a ``fused_decode_batch`` hook (cholesky.py) and
    RasterizeConfig.fused_prep get the whole dequantize + projection +
    packing + binning-key glue as ONE Pallas pass over all B frames
    (ops/splat_prep.py _batch_decode_kernel); otherwise the generic
    vmapped-dequantize + stacked-rasterize path runs."""
    fused = getattr(model, "fused_decode_batch", None)
    if fused is not None:
        out = fused(params_b, extra_b, enc_b)
        if out is not None:
            return out

    def one(p, ex, e):
        means, geo, colors = model.dequantize_wo_ec(p, ex, e)
        return model._quantized_splat(p, means, geo, colors)

    splats = jax.vmap(one)(params_b, extra_b, enc_b)
    *flat, band = _stack_splats(model, splats)
    img, _, aux = _raster_stacked(model, tuple(flat), band)
    return {"render": img, "raster_aux": aux}


# Measured crossover between the stacked one-pass decode and a rolled scan
# of single-frame decodes (results/ab/batched_regime.json, real TPU, fused
# prep both sides): stacking amortizes the fixed per-frame costs (op
# launches, small-grid underutilization) and wins at small frames (+19% at
# 128^2, +5% at 256^2) but pays superlinear glue (bigger binning sort,
# bigger window-bounds pass) and loses at 768x512 (-12%). The gate routes
# each frame size to its measured winner.
BATCHED_WIN_MAX_PIXELS = 131072  # ~between 256^2 (wins) and 512x768 (loses)


def prefer_batched(H: int, W: int) -> bool:
    """True when the stacked one-pass decode beats per-frame decodes at
    this frame size (measured regime, see BATCHED_WIN_MAX_PIXELS)."""
    return H * W <= BATCHED_WIN_MAX_PIXELS


def decode_many(model, params_b, extra_b, enc_b, *,
                force: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Decode B encodings (leaves stacked on axis 0) by whichever strategy
    measures faster at this frame size: ONE stacked rasterizer pass
    (decompress_wo_ec_batch) for small frames, a rolled ``lax.map`` of
    single-frame decodes (still one dispatch) for large ones.

    ``force`` pins the strategy ("batched" | "scan") for tests/probes.
    Returns {"render": [B, 3, H, W], "raster_aux": ...}."""
    use_batched = (prefer_batched(model.cfg.H, model.cfg.W)
                   if force is None else force == "batched")
    if use_batched:
        return decompress_wo_ec_batch(model, params_b, extra_b, enc_b)

    def one(args):
        p, ex, e = args
        out = model.decompress_wo_ec(p, ex, e)
        return out["render"][0], out.get("raster_aux")

    imgs, aux = jax.lax.map(one, (params_b, extra_b, enc_b))
    return {"render": imgs, "raster_aux": aux}
