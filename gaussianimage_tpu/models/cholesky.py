"""GaussianImage-Cholesky — the flagship 2D Gaussian image model.

Parameterization and semantics per the reference (gaussianimage_cholesky.py):
 - _xyz [N,2] in atanh space, means = tanh(_xyz) in (-1,1)     (:28-30,62)
 - _cholesky [N,3] raw; L elements = _cholesky + (0.5, 0, 0.5) (:32,42,74)
 - _features_dc [N,3] colors (raw, no activation)              (:34,66)
 - opacity fixed at 1                                          (:33)
 - grid init when num_points == H*W                            (:25-28)
 - render: project + accumulated-sum rasterize, clamp [0,1]    (:76-99)
 - QAT path quantizes xyz (fp16 STE), cholesky (6-bit learned
   uniform), colors (residual VQ)                              (:126-139)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.core import project_gaussians_2d
from gaussianimage_tpu.models.base import GaussianModelBase, ModelConfig
from gaussianimage_tpu.models.quantize_mixin import QuantizeMixin
from gaussianimage_tpu.ops import rasterize_gaussians_sum

# numpy, NOT jnp: a module-level device array captured by jit permanently
# degrades the axon PJRT runtime to synchronous per-call dispatch (~40x)
CHOLESKY_BOUND = np.asarray([0.5, 0.0, 0.5], np.float32)


class GaussianImageCholesky(QuantizeMixin, GaussianModelBase):
    name = "GaussianImage_Cholesky"
    # the fused splat-prep kernel hardcodes opacity == 1; subclasses whose
    # splat modulates opacity (wMask folds the learned mask into it) must
    # opt out or fused decode/render would silently drop it
    fused_prep_ok = True

    def init_params(self, key: jax.Array, gt_image=None
                    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        N = cfg.num_points
        adaptive = cfg.init_mode == "adaptive" and gt_image is not None
        colors = None
        chol0 = None  # grid/uniform branches fall back to the random init
        if N == cfg.H * cfg.W:
            ys = jnp.linspace(-1.0, 1.0, cfg.H)
            xs = jnp.linspace(-1.0, 1.0, cfg.W)
            grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
            xyz = jnp.arctanh(grid.reshape(-1, 2) * (1 - 1e-4))
        elif adaptive:
            # positions ~ GT gradient density, colors from the GT pixels,
            # sigma from the local point spacing (core/init.py); the
            # reference always inits uniformly at sigma ~ 1 px
            from gaussianimage_tpu.core.init import (adaptive_init_sigma,
                                                     adaptive_init_xyz,
                                                     init_colors_from_gt)
            xyz = adaptive_init_xyz(k1, gt_image, N, cfg.H, cfg.W)
            colors = init_colors_from_gt(gt_image, xyz, cfg.H, cfg.W)
            sig = adaptive_init_sigma(gt_image, xyz, N, cfg.H, cfg.W)
            chol0 = jnp.stack(
                [sig - CHOLESKY_BOUND[0], jnp.zeros_like(sig),
                 sig - CHOLESKY_BOUND[2]], axis=1)
        else:
            u = jax.random.uniform(k1, (N, 2), minval=-(1 - 1e-6),
                                   maxval=1 - 1e-6)
            xyz = jnp.arctanh(u)
        if colors is None:
            colors = jax.random.uniform(k3, (N, 3)).astype(jnp.float32)
        if chol0 is None:
            chol0 = jax.random.uniform(k2, (N, 3)).astype(jnp.float32)
        params = {
            "_xyz": xyz.astype(jnp.float32),
            "_cholesky": chol0.astype(jnp.float32),
            "_features_dc": colors,
        }
        if cfg.quantize:
            params.update(self.quantize_param_init())
        return params

    # -- reseeding hooks (core/reseed.py) ---------------------------------
    reseed_ok = True

    def importance(self, params) -> jnp.ndarray:
        """[N] contribution proxy: color energy x footprint area
        (|L11 * L22| = sqrt(det cov))."""
        l = params["_cholesky"]
        area = jnp.abs((l[:, 0] + CHOLESKY_BOUND[0])
                       * (l[:, 2] + CHOLESKY_BOUND[2]))
        return jnp.abs(params["_features_dc"]).sum(axis=1) * area

    def relocated(self, params, victims, new_xyz, new_colors, sigma):
        """Rewrite the victims' rows: position/color from the reseed
        targets, isotropic sigma-px covariance (raw = sigma - bound)."""
        p = dict(params)
        p["_xyz"] = p["_xyz"].at[victims].set(new_xyz)
        p["_features_dc"] = p["_features_dc"].at[victims].set(new_colors)
        chol = jnp.stack([sigma - CHOLESKY_BOUND[0], jnp.zeros_like(sigma),
                          sigma - CHOLESKY_BOUND[2]], axis=1)
        p["_cholesky"] = p["_cholesky"].at[victims].set(chol)
        return p

    # quantization hooks (QuantizeMixin)
    def _uq_channels(self):
        return {"cholesky": 3}

    def _uq_raw_values(self, params):
        return {"cholesky": params["_cholesky"]}

    def _quantized_splat(self, params, means, geo, colors):
        """Dequantized params -> splat tuple (xys, radii, conics, colors,
        opacities) — the decode path's projection half (shared by single and
        batched decode)."""
        cfg = self.cfg
        chol = geo["cholesky"] + CHOLESKY_BOUND
        xys, _, radii, conics, _ = project_gaussians_2d(
            means, chol, cfg.H, cfg.W, cfg.tile_bounds)
        N = means.shape[0]
        return xys, radii, conics, colors, jnp.ones((N, 1), jnp.float32)

    def _rasterize_quantized(self, params, means, geo, colors):
        cfg = self.cfg
        xys, radii, conics, colors, opac = self._quantized_splat(
            params, means, geo, colors)
        img, alpha, aux = rasterize_gaussians_sum(
            xys, conics, colors, opac, cfg.H, cfg.W, radii=radii,
            config=cfg.raster)
        return img, alpha, aux

    def decompress_wo_ec(self, params, extra, enc):
        """Decode path. With RasterizeConfig.fused_prep (and the
        flat-stream packed-key regime), the dequantize + projection +
        packing + binning-key glue runs as ONE Pallas pass
        (ops/splat_prep.py) — ~10 fewer op launches per frame on the
        decode hot loop; otherwise the generic QuantizeMixin path runs."""
        from gaussianimage_tpu.ops.splat_prep import (fused_decode_cholesky,
                                                      fused_decode_supported)
        cfg = self.cfg
        N = params["_xyz"].shape[0]
        if (not self.fused_prep_ok
                or not fused_decode_supported(N, cfg.H, cfg.W, cfg.raster)):
            return super().decompress_wo_ec(params, extra, enc)
        embed = extra["vq"].embed  # [nq, K, 3]
        combined = (embed[0][:, None, :] + embed[1][None, :, :]
                    ).reshape(-1, embed.shape[-1])
        img, _, aux = fused_decode_cholesky(
            jnp.asarray(enc["xyz"], jnp.float32),
            jnp.asarray(enc["quant_cholesky"]),
            params["cholesky_quant_scale"], params["cholesky_quant_beta"],
            CHOLESKY_BOUND, jnp.asarray(enc["feature_dc_index"]),
            combined, cfg.H, cfg.W, cfg.raster)
        img = jnp.clip(img, 0.0, 1.0)
        return {"render": img[None], "raster_aux": aux}

    def fused_decode_batch(self, params_b, extra_b, enc_b):
        """Batched decode (batched.py contract: leaves carry a leading [B]
        frame dim) through ONE fused prep pass + one stacked rasterize —
        the whole-dataset serving path with zero per-frame XLA glue.
        Returns None when unsupported; the caller then falls back to the
        generic vmapped-dequantize + stacked-rasterize path."""
        from gaussianimage_tpu.batched import _batched_raster_config
        from gaussianimage_tpu.ops.splat_prep import (
            fused_decode_cholesky_batch, fused_decode_supported)
        cfg = self.cfg
        xyz = enc_b["xyz"]
        B, N = xyz.shape[0], xyz.shape[1]
        bcfg = _batched_raster_config(self, B)
        if (not self.fused_prep_ok or cfg.H % bcfg.tile_px
                or not fused_decode_supported(B * N, cfg.H * B, cfg.W,
                                              bcfg)):
            return None
        embed = extra_b["vq"].embed  # [B, nq, K, 3]
        comb = (embed[:, 0][:, :, None, :] + embed[:, 1][:, None, :, :]
                ).reshape(B, -1, embed.shape[-1])
        img, _, aux = fused_decode_cholesky_batch(
            jnp.asarray(xyz, jnp.float32),
            jnp.asarray(enc_b["quant_cholesky"]),
            params_b["cholesky_quant_scale"],
            params_b["cholesky_quant_beta"],
            CHOLESKY_BOUND, jnp.asarray(enc_b["feature_dc_index"]), comb,
            cfg.H, cfg.W, bcfg)
        img = jnp.clip(img, 0.0, 1.0)
        img = img.reshape(3, B, cfg.H, cfg.W).transpose(1, 0, 2, 3)
        return {"render": img, "raster_aux": aux}

    # activations ----------------------------------------------------------
    @staticmethod
    def get_xyz(params):
        return jnp.tanh(params["_xyz"])

    @staticmethod
    def get_cholesky_elements(params):
        return params["_cholesky"] + CHOLESKY_BOUND

    @staticmethod
    def get_features(params):
        return params["_features_dc"]

    def render_fast(self, params):
        """Inference render via the fused prep kernel when enabled
        (RasterizeConfig.fused_prep + flat-stream packed-key regime):
        tanh/bound/projection/packing/binning-keys in ONE Pallas pass.
        Identical image to render() (tests/test_splat_prep.py)."""
        from gaussianimage_tpu.ops.splat_prep import (fused_decode_supported,
                                                      fused_render_cholesky)
        cfg = self.cfg
        N = params["_xyz"].shape[0]
        if (not self.fused_prep_ok
                or not fused_decode_supported(N, cfg.H, cfg.W, cfg.raster)):
            return super().render_fast(params)
        img, _, _ = fused_render_cholesky(
            params["_xyz"], params["_cholesky"], params["_features_dc"],
            CHOLESKY_BOUND, cfg.H, cfg.W, cfg.raster)
        if not cfg.no_clamp:
            img = jnp.clip(img, 0.0, 1.0)
        return img[None]

    # rendering -------------------------------------------------------------
    def splat(self, params):
        """Projected splat tuple (xys, radii, conics, colors, opacities) —
        the model-agnostic interface the sharded/parallel paths consume."""
        cfg = self.cfg
        xys, _, radii, conics, _ = project_gaussians_2d(
            self.get_xyz(params), self.get_cholesky_elements(params),
            cfg.H, cfg.W, cfg.tile_bounds)
        N = params["_xyz"].shape[0]
        return (xys, radii, conics, self.get_features(params),
                jnp.ones((N, 1), jnp.float32))

    def _rasterize(self, means, chol, colors, opacities):
        cfg = self.cfg
        xys, _, radii, conics, _ = project_gaussians_2d(
            means, chol, cfg.H, cfg.W, cfg.tile_bounds)
        img, alpha, aux = rasterize_gaussians_sum(
            xys, conics, colors, opacities, cfg.H, cfg.W, radii=radii,
            config=cfg.raster)
        return img, alpha, aux, xys, radii

    def render(self, params, *, key: Optional[jax.Array] = None, iteration=0,
               extra=None, render_viz: bool = False, **kw):
        cfg = self.cfg
        N = params["_xyz"].shape[0]
        opac = jnp.ones((N, 1), jnp.float32)
        img, alpha, aux, xys, radii = self._rasterize(
            self.get_xyz(params), self.get_cholesky_elements(params),
            self.get_features(params), opac)
        if not cfg.no_clamp:
            img = jnp.clip(img, 0.0, 1.0)
        out = {
            "render": img.transpose(2, 0, 1)[None],          # [1,3,H,W]
            "alpha_map": alpha[None, None],                  # [1,1,H,W]
            "final_opacities": opac,
            "xys": xys,
            "raster_aux": aux,
        }
        if render_viz:
            # gaussian-shape visualization with fixed random colors
            # (reference renders self.random_colors * 0.5, :88-92)
            viz_colors = 0.5 * jax.random.uniform(
                jax.random.PRNGKey(1234), (N, 3))
            gimg, _, _, _, _ = self._rasterize(
                jax.lax.stop_gradient(self.get_xyz(params)),
                jax.lax.stop_gradient(self.get_cholesky_elements(params)),
                viz_colors, opac)
            out["gauss_render"] = jnp.clip(gimg, 0, 1).transpose(2, 0, 1)[None]
        return out

    def forward(self, params, **kw):
        return self.render(params, **kw)
