"""GaussianImage-RS — rotation-scale covariance variant.

Reference semantics (gaussianimage_rs.py):
 - _scaling [N,2] raw; scales = |_scaling + 0.5|          (:27,54-56)
 - _rotation [N,1] raw; theta = sigmoid(_rotation)*2*pi   (:29,58-60)
 - means / colors / opacity as in the Cholesky variant
 - QAT quantizes scaling (6-bit), rotation (6-bit), colors (RVQ),
   xyz (fp16)                                             (:38-42,97-110)
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.core import project_gaussians_2d_scale_rot
from gaussianimage_tpu.models.base import GaussianModelBase
from gaussianimage_tpu.models.quantize_mixin import QuantizeMixin

SCALING_BOUND = np.asarray([0.5, 0.5], np.float32)  # numpy, not jnp (axon capture rule)


class GaussianImageRS(QuantizeMixin, GaussianModelBase):
    name = "GaussianImage_RS"

    def init_params(self, key: jax.Array, gt_image=None
                    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        k1, k2, k3, k4 = jax.random.split(key, 4)
        N = cfg.num_points
        if cfg.init_mode == "adaptive" and gt_image is not None:
            from gaussianimage_tpu.core.init import (adaptive_init_sigma,
                                                     adaptive_init_xyz,
                                                     init_colors_from_gt)
            xyz = adaptive_init_xyz(k1, gt_image, N, cfg.H, cfg.W)
            colors = init_colors_from_gt(gt_image, xyz, cfg.H, cfg.W)
            # isotropic sigma = local spacing (rotation then irrelevant;
            # scales = |raw + bound|, so raw = sigma - bound)
            sig = adaptive_init_sigma(gt_image, xyz, N, cfg.H, cfg.W)
            scaling0 = jnp.stack([sig - SCALING_BOUND[0],
                                  sig - SCALING_BOUND[1]], axis=1)
        else:
            u = jax.random.uniform(k1, (N, 2), minval=-(1 - 1e-6),
                                   maxval=1 - 1e-6)
            xyz = jnp.arctanh(u).astype(jnp.float32)
            colors = jax.random.uniform(k4, (N, 3)).astype(jnp.float32)
            scaling0 = jax.random.uniform(k2, (N, 2)).astype(jnp.float32)
        params = {
            "_xyz": xyz,
            "_scaling": scaling0.astype(jnp.float32),
            "_rotation": jax.random.uniform(k3, (N, 1)).astype(jnp.float32),
            "_features_dc": colors,
        }
        if cfg.quantize:
            params.update(self.quantize_param_init())
        return params

    # -- reseeding hooks (core/reseed.py) ---------------------------------
    reseed_ok = True

    def importance(self, params) -> jnp.ndarray:
        """[N] contribution proxy: color energy x footprint area
        (|sx * sy| = sqrt(det cov))."""
        s = jnp.abs(params["_scaling"] + SCALING_BOUND)
        return (jnp.abs(params["_features_dc"]).sum(axis=1)
                * s[:, 0] * s[:, 1])

    def relocated(self, params, victims, new_xyz, new_colors, sigma):
        p = dict(params)
        p["_xyz"] = p["_xyz"].at[victims].set(new_xyz)
        p["_features_dc"] = p["_features_dc"].at[victims].set(new_colors)
        scal = jnp.stack([sigma - SCALING_BOUND[0],
                          sigma - SCALING_BOUND[1]], axis=1)
        p["_scaling"] = p["_scaling"].at[victims].set(scal)
        return p

    # quantization hooks (QuantizeMixin). Note the reference quantizes raw
    # _scaling but the *activated* rotation (gaussianimage_rs.py:50-52,100-102)
    def _uq_channels(self):
        return {"scaling": 2, "rotation": 1}

    def _uq_raw_values(self, params):
        return {"scaling": params["_scaling"],
                "rotation": self.get_rotation(params)}

    def _quantized_splat(self, params, means, geo, colors):
        cfg = self.cfg
        scaling = jnp.abs(geo["scaling"] + SCALING_BOUND)
        rotation = geo["rotation"]
        xys, _, radii, conics, _ = project_gaussians_2d_scale_rot(
            means, scaling, rotation, cfg.H, cfg.W, cfg.tile_bounds)
        N = means.shape[0]
        return xys, radii, conics, colors, jnp.ones((N, 1), jnp.float32)

    def _rasterize_quantized(self, params, means, geo, colors):
        from gaussianimage_tpu.ops import rasterize_gaussians_sum

        cfg = self.cfg
        xys, radii, conics, colors, opac = self._quantized_splat(
            params, means, geo, colors)
        img, alpha, aux = rasterize_gaussians_sum(
            xys, conics, colors, opac, cfg.H, cfg.W,
            radii=radii, config=cfg.raster)
        return img, alpha, aux

    def decompress_wo_ec(self, params, extra, enc):
        """Decode path; with RasterizeConfig.fused_prep the glue runs as
        one Pallas pass (see GaussianImageCholesky.decompress_wo_ec)."""
        from gaussianimage_tpu.ops.splat_prep import (fused_decode_rs,
                                                      fused_decode_supported)
        cfg = self.cfg
        N = params["_xyz"].shape[0]
        if not fused_decode_supported(N, cfg.H, cfg.W, cfg.raster):
            return super().decompress_wo_ec(params, extra, enc)
        embed = extra["vq"].embed
        combined = (embed[0][:, None, :] + embed[1][None, :, :]
                    ).reshape(-1, embed.shape[-1])
        img, _, _ = fused_decode_rs(
            jnp.asarray(enc["xyz"], jnp.float32),
            jnp.asarray(enc["quant_scaling"]),
            jnp.asarray(enc["quant_rotation"]),
            params["scaling_quant_scale"], params["scaling_quant_beta"],
            params["rotation_quant_scale"], params["rotation_quant_beta"],
            SCALING_BOUND, jnp.asarray(enc["feature_dc_index"]), combined,
            cfg.H, cfg.W, cfg.raster)
        img = jnp.clip(img, 0.0, 1.0)
        return {"render": img[None]}

    def render_fast(self, params):
        """Inference render via the fused RS prep kernel when enabled."""
        from gaussianimage_tpu.ops.splat_prep import (fused_decode_supported,
                                                      fused_render_rs)
        cfg = self.cfg
        N = params["_xyz"].shape[0]
        if not fused_decode_supported(N, cfg.H, cfg.W, cfg.raster):
            return super().render_fast(params)
        img, _, _ = fused_render_rs(
            params["_xyz"], params["_scaling"], params["_rotation"],
            params["_features_dc"], SCALING_BOUND, cfg.H, cfg.W, cfg.raster)
        if not cfg.no_clamp:
            img = jnp.clip(img, 0.0, 1.0)
        return img[None]

    @staticmethod
    def get_xyz(params):
        return jnp.tanh(params["_xyz"])

    @staticmethod
    def get_scaling(params):
        return jnp.abs(params["_scaling"] + SCALING_BOUND)

    @staticmethod
    def get_rotation(params):
        return jax.nn.sigmoid(params["_rotation"]) * (2.0 * math.pi)

    @staticmethod
    def get_features(params):
        return params["_features_dc"]

    def splat(self, params):
        """Projected splat tuple for the sharded/parallel paths."""
        cfg = self.cfg
        xys, _, radii, conics, _ = project_gaussians_2d_scale_rot(
            self.get_xyz(params), self.get_scaling(params),
            self.get_rotation(params), cfg.H, cfg.W, cfg.tile_bounds)
        N = params["_xyz"].shape[0]
        return (xys, radii, conics, self.get_features(params),
                jnp.ones((N, 1), jnp.float32))

    def render(self, params, *, key: Optional[jax.Array] = None, iteration=0,
               extra=None, **kw):
        cfg = self.cfg
        from gaussianimage_tpu.ops import rasterize_gaussians_sum

        N = params["_xyz"].shape[0]
        opac = jnp.ones((N, 1), jnp.float32)
        xys, _, radii, conics, _ = project_gaussians_2d_scale_rot(
            self.get_xyz(params), self.get_scaling(params),
            self.get_rotation(params), cfg.H, cfg.W, cfg.tile_bounds)
        img, alpha, aux = rasterize_gaussians_sum(
            xys, conics, self.get_features(params), opac, cfg.H, cfg.W,
            radii=radii, config=cfg.raster)
        img = jnp.clip(img, 0.0, 1.0)
        return {
            "render": img.transpose(2, 0, 1)[None],
            "alpha_map": alpha[None, None],
            "final_opacities": opac,
            "xys": xys,
            "raster_aux": aux,
        }

    def forward(self, params, **kw):
        return self.render(params, **kw)
