"""3D Gaussian splatting baseline — fits an image through a fixed camera with
standard sorted alpha-blend compositing (reference gaussiansplatting_3d.py).

Parity map:
 - means3d uniform in [-1,1]^3; log-scale init from mean 3-NN distance
   (:42-47; sklearn kNN replaced by a chunked jnp kNN)
 - learnable sigmoid opacity init 0.1; random quaternions (:11-26,48-49)
 - SH colors of degree sh_degree; features_dc [N,1,3] + zero rest (:51-54)
 - fixed camera: viewmat z += 8, fov_x 90deg, focal = W/2 (:58-69)
 - render: project -> SH -> sorted alpha blend with white background,
   clamp max=1 (:102-122); loss Fusion2 (train.py:122)
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.core.camera3d import project_gaussians
from gaussianimage_tpu.core.sh import num_sh_bases, spherical_harmonics
from gaussianimage_tpu.models.base import GaussianModelBase
from gaussianimage_tpu.ops.rasterize_blend import BlendConfig, rasterize_gaussians_blend


def random_quat(key, N):
    u, v, w = jnp.split(jax.random.uniform(key, (N, 3)), 3, axis=1)
    tp = 2.0 * math.pi
    return jnp.concatenate([
        jnp.sqrt(1 - u) * jnp.sin(tp * v),
        jnp.sqrt(1 - u) * jnp.cos(tp * v),
        jnp.sqrt(u) * jnp.sin(tp * w),
        jnp.sqrt(u) * jnp.cos(tp * w),
    ], axis=1)


def knn_mean_dist(x: jnp.ndarray, k: int = 3, chunk: int = 256) -> jnp.ndarray:
    """Mean distance to the k nearest neighbors (excluding self), [N]."""
    N = x.shape[0]
    pad = (-N) % chunk
    xp = jnp.concatenate([x, jnp.full((pad, x.shape[1]), 1e6)]) if pad else x

    def body(_, cx):
        d2 = jnp.sum((cx[:, None, :] - x[None, :, :]) ** 2, axis=-1)
        # k+1 smallest includes self (distance 0)
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        d = jnp.sqrt(jnp.maximum(-neg_top[:, 1:], 0.0))
        return None, d.mean(axis=1)

    _, out = jax.lax.scan(body, None, xp.reshape(-1, chunk, x.shape[1]))
    return out.reshape(-1)[:N]


class Gaussian3D(GaussianModelBase):
    name = "3DGS"

    def __init__(self, config):
        super().__init__(config)
        self.focal = 0.5 * float(config.W) / math.tan(0.5 * math.pi / 2.0)
        self.viewmat = np.asarray(  # numpy, not jnp (axon capture rule)
            [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 8.0], [0, 0, 0, 1.0]],
            np.float32)
        self.translation = np.asarray([[0.0, 0.0, -8.0]], np.float32)
        # fused_prep rides the shared RasterizeConfig flag so
        # make_model("3DGS", raster=RasterizeConfig(fused_prep=True))
        # switches the serving render to the one-pass prep kernel
        self.blend_cfg = BlendConfig(tile_px=32, max_tiles_per_gauss=36,
                                     fused_prep=config.raster.fused_prep,
                                     interpret=config.raster.interpret)

    def init_params(self, key: jax.Array, gt_image=None
                    ) -> Dict[str, jnp.ndarray]:
        # gt_image unused: 3DGS inits positions uniformly in NDC with kNN
        # scales (reference gaussiansplatting_3d.py), not content-adaptively
        cfg = self.cfg
        N = cfg.num_points
        k1, k2, k3 = jax.random.split(key, 3)
        xyz = 2.0 * (jax.random.uniform(k1, (N, 3)) - 0.5)
        avg_dist = knn_mean_dist(xyz, k=3)
        dim_sh = num_sh_bases(cfg.sh_degree)
        return {
            "_xyz": xyz.astype(jnp.float32),
            "_scaling": jnp.log(jnp.tile(avg_dist[:, None], (1, 3))
                                ).astype(jnp.float32),
            "_opacity": jnp.full((N, 1), jax.scipy.special.logit(0.1),
                                 jnp.float32),
            "_rotation": random_quat(k2, N).astype(jnp.float32),
            "_features_dc": jax.random.uniform(k3, (N, 1, 3)).astype(jnp.float32),
            "_features_rest": jnp.zeros((N, dim_sh - 1, 3), jnp.float32),
        }

    @staticmethod
    def get_scaling(params):
        return jnp.exp(params["_scaling"])

    @staticmethod
    def get_opacity(params):
        return jax.nn.sigmoid(params["_opacity"])

    @staticmethod
    def get_features(params):
        return jnp.concatenate(
            [params["_features_dc"], params["_features_rest"]], axis=1)

    def render(self, params, *, key: Optional[jax.Array] = None, iteration=0,
               extra=None, **kw):
        cfg = self.cfg
        quats = params["_rotation"] / jnp.linalg.norm(
            params["_rotation"], axis=-1, keepdims=True)
        xys, depths, radii, conics, _, _ = project_gaussians(
            params["_xyz"], self.get_scaling(params), 1.0, quats,
            self.viewmat, self.viewmat, self.focal, self.focal,
            cfg.W / 2, cfg.H / 2, cfg.H, cfg.W, cfg.tile_bounds)

        if cfg.sh_degree > 0:
            viewdirs = jax.lax.stop_gradient(params["_xyz"]) - self.translation
            viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1,
                                                  keepdims=True)
            rgbs = spherical_harmonics(cfg.sh_degree, viewdirs,
                                       self.get_features(params))
            rgbs = jnp.maximum(rgbs + 0.5, 0.0)
        else:
            rgbs = jax.nn.sigmoid(params["_features_dc"][:, 0, :])

        img, alpha, aux = rasterize_gaussians_blend(
            xys, depths, radii, conics, rgbs, self.get_opacity(params),
            cfg.H, cfg.W, background=jnp.ones((3,), jnp.float32),
            config=self.blend_cfg)
        img = jnp.minimum(img, 1.0)  # reference clamps max only (:120)
        return {
            "render": img.transpose(2, 0, 1)[None],
            "alpha_map": alpha[None, None],
            "xys": xys,
            "raster_aux": aux,
        }

    def render_fast(self, params):
        """Serving render via the fused 3DGS prep kernel when enabled
        (BlendConfig.fused_prep + flat-stream packed-key regime): depth
        sort, then ONE Pallas pass for quat->R, EWA projection, SH, opacity
        and binning keys over the depth-ordered rows, then the sort-binned
        blend kernel — same image as render() within the fused-prep
        boundary-ulp envelope (tests/test_gs3d.py)."""
        from gaussianimage_tpu.ops.rasterize_blend import (
            _depth_order, rasterize_blend_from_keys_chw)
        from gaussianimage_tpu.ops.splat_prep3d import (fused_blend_supported,
                                                        fused_prep_blend3d)
        from gaussianimage_tpu.ops import stream_common as sc

        cfg = self.cfg
        N = params["_xyz"].shape[0]
        bcfg = self.blend_cfg
        if not fused_blend_supported(N, cfg.H, cfg.W, bcfg):
            return super().render_fast(params)
        # depth exactly as project_gaussians computes t[:, 2] (same HIGHEST
        # matmul — order parity with the generic path)
        Rv = self.viewmat[:3, :3]
        tv = self.viewmat[:3, 3]
        t = jnp.matmul(params["_xyz"], Rv.T,
                       precision=jax.lax.Precision.HIGHEST) + tv
        order = _depth_order(t[:, 2])

        def take(x):
            return jnp.take(x, order, axis=0)

        if cfg.sh_degree > 0:
            coeffs = self.get_features(params).reshape(N, -1)  # [N, 3K]
        else:
            coeffs = params["_features_dc"][:, 0, :]
        I0, m_span, _ = sc.stream_caps(N, bcfg)
        feat, keys, trunc, n_total = fused_prep_blend3d(
            take(params["_xyz"]), take(params["_scaling"]),
            take(params["_rotation"]), take(params["_opacity"]),
            take(coeffs), self.viewmat, self.focal, self.focal,
            cfg.W / 2, cfg.H / 2, self.translation, cfg.sh_degree,
            cfg.H, cfg.W, bcfg, m_span)
        img, _, _ = rasterize_blend_from_keys_chw(
            feat, keys, trunc, n_total, cfg.H, cfg.W,
            jnp.ones((3,), jnp.float32), bcfg, I0)
        img = jnp.minimum(img, 1.0)  # reference clamps max only (:120)
        return img[None]

    def forward(self, params, **kw):
        return self.render(params, **kw)
