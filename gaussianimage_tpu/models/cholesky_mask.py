"""GaussianImage-Cholesky with a learnable pruning mask — the reference fork's
research model (gaussianimage_cholesky_wMask.py). Per-Gaussian mask logits are
trained with Gumbel-sigmoid sampling gating opacity, scheduled through
none -> soft -> deterministic phases, with sparsity regularizers and optional
EMA tracking / importance scoring, then hard-pruned after training.

Reference parity map:
 - gumbel-sigmoid noise formula                    (:87-108)
 - phase schedule by iteration                     (:245-268)
 - exp temperature annealing temp_init->temp_final (:169-201)
 - regularizers kl / ada_kl / l1 / l1sq            (:286-308, 320-390)
 - EMA of mask probs + finalize to +/-10 logits    (:252-265)
 - importance score opacity*|L00*L11| on logits    (:146-167)
 - hard prune by sigmoid(logit) > threshold        (:126-144)
 - mask-logit param group at lr 0.005              (:65-77)

TPU-native notes: iteration-dependent phase logic is branchless (select over
the three mask variants) so a whole training chunk stays one compiled scan;
pruning happens host-side after training (the only dynamic-shape event).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gaussianimage_tpu.models.base import MaskConfig, TrainState
from gaussianimage_tpu.models.cholesky import GaussianImageCholesky


def gumbel_sigmoid(key, logits, temperature=0.5, hard=False, eps=1e-10):
    """sigmoid((logits + g)/T) with the reference's two-uniform logistic
    noise g = -log(log(u1+eps)/log(u2+eps) + eps); optional hard STE."""
    u1 = jax.random.uniform(key, logits.shape)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), logits.shape)
    noise = -jnp.log(jnp.log(u1 + eps) / jnp.log(u2 + eps) + eps)
    y_soft = jax.nn.sigmoid((logits + noise) / temperature)
    if hard:
        y_hard = (y_soft > 0.5).astype(y_soft.dtype)
        return y_soft + jax.lax.stop_gradient(y_hard - y_soft)
    return y_soft


class GaussianImageCholeskyMask(GaussianImageCholesky):
    # the learned mask modulates opacity; the fused prep kernel (opacity
    # hardcoded 1) would silently drop it — keep the generic paths
    fused_prep_ok = False
    # no reseeding: relocation fights the sparsity objective (the mask is
    # learning to KILL low-importance points, not move them), and victims'
    # _mask_logits rows would need re-opening
    reseed_ok = False
    name = "GaussianImage_Cholesky_wMask"

    @property
    def mask_cfg(self) -> MaskConfig:
        return self.cfg.mask or MaskConfig()

    @property
    def _lr_groups(self):
        return {"_mask_logits": self.mask_cfg.mask_lr}

    def init_params(self, key, gt_image=None):
        params = super().init_params(key, gt_image=gt_image)
        params["_mask_logits"] = jnp.full(
            (self.cfg.num_points, 1), self.mask_cfg.init_mask_logit,
            jnp.float32)
        return params

    def init_extra(self, params):
        extra = dict(super().init_extra(params))
        if self.mask_cfg.use_ema:
            extra["mask_ema"] = jax.nn.sigmoid(params["_mask_logits"])
        return extra

    # -- schedule ------------------------------------------------------------
    def phase(self, iteration):
        """0 = no mask, 1 = soft (gumbel), 2 = deterministic."""
        mc = self.mask_cfg
        it = jnp.asarray(iteration)
        return jnp.where(it < mc.start_mask_training, 0,
                         jnp.where(it < mc.stop_mask_training, 1, 2))

    def temperature(self, iteration):
        mc = self.mask_cfg
        if mc.temp_init <= mc.temp_final:  # no annealing / heating: constant
            return jnp.float32(mc.temp_init)
        duration = max(mc.stop_mask_training - mc.start_mask_training, 1)
        r = -math.log(mc.temp_final / mc.temp_init) / duration
        t = jnp.clip(jnp.asarray(iteration) - mc.start_mask_training,
                     0, duration).astype(jnp.float32)
        return jnp.maximum(mc.temp_final, mc.temp_init * jnp.exp(-r * t))

    def importance_score(self, params):
        chol = self.get_cholesky_elements(params)
        area = jnp.abs(chol[:, 0] * chol[:, 2])[:, None]  # |L00 * L22diag|
        return jax.lax.stop_gradient(area)  # opacity is fixed 1

    def mask_value(self, params, *, key, iteration):
        """[N, 1] mask for the current phase (branchless select)."""
        mc = self.mask_cfg
        logits = params["_mask_logits"]
        mask_input = logits * self.importance_score(params) if mc.use_score \
            else logits
        if key is None:
            key = jax.random.PRNGKey(0)
        temp = self.temperature(iteration)
        soft = gumbel_sigmoid(key, mask_input, temperature=temp, hard=False)
        det = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        ph = self.phase(iteration)
        return jnp.where(ph == 0, jnp.ones_like(soft),
                         jnp.where(ph == 1, soft, det))

    # -- rendering -----------------------------------------------------------
    def render(self, params, *, key: Optional[jax.Array] = None, iteration=0,
               extra=None, **kw):
        cfg = self.cfg
        mask = self.mask_value(params, key=key, iteration=iteration)
        opac = jnp.ones_like(mask) * mask
        img, alpha, aux, xys, radii = self._rasterize(
            self.get_xyz(params), self.get_cholesky_elements(params),
            self.get_features(params), opac)
        if not cfg.no_clamp:
            img = jnp.clip(img, 0.0, 1.0)
        return {
            "render": img.transpose(2, 0, 1)[None],
            "alpha_map": alpha[None, None],
            "final_opacities": opac,
            "xys": xys,
            "raster_aux": aux,
        }

    # -- loss with sparsity regularizers --------------------------------------
    fused_l2 = False  # forward depends on (iteration, key) via the mask

    def loss(self, params, gt_image, *, key=None, iteration=0, extra=None):
        loss, aux = super().loss(params, gt_image, key=key,
                                 iteration=iteration, extra=extra)
        mc = self.mask_cfg
        probs = jax.nn.sigmoid(params["_mask_logits"])
        if mc.reg_type == "kl":
            rho = jnp.clip(jnp.mean(probs), 1e-5, 1 - 1e-5)
            tgt = min(max(mc.target_sparsity, 1e-5), 1 - 1e-5)
            reg = (tgt * jnp.log(tgt / rho)
                   + (1 - tgt) * jnp.log((1 - tgt) / (1 - rho)))
        elif mc.reg_type == "ada_kl":
            reg = self._adaptive_kl(params, gt_image, probs, aux)
        elif mc.reg_type == "l1":
            reg = jnp.mean(probs)
        elif mc.reg_type == "l1sq":
            reg = jnp.mean(probs) ** 2
        else:
            raise ValueError(f"unknown reg_type {mc.reg_type}")
        # regularize only in the soft phase (reference :286)
        active = (self.phase(iteration) == 1).astype(jnp.float32)
        return loss + mc.lambda_reg * active * reg, aux

    def _adaptive_kl(self, params, gt_image, probs, aux, tile: int = 16,
                     sparsity_max: float = 0.9):
        """Per-tile KL with a target sparsity adapted to the GT tile's
        log-variance (reference calc_adaptive_sparsity_scatter, :320-390)."""
        mc = self.mask_cfg
        H, W = self.cfg.H, self.cfg.W
        ty, tx = H // tile, W // tile
        gt = gt_image.reshape(-1, H, W)[:, :ty * tile, :tx * tile]
        tiles = gt.reshape(-1, ty, tile, tx, tile).transpose(1, 3, 0, 2, 4)
        tile_var = jnp.var(tiles.reshape(ty * tx, -1), axis=1)
        logv = jnp.log(jnp.maximum(tile_var, 1e-6))
        c_min = logv.min()
        c_max = jnp.quantile(logv, 0.95)
        norm = jnp.clip((logv - c_min) / (c_max - c_min + 1e-5), 0.0, 1.0)
        target = jax.lax.stop_gradient(
            mc.target_sparsity + (sparsity_max - mc.target_sparsity) * norm)

        xys = jax.lax.stop_gradient(aux["pkg"]["xys"])
        ix = (xys[:, 0] / tile).astype(jnp.int32)
        iy = (xys[:, 1] / tile).astype(jnp.int32)
        on = (ix >= 0) & (ix < tx) & (iy >= 0) & (iy < ty)
        lin = jnp.where(on, iy * tx + ix, ty * tx)  # overflow bucket
        p = jnp.where(on, probs[:, 0], 0.0)
        sums = jax.ops.segment_sum(p, lin, num_segments=ty * tx + 1)[:-1]
        cnts = jax.ops.segment_sum(on.astype(jnp.float32), lin,
                                   num_segments=ty * tx + 1)[:-1]
        rho = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), target)
        rho = jnp.clip(rho, 1e-5, 1 - 1e-5)
        tgt = jnp.clip(target, 1e-5, 1 - 1e-5)
        kl = tgt * jnp.log(tgt / rho) + (1 - tgt) * jnp.log((1 - tgt) / (1 - rho))
        return jnp.mean(kl)

    # -- QAT / codec ------------------------------------------------------------
    def _quantized_splat(self, params, means, geo, colors):
        """QAT/codec splat with the deterministic mask folded into opacity
        (reference forward_quantize gates opacity with the mask,
        gaussianimage_cholesky_wMask.py:392-547). Without this, a
        fitted-but-unpruned model would quantize with every gaussian at
        opacity 1 and decode a different image than it trained."""
        xys, radii, conics, colors, _ = super()._quantized_splat(
            params, means, geo, colors)
        det = (jax.nn.sigmoid(params["_mask_logits"]) > 0.5).astype(
            jnp.float32)
        return xys, radii, conics, colors, det

    # -- run observability -----------------------------------------------------
    def step_metrics(self, params, extra):
        """Mask sparsity scalars, the subject of a wMask experiment
        (reference train.py:153-161: sparsity_hard = mean(prob > 0.5),
        sparsity_soft = mean(prob), num_points_active = N * hard)."""
        probs = jax.nn.sigmoid(params["_mask_logits"])
        hard = jnp.mean((probs > 0.5).astype(jnp.float32))
        n = params["_mask_logits"].shape[0]
        return {"sparsity_hard": hard,
                "sparsity_soft": jnp.mean(probs),
                "num_points_active": (hard * n).astype(jnp.int32)}

    # -- EMA + finalization ----------------------------------------------------
    def update_extra(self, extra, params, aux, iteration):
        mc = self.mask_cfg
        if not mc.use_ema:
            return extra
        probs = jax.nn.sigmoid(params["_mask_logits"])
        in_soft = self.phase(iteration) == 1
        ema = jnp.where(in_soft,
                        mc.ema_decay * extra["mask_ema"]
                        + (1 - mc.ema_decay) * probs,
                        extra["mask_ema"])
        return {**extra, "mask_ema": ema}

    def post_update(self, params, extra, iteration):
        mc = self.mask_cfg
        if not mc.use_ema:
            return params
        finalize = jnp.asarray(iteration) == mc.stop_mask_training
        final_logits = jnp.where(extra["mask_ema"] > 0.5, 10.0, -10.0)
        params = dict(params)
        params["_mask_logits"] = jnp.where(finalize, final_logits,
                                           params["_mask_logits"])
        return params

    # -- hard pruning (host-side, post-training) -------------------------------
    def prune_points(self, state: TrainState, threshold: float = 0.5
                     ) -> TrainState:
        import numpy as np

        probs = np.asarray(jax.nn.sigmoid(state.params["_mask_logits"]))[:, 0]
        keep = probs > threshold
        # only per-gaussian leaves shrink; global leaves (e.g. the learned
        # quantizer scale/beta, per-channel) pass through unchanged
        params = {k: (jnp.asarray(np.asarray(v)[keep])
                      if getattr(v, "shape", ())[:1] == (len(keep),) else v)
                  for k, v in state.params.items()}
        print(f"Pruned points: {len(keep)} to {int(keep.sum())} points.")
        opt = self._optimizer()
        extra = {k: (jnp.asarray(np.asarray(v)[keep])
                     if getattr(v, "shape", ())[:1] == (len(keep),) else v)
                 for k, v in state.extra.items()}
        return TrainState(params, opt.init(params), extra)
