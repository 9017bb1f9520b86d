"""Model base: functional model protocol + shared training-step machinery.

The reference couples model, optimizer and scheduler inside an nn.Module and
mutates them imperatively (gaussianimage_cholesky.py:51-55,101-124). The
TPU-native design is functional: a model object is a *static config* (hashable,
closed over by jit); all learnable state lives in a params pytree, optimizer
state in an optax state, and one jitted ``train_step`` advances both. A
``train_chunk`` scans K steps on device so the host syncs once per K
iterations instead of every iteration (the reference pays a device->host
``.item()`` sync per step, train.py:145).

Uniform trainer<->model protocol (fixing the reference's API drift noted in
SURVEY.md §3.5): every model implements init_params / render / loss_fn;
train_step/train_chunk are provided here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gaussianimage_tpu.opt import adan, step_lr
from gaussianimage_tpu.ops import RasterizeConfig
from gaussianimage_tpu.utils.losses import loss_fn as _loss_fn


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Learnable-pruning-mask options (reference fork's wMask model,
    gaussianimage_cholesky_wMask.py:24-58 / train.py:310-326)."""
    start_mask_training: int = 0
    stop_mask_training: int = 50000
    reg_type: str = "kl"  # kl | ada_kl | l1 | l1sq
    target_sparsity: float = 0.7
    lambda_reg: float = 0.005
    init_mask_logit: float = 2.0
    use_ema: bool = False
    use_score: bool = False
    temp_init: float = 0.5
    temp_final: float = 0.5
    ema_decay: float = 0.99
    mask_lr: float = 0.005


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_points: int
    H: int
    W: int
    block_h: int = 16
    block_w: int = 16
    loss_type: str = "L2"
    lambda_value: float = 0.7
    lr: float = 1e-3
    opt_type: str = "adan"  # "adan" | "adam"
    lr_step_size: int = 20000
    lr_gamma: float = 0.5
    quantize: bool = False
    no_clamp: bool = False
    init_mode: str = "uniform"  # "uniform" (reference) | "adaptive"
    #   (gradient-density position sampling + GT color init, core/init.py;
    #   requires init_state(key, gt_image=...))
    sh_degree: int = 3  # 3DGS only
    mask: Optional[MaskConfig] = None  # wMask variant only
    raster: RasterizeConfig = RasterizeConfig()

    @property
    def tile_bounds(self) -> Tuple[int, int, int]:
        return (-(-self.W // self.block_w), -(-self.H // self.block_h), 1)


class TrainState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: Any
    extra: Dict[str, jnp.ndarray]  # model-specific carried state (EMA, VQ, ...)


class GaussianModelBase:
    """Static model object. Subclasses define init_params / render / loss."""

    # the fused render+L2+backward pass (ops/rasterize_sum.py) is valid only
    # when splat() captures the ENTIRE forward; models whose forward depends
    # on iteration/key/extra (e.g. wMask's gumbel mask) must opt out
    fused_l2 = True

    # error-driven relocation support (core/reseed.py): models that opt in
    # provide importance(params) and relocated(params, victims, ...)
    reseed_ok = False

    def __init__(self, config: ModelConfig):
        self.cfg = config

    # -- subclass API ------------------------------------------------------
    def init_params(self, key: jax.Array, gt_image=None
                    ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def init_extra(self, params) -> Dict[str, jnp.ndarray]:
        return {}

    def render(self, params, *, key: Optional[jax.Array] = None,
               iteration: int | jnp.ndarray = 0, extra=None, **kw) -> Dict[str, Any]:
        raise NotImplementedError

    def render_fast(self, params) -> jnp.ndarray:
        """Inference-only render returning [1, 3, H, W] — the FPS-probe /
        serving entry. Default: the full render()'s image. Models may
        override with a faster non-differentiable pipeline producing the
        SAME image (e.g. the fused splat-prep kernel, ops/splat_prep.py)."""
        return self.render(params)["render"]

    def loss(self, params, gt_image, *, key=None, iteration=0, extra=None
             ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Returns (scalar loss, aux dict incl. 'render' and 'mse')."""
        if (self.cfg.loss_type == "L2" and self.fused_l2
                and not self.cfg.quantize and hasattr(self, "splat")):
            # canonical config: fused render+L2+backward in one Pallas pass
            # (numerically equal to loss_fn(clip(render), gt, "L2"))
            from gaussianimage_tpu.ops.rasterize_sum import (
                rasterize_gaussians_sum_l2)
            xys, radii, conics, colors, opac = self.splat(params)
            mse, raux = rasterize_gaussians_sum_l2(
                xys, conics, colors, opac, gt_image[0], self.cfg.H,
                self.cfg.W, radii=radii, config=self.cfg.raster,
                clamp=not self.cfg.no_clamp)
            return mse, {"mse": mse, "pkg": {"raster_aux": raux}}
        pkg = self.render(params, key=key, iteration=iteration, extra=extra)
        img = pkg["render"]
        loss = _loss_fn(img, gt_image, self.cfg.loss_type, self.cfg.lambda_value)
        mse = jnp.mean((img.astype(jnp.float32)
                        - gt_image.astype(jnp.float32)) ** 2)
        return loss, {"mse": mse, "render": img, "pkg": pkg}

    def update_extra(self, extra, params, aux, iteration):
        """Post-step carried-state update (EMA masks, VQ codebooks, ...)."""
        return extra

    def step_metrics(self, params, extra) -> Dict[str, jnp.ndarray]:
        """Extra per-step scalar metrics carried out of the training scan
        (e.g. wMask sparsity — reference train.py:153-161 logs
        sparsity_hard/soft + num_points_active every 100 iters)."""
        return {}

    def post_update(self, params, extra, iteration):
        """Post-step params rewrite hook (e.g. wMask logit finalization at the
        stop-mask iteration, reference gaussianimage_cholesky_wMask.py:259-265)."""
        return params

    # -- optimizer ---------------------------------------------------------
    def lr_schedule(self):
        return step_lr(self.cfg.lr, self.cfg.lr_step_size, self.cfg.lr_gamma)

    # -- training ----------------------------------------------------------
    def init_state(self, key: jax.Array, gt_image=None) -> TrainState:
        params = self.init_params(key, gt_image=gt_image)
        opt = self._optimizer()
        return TrainState(params, opt.init(params), self.init_extra(params))

    def _optimizer(self):
        sched = self.lr_schedule()
        # per-param LR groups (e.g. wMask mask logits at fixed 0.005,
        # reference gaussianimage_cholesky_wMask.py:65-77)
        labels_needed = getattr(self, "_lr_groups", None)
        if labels_needed:
            transforms = {}
            for name, lr_value in labels_needed.items():
                s = (sched if lr_value is None
                     else step_lr(lr_value, self.cfg.lr_step_size, self.cfg.lr_gamma))
                transforms[name] = (optax.adam(s) if self.cfg.opt_type == "adam"
                                    else adan(s))
            def label_fn(params):
                return {k: ("default" if k not in labels_needed else k)
                        for k in params}
            transforms.setdefault("default", optax.adam(sched)
                                  if self.cfg.opt_type == "adam" else adan(sched))
            return optax.multi_transform(transforms, label_fn)
        if self.cfg.opt_type == "adam":
            return optax.adam(sched)
        return adan(sched)

    def train_step(self, state: TrainState, gt_image, key=None,
                   iteration: jnp.ndarray | int = 0):
        """One optimization step. Returns (state, metrics dict of scalars)."""
        opt = self._optimizer()

        def loss_wrap(params):
            loss, aux = self.loss(params, gt_image, key=key,
                                  iteration=iteration, extra=state.extra)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_wrap, has_aux=True)(
            state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        extra = self.update_extra(state.extra, params, aux, iteration)
        params = self.post_update(params, extra, iteration)
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(aux["mse"], 1e-12))
        raux = aux.get("pkg", {}).get("raster_aux", None)
        n_dropped = (jnp.asarray(raux["n_dropped"], jnp.int32)
                     if raux is not None else jnp.int32(0))
        metrics = {"loss": loss, "psnr": psnr, "n_dropped": n_dropped}
        metrics.update(self.step_metrics(params, extra))
        return TrainState(params, opt_state, extra), metrics

    def train_chunk(self, state: TrainState, gt_image, key, start_iteration,
                    n_steps: int):
        """Scan ``n_steps`` train steps on device. Returns (state, metrics)
        with per-step ``loss``/``psnr`` arrays plus ``n_dropped_max``, the
        chunk's worst instance-stream overflow (so a fit that outgrows the
        stream cap warns during training, not just at final test)."""

        def body(carry, i):
            st, = carry
            k = (jax.random.fold_in(key, i) if key is not None else None)
            st, m = self.train_step(st, gt_image, key=k,
                                    iteration=start_iteration + i)
            return (st,), m

        (state,), ms = jax.lax.scan(body, (state,), jnp.arange(n_steps))
        metrics = {k: v for k, v in ms.items() if k != "n_dropped"}
        metrics["n_dropped_max"] = ms["n_dropped"].max()
        return state, metrics
