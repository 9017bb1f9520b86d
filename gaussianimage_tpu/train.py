"""Representation fitting trainer + CLI — the TPU counterpart of the
reference's train.py (SimpleTrainer2d / main, train.py:23-403).

Differences by design:
 - the 50k-iteration hot loop runs as jitted on-device scan *chunks*
   (models/base.py train_chunk), syncing metrics to host once per chunk
   instead of once per iteration;
 - artifacts keep the reference schema: per-image log dir with train.txt,
   gaussian_model checkpoint, and training.npy with identical keys
   (train.py:250-253) so downstream plotting ports over;
 - FPS probe: 100 forwards, wall clock / 100 (train.py:242-249).

Run:  python -m gaussianimage_tpu.train -d <dir> --data_name kodak \
        --model_name GaussianImage_Cholesky --num_points 10000 \
        --iterations 50000
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
from gaussianimage_tpu.utils import LogWriter, ms_ssim
from gaussianimage_tpu.utils.checkpoint import (
    load_checkpoint,
    load_train_state,
    merge_matching,
    save_checkpoint,
    save_train_state,
)
from gaussianimage_tpu.utils.image_io import save_image_array


def _colormap_viridis(x: np.ndarray) -> np.ndarray:
    """[H,W] in [0,1] -> [H,W,3] viridis-like heatmap (tiny fixed-stop
    linear colormap; avoids a matplotlib dependency in the train loop)."""
    stops = np.array([[0.267, 0.005, 0.329], [0.283, 0.141, 0.458],
                      [0.254, 0.265, 0.530], [0.207, 0.372, 0.553],
                      [0.164, 0.471, 0.558], [0.128, 0.567, 0.551],
                      [0.135, 0.659, 0.518], [0.267, 0.749, 0.441],
                      [0.478, 0.821, 0.318], [0.741, 0.873, 0.150],
                      [0.993, 0.906, 0.144]], np.float32)
    x = np.clip(x, 0.0, 1.0) * (len(stops) - 1)
    i = np.minimum(x.astype(np.int32), len(stops) - 2)
    f = (x - i)[..., None]
    return stops[i] * (1 - f) + stops[i + 1] * f


class SimpleTrainer2d:
    """Fits one image with 2D Gaussians."""

    def __init__(self, gt_image: np.ndarray, image_name: str,
                 num_points: int = 2000,
                 model_name: str = "GaussianImage_Cholesky",
                 iterations: int = 30000, model_path=None, args=None,
                 log_dir: Path | None = None, chunk_size: int = 250):
        # shape bucketing: pad H/W up to a multiple so variable-size
        # datasets (DIV2K) reuse a few compiled executables instead of one
        # ~40s TPU compile per distinct image size. Edge-replicate padding
        # keeps the fit natural; metrics/artifacts use the cropped region.
        bucket = int(getattr(args, "shape_bucket", 0) or 0)
        self.crop_h = int(gt_image.shape[2])
        self.crop_w = int(gt_image.shape[3])
        if bucket > 1:
            ph = (-self.crop_h) % bucket
            pw = (-self.crop_w) % bucket
            if ph or pw:
                gt_image = np.pad(gt_image, ((0, 0), (0, 0), (0, ph), (0, pw)),
                                  mode="edge")
        self.gt_image = jnp.asarray(gt_image, jnp.float32)  # [1,3,H,W]
        self.image_name = image_name
        self.num_points = num_points
        self.iterations = iterations
        self.chunk_size = min(chunk_size, iterations) if iterations else chunk_size
        self.H, self.W = int(gt_image.shape[2]), int(gt_image.shape[3])
        self.save_imgs = bool(getattr(args, "save_imgs", False))
        self.profile_dir = getattr(args, "profile", None)
        self.model_name = model_name

        mask_cfg = None
        if model_name == "GaussianImage_Cholesky_wMask":
            from gaussianimage_tpu.models.base import MaskConfig
            kw = {f: getattr(args, f)
                  for f in ("start_mask_training", "stop_mask_training",
                            "reg_type", "target_sparsity", "lambda_reg",
                            "init_mask_logit", "use_ema", "use_score",
                            "temp_init", "temp_final")
                  if hasattr(args, f)}
            mask_cfg = MaskConfig(**kw)
        loss_type = "Fusion2" if model_name == "3DGS" else "L2"
        self.model = make_model(
            model_name,
            num_points=num_points, H=self.H, W=self.W,
            loss_type=loss_type,
            lr=getattr(args, "lr", 1e-3),
            opt_type=getattr(args, "opt_type", "adan"),
            no_clamp=bool(getattr(args, "no_clamp", False)),
            sh_degree=getattr(args, "sh_degree", 3),
            quantize=False,
            mask=mask_cfg,
            init_mode=getattr(args, "init_mode", "adaptive"),
        )

        self.log_dir = Path(log_dir) if log_dir is not None else Path(
            f"./checkpoints/run/{model_name}_{iterations}_{num_points}/{image_name}")
        self.logwriter = LogWriter(self.log_dir)

        seed = int(getattr(args, "seed", 1) or 1)
        self.key = jax.random.PRNGKey(seed)
        self.state = self.model.init_state(self.key, gt_image=self.gt_image)

        if model_path is not None:
            self.logwriter.write(f"loading model path:{model_path}")
            ckpt = load_checkpoint(model_path)
            params = merge_matching(self.state.params, ckpt["params"])
            self.state = self.state._replace(params=params)

        # mid-fit resume (periodic snapshots every ckpt_every iterations;
        # SURVEY §5 failure-detection row — a crash at iter 49k must not
        # lose the fit)
        self.ckpt_every = int(getattr(args, "ckpt_every", 10000) or 0)
        self.start_iter = 0
        self._hist = {"iter": [], "loss": [], "psnr": []}
        resume_path = self.log_dir / "resume.npz"
        if bool(getattr(args, "resume", False)) and resume_path.exists():
            self.state, self.start_iter, aux = load_train_state(
                resume_path, self.state)
            if "key" in aux:
                self.key = jnp.asarray(aux["key"], dtype=self.key.dtype)
            for k in self._hist:
                if f"hist_{k}" in aux:
                    self._hist[k] = np.asarray(aux[f"hist_{k}"]).tolist()
            self.logwriter.write(
                f"resumed from {resume_path} at iteration {self.start_iter}")

        self._chunk_fn = jax.jit(
            lambda st, gt, key, start: self.model.train_chunk(
                st, gt, key, start, self.chunk_size),
            donate_argnums=(0,))
        # error-driven relocation rounds (core/reseed.py, pure addition over
        # the reference): on by default for reseed-capable models on fresh
        # (non-warm-start) fits; --no_reseed restores reference behavior
        self._reseed_iters = ()
        if (self.model.reseed_ok and model_path is None
                and not bool(getattr(args, "no_reseed", False))):
            from gaussianimage_tpu.core.reseed import (default_schedule,
                                                       reseed_state)
            rounds = int(getattr(args, "reseed_rounds", 6) or 0)
            frac = float(getattr(args, "reseed_frac", 0.05) or 0.0)
            if rounds > 0 and frac > 0:
                self._reseed_iters = default_schedule(iterations,
                                                      rounds=rounds)
                self._reseed_seed = seed
                self._reseed_fn = jax.jit(
                    lambda st, gt, key: reseed_state(
                        self.model, st, gt, key, frac=frac),
                    donate_argnums=(0,))
        # eval renders use a huge iteration so phase-scheduled models (wMask)
        # take their deterministic branch
        self._render_fn = jax.jit(
            lambda params: self.model.render(
                params, iteration=jnp.asarray(1 << 30))["render"])
        self._viz_fn = jax.jit(
            lambda params: self.model.render(
                params, iteration=jnp.asarray(1 << 30), render_viz=True))
        self.log_every = int(getattr(args, "log_every", 100) or 0)
        self.viz_every = int(getattr(args, "viz_every", 5000) or 0)
        self._wandb = None
        if bool(getattr(args, "wandb", False)):
            try:
                import wandb  # optional; scalars/images mirror the jsonl/png
                self._wandb = wandb.init(
                    project=getattr(args, "wandb_project", "gaussianimage_tpu"),
                    name=f"{self.model_name}_{num_points}_{image_name}",
                    reinit=True)
            except Exception as e:  # no wandb in env: jsonl/png remain
                self.logwriter.write(f"wandb unavailable ({e}); file logging only")

    # -- run observability (reference train.py:147-221 wandb logging) --------
    def _log_scalars(self, it0, losses, psnrs, n, extra_series=None):
        """Append every ``log_every``-th step to scalars.jsonl (machine
        readable, one JSON object per line) like the reference logs scalars
        to wandb every 100 iterations. ``extra_series`` carries model-
        specific per-step arrays (wMask sparsity_hard/soft +
        num_points_active, reference train.py:153-161)."""
        if not self.log_every:
            return
        import json
        with open(self.log_dir / "scalars.jsonl", "a") as fh:
            for j in range(n):
                step = it0 + j + 1
                if step % self.log_every == 0 or step == 1:
                    rec = {"iteration": step, "loss": float(losses[j]),
                           "psnr": float(psnrs[j])}
                    for k, v in (extra_series or {}).items():
                        rec[k] = (int(v[j]) if np.issubdtype(
                            np.asarray(v[j]).dtype, np.integer)
                            else float(v[j]))
                    fh.write(json.dumps(rec) + "\n")
                    if self._wandb is not None:
                        self._wandb.log(rec, step=step)

    def _dump_viz(self, it):
        """Render + alpha heatmap + gaussian viz + center overlay PNGs
        (the reference's every-5000-iter wandb images, train.py:147-221)."""
        out = self._viz_fn(self.state.params)
        viz_dir = self.log_dir / "viz"
        viz_dir.mkdir(parents=True, exist_ok=True)
        render = np.asarray(out["render"])[..., :self.crop_h, :self.crop_w]
        save_image_array(render, viz_dir / f"iter_{it:06d}_render.png")
        alpha = np.asarray(out["alpha_map"])[0, 0, :self.crop_h, :self.crop_w]
        amax = max(float(alpha.max()), 1e-6)
        heat = _colormap_viridis(alpha / amax)
        save_image_array(heat.transpose(2, 0, 1)[None],
                         viz_dir / f"iter_{it:06d}_alpha.png")
        if "gauss_render" in out:
            save_image_array(
                np.asarray(out["gauss_render"])[..., :self.crop_h, :self.crop_w],
                viz_dir / f"iter_{it:06d}_gauss.png")
        if "xys" in out:
            overlay = render[0].transpose(1, 2, 0).copy()
            xy = np.asarray(out["xys"]).astype(np.int32)
            ok = ((xy[:, 0] >= 0) & (xy[:, 0] < overlay.shape[1])
                  & (xy[:, 1] >= 0) & (xy[:, 1] < overlay.shape[0]))
            overlay[xy[ok, 1], xy[ok, 0]] = np.array([1.0, 0.0, 0.0])
            save_image_array(overlay.transpose(2, 0, 1)[None],
                             viz_dir / f"iter_{it:06d}_overlay.png")
        if self._wandb is not None:
            import wandb
            self._wandb.log({"render": wandb.Image(
                render[0].transpose(1, 2, 0))}, step=it)

    def train(self):
        from tqdm import tqdm

        iter_list = self._hist["iter"]
        loss_list = self._hist["loss"]
        psnr_list = self._hist["psnr"]
        start_time = time.time()
        it = self.start_iter  # nonzero after --resume
        key = self.key
        profile_dir = self.profile_dir
        warned_overflow = False
        pbar = tqdm(total=self.iterations, initial=it, desc=self.image_name,
                    unit="it", dynamic_ncols=True,
                    disable=not sys.stderr.isatty())
        # relocation rounds fire at the first chunk boundary >= each
        # scheduled iteration; keys fold the SEED and the boundary (not the
        # evolving chunk key), so --resume (always at a boundary) replays
        # the same rounds the uninterrupted run would have executed
        cs = self.chunk_size
        reseed_bounds = sorted({-(-r // cs) * cs for r in self._reseed_iters
                                if -(-r // cs) * cs < self.iterations})
        while it < self.iterations:
            if it in reseed_bounds:
                self.state = self._reseed_fn(
                    self.state, self.gt_image,
                    jax.random.fold_in(
                        jax.random.PRNGKey(self._reseed_seed + 17), it))
            tracing = profile_dir and (
                it == self.chunk_size
                or (it == 0 and self.iterations <= self.chunk_size))
            key, sub = jax.random.split(key)
            if tracing:
                profile_dir, this_dir = None, profile_dir
                # trace the second chunk (first is compile) + a few renders;
                # device-side op durations in the trace are the only honest
                # timings on the axon runtime (see .claude/skills/verify)
                with jax.profiler.trace(str(this_dir)):
                    self.state, metrics = self._chunk_fn(
                        self.state, self.gt_image, sub, jnp.asarray(it + 1))
                    for _ in range(10):
                        img = self._render_fn(self.state.params)
                    jax.block_until_ready(img)
                    time.sleep(4)  # let the device queue drain inside the trace
                self.logwriter.write(f"profiler trace written to {this_dir}")
            else:
                self.state, metrics = self._chunk_fn(
                    self.state, self.gt_image, sub, jnp.asarray(it + 1))
            losses = np.asarray(metrics["loss"])
            psnrs = np.asarray(metrics["psnr"])
            n = min(self.chunk_size, self.iterations - it)
            loss_list.extend(losses[:n].tolist())
            psnr_list.extend(psnrs[:n].tolist())
            iter_list.extend(range(it + 1, it + n + 1))
            extra_series = {
                k: np.asarray(v) for k, v in metrics.items()
                if k not in ("loss", "psnr", "n_dropped_max")}
            self._log_scalars(it, losses, psnrs, n, extra_series)
            it += n
            pbar.update(n)
            pbar.set_postfix(loss=f"{losses[n-1]:.5f}",
                             psnr=f"{psnrs[n-1]:.2f}")
            # per-chunk overflow monitoring: a fit that outgrows the
            # instance-stream cap must warn NOW, not at final test
            nd = int(np.asarray(metrics["n_dropped_max"]))
            if nd > 0 and not warned_overflow:
                warned_overflow = True
                self.logwriter.write(
                    f"WARNING: iter {it}: rasterizer dropped up to {nd} "
                    "gaussian-tile instances this chunk (raise "
                    "RasterizeConfig.max_instances / max_tiles_per_gauss)")
            if it % 5000 < self.chunk_size:
                self.logwriter.write(
                    f"iter {it}: loss {losses[n-1]:.7f} psnr {psnrs[n-1]:.4f}")
            if self.viz_every and (it % self.viz_every < self.chunk_size
                                   or it >= self.iterations):
                self._dump_viz(it)
            if (self.ckpt_every and it < self.iterations
                    and it % self.ckpt_every < self.chunk_size):
                save_train_state(
                    self.log_dir / "resume.npz", self.state, it,
                    {"key": np.asarray(key),
                     "hist_iter": np.asarray(iter_list),
                     "hist_loss": np.asarray(loss_list),
                     "hist_psnr": np.asarray(psnr_list)})
        pbar.close()
        end_time = time.time() - start_time

        if hasattr(self.model, "prune_points"):
            self.state = self.model.prune_points(self.state, threshold=0.5)

        psnr_value, ms_ssim_value, num_points_final = self.test()

        # FPS probe: 100 full renders in ONE rolled scan, each on sub-ulp-
        # perturbed params (no folding), synced once at the end — the
        # reference's 100-forward loop (train.py:242-249) under CUDA's
        # async launch queue; per-call sync dispatch on this runtime would
        # otherwise bill ~0.5 ms/frame of launch tax
        def _fps_burst(p):
            def body(acc, i):
                q = dict(p)
                q["_xyz"] = q["_xyz"] + 1e-30 * i.astype(jnp.float32)
                img = self.model.render(q, iteration=jnp.asarray(1 << 30)
                                        )["render"]
                return acc + img[0, 0, 0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(1, 101, dtype=jnp.int32))
            return acc

        bfn = jax.jit(_fps_burst)
        r = bfn(self.state.params)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(2):
            r = bfn(self.state.params)
        jax.block_until_ready(r)
        test_end_time = (time.time() - t0) / 200

        self.logwriter.write(
            "Training Complete in {:.4f}s, Eval time:{:.8f}s, FPS:{:.4f}".format(
                end_time, test_end_time, 1 / test_end_time))
        save_checkpoint(self.log_dir / "gaussian_model.npz",
                        self.state.params, self.state.extra)
        np.save(self.log_dir / "training.npy",
                {"iterations": iter_list, "training_psnr": psnr_list,
                 "training_time": end_time, "psnr": psnr_value,
                 "ms-ssim": ms_ssim_value, "rendering_time": test_end_time,
                 "rendering_fps": 1 / test_end_time,
                 "initial_points": self.num_points,
                 "final_points": num_points_final})
        return (psnr_value, ms_ssim_value, end_time, test_end_time,
                1 / test_end_time)

    def _cropped(self, out):
        return (out[..., :self.crop_h, :self.crop_w],
                self.gt_image[..., :self.crop_h, :self.crop_w])

    def test(self):
        # surface binning overflow: truncated instance streams silently cut
        # gaussian coverage, so warn loudly if the fitted scene overflows
        full = jax.jit(lambda p: self.model.render(
            p, iteration=jnp.asarray(1 << 30)))(self.state.params)
        aux = full.get("raster_aux", {})
        if aux and int(np.asarray(aux.get("n_dropped", 0))) > 0:
            self.logwriter.write(
                "WARNING: rasterizer dropped {} gaussian-tile instances "
                "(raise RasterizeConfig.max_instances / max_tiles_per_gauss)"
                .format(int(np.asarray(aux["n_dropped"]))))
        out, gt = self._cropped(self._render_fn(self.state.params))
        mse = float(jnp.mean((out.astype(jnp.float32)
                              - gt.astype(jnp.float32)) ** 2))
        psnr = 10 * math.log10(1.0 / max(mse, 1e-12))
        # MS-SSIM needs >= 161px per side (5 scales x 11-tap window);
        # fall back to single-scale SSIM on smaller test images
        if min(self.crop_h, self.crop_w) >= 161:
            msv = float(ms_ssim(out, gt, data_range=1.0))
        else:
            from gaussianimage_tpu.utils import ssim
            msv = float(ssim(out, gt, data_range=1.0))
        num_points_final = int(self.state.params["_xyz"].shape[0])
        self.logwriter.write(
            "Test PSNR:{:.4f}, MS_SSIM:{:.6f}, Final_points:{:d}".format(
                psnr, msv, num_points_final))
        if self.save_imgs:
            save_image_array(np.asarray(out),
                             self.log_dir / f"{self.image_name}_fitting.png")
        return psnr, msv, num_points_final


def parse_args(argv):
    p = argparse.ArgumentParser(description="GaussianImage-TPU fitting")
    p.add_argument("-d", "--dataset", type=str, default="./datasets/kodak/")
    p.add_argument("--data_name", type=str, default="kodak")
    p.add_argument("--iterations", type=int, default=50000)
    p.add_argument("--model_name", type=str, default="GaussianImage_Cholesky")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--num_points", type=int, default=50000)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--save_imgs", action="store_true")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--opt_type", type=str, default="adan")
    p.add_argument("--init_mode", type=str, default="adaptive",
                   choices=["uniform", "adaptive"],
                   help="Gaussian init: 'uniform' random (reference "
                        "behavior) or 'adaptive' GT-gradient-density "
                        "positions + GT colors (core/init.py)")
    p.add_argument("--chunk_size", type=int, default=250,
                   help="train iterations per on-device scan chunk. NOTE: "
                        "relocation rounds (core/reseed.py) fire at the "
                        "first chunk BOUNDARY >= each scheduled iteration, "
                        "so a nonstandard chunk size shifts the reseed "
                        "ladder accordingly (the schedule's evidence base "
                        "is the default 250/500-boundary grid)")
    p.add_argument("--checkpoint_root", type=str, default="./checkpoints")
    p.add_argument("--ckpt_every", type=int, default=10000,
                   help="save a mid-fit resume snapshot (params + optimizer "
                        "+ PRNG key + history) every N iterations; 0 = off")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted fit from the image's "
                        "resume.npz snapshot if present")
    p.add_argument("--shape_bucket", type=int, default=0,
                   help="pad images up to a multiple of this many pixels so "
                        "variable-size datasets share compiled executables "
                        "(metrics use the original crop); 0 = off")
    p.add_argument("--profile", type=str, default=None,
                   help="directory for a jax.profiler trace of one training "
                        "chunk + renders (device-side timings)")
    p.add_argument("--log_every", type=int, default=100,
                   help="append loss/psnr to scalars.jsonl every N iters "
                        "(reference logs scalars every 100); 0 = off")
    p.add_argument("--viz_every", type=int, default=5000,
                   help="dump render/alpha-heatmap/gaussian-viz/center-"
                        "overlay PNGs every N iters (reference wandb images "
                        "every 5000); 0 = off")
    p.add_argument("--wandb", action="store_true",
                   help="mirror scalars/images to wandb if installed")
    p.add_argument("--wandb_project", type=str, default="gaussianimage_tpu")
    # wMask options (reference train.py:310-326)
    p.add_argument("--start_mask_training", type=int, default=0)
    p.add_argument("--stop_mask_training", type=int, default=50000)
    p.add_argument("--reg_type", type=str, default="kl")
    p.add_argument("--target_sparsity", type=float, default=0.7)
    p.add_argument("--lambda_reg", type=float, default=0.005)
    p.add_argument("--no_reseed", action="store_true",
                   help="disable error-driven relocation rounds "
                        "(core/reseed.py; reference behavior)")
    p.add_argument("--reseed_rounds", type=int, default=6)
    p.add_argument("--reseed_frac", type=float, default=0.05)
    p.add_argument("--init_mask_logit", type=float, default=2.0)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--use_score", action="store_true")
    p.add_argument("--no_clamp", action="store_true")
    p.add_argument("--temp_init", type=float, default=0.5)
    p.add_argument("--temp_final", type=float, default=0.5)
    return p.parse_args(argv)


def main(argv):
    args = parse_args(argv)
    folder = f"{args.model_name}_{args.iterations}_{args.num_points}"
    root = Path(args.checkpoint_root) / args.data_name / folder
    logwriter = LogWriter(root)

    stats = []
    image_h = image_w = 0
    count = 0
    for image_name, img in iterate_dataset(args.data_name, args.dataset):
        trainer = SimpleTrainer2d(
            img, image_name, num_points=args.num_points,
            iterations=args.iterations, model_name=args.model_name,
            model_path=args.model_path, args=args,
            log_dir=root / image_name, chunk_size=args.chunk_size)
        psnr, msv, ttime, etime, fps = trainer.train()
        stats.append((psnr, msv, ttime, etime, fps))
        image_h += trainer.H
        image_w += trainer.W
        count += 1
        logwriter.write(
            "{}: {}x{}, PSNR:{:.4f}, MS-SSIM:{:.4f}, Training:{:.4f}s, "
            "Eval:{:.8f}s, FPS:{:.4f}".format(
                image_name, trainer.H, trainer.W, psnr, msv, ttime, etime, fps))
    arr = np.asarray(stats)
    logwriter.write(
        "Average: {}x{}, PSNR:{:.4f}, MS-SSIM:{:.4f}, Training:{:.4f}s, "
        "Eval:{:.8f}s, FPS:{:.4f}".format(
            image_h // count, image_w // count, *arr.mean(axis=0)))


if __name__ == "__main__":
    main(sys.argv[1:])
