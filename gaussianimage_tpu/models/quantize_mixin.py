"""Quantization-aware-training + codec support shared by the 2D models.

Mirrors the reference's QAT contract (gaussianimage_cholesky.py:126-283,
gaussianimage_rs.py:97-273):
 - fp16 STE fake-quant on _xyz, learned 6-bit uniform quant on covariance
   params, residual-VQ (codebook 8, 2 layers) on colors
 - unit_bit accounting [m_bit, s_bit, r_bit, c_bit]; train-time bits are the
   fixed parts only, eval-time bits use a real ANS compression probe
 - compress/decompress with and without entropy coding; analysis with bpp
   breakdown (keys: bpp, position_bpp, cholesky_bpp, feature_dc_bpp)

Functional layout: the learned quantizer scale/beta live in params (trained
jointly, like the reference's nn.Parameters); VQ codebooks/EMA state live in
TrainState.extra and are updated through the jitted step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.codec import (
    ResidualVQ,
    UniformQuantizer,
    UniformQuantizerState,
    fake_quantize_half,
)
from gaussianimage_tpu.codec.bitstream import (
    compress_categorical,
    decompress_categorical,
    np_bits,
)

VQ_SPEC = dict(dim=3, codebook_size=8, num_quantizers=2, kmeans_iters=5,
               decay=0.8, commitment_weight=1.0)


class QuantizeMixin:
    """Requires: self.cfg, get_xyz/get_features, and the hooks
    _uq_channels() / _uq_raw_values(params) /
    _rasterize_quantized(params, means, geo, colors)."""

    # ---- quantizer objects (stateless; state lives in params/extra) -----
    @property
    def features_vq(self) -> ResidualVQ:
        return ResidualVQ(**VQ_SPEC)

    def _uq(self, name: str) -> UniformQuantizer:
        return UniformQuantizer(bits=6, num_channels=self._uq_channels()[name])

    def _uq_state(self, params, name: str) -> UniformQuantizerState:
        return UniformQuantizerState(params[f"{name}_quant_scale"],
                                     params[f"{name}_quant_beta"])

    def quantize_param_init(self) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, ch in self._uq_channels().items():
            st = UniformQuantizer(bits=6, num_channels=ch).init_state()
            out[f"{name}_quant_scale"] = st.scale
            out[f"{name}_quant_beta"] = st.beta
        return out

    def init_extra(self, params):
        extra = dict(super().init_extra(params))
        if self.cfg.quantize:
            extra["vq"] = self.features_vq.init_state()
        return extra

    def init_quantizer_data(self, state):
        """The two-stage warm-start hook: set uniform-quantizer ranges from
        the loaded weights (reference model._init_data, called at
        train_quantize.py:59). Also k-means-initializes the VQ codebooks
        from the loaded colors so eval-before-training renders sensibly
        (lazily-initialized codebooks are all-zero until the first step).
        """
        params = dict(state.params)
        for name, raw in self._uq_raw_values(params).items():
            st = self._uq(name).init_from_data(raw)
            params[f"{name}_quant_scale"] = st.scale
            params[f"{name}_quant_beta"] = st.beta
        extra = dict(state.extra)
        if "vq" in extra:
            import jax as _jax
            extra["vq"] = self.features_vq._kmeans_init(
                _jax.random.PRNGKey(0),
                _jax.lax.stop_gradient(self.get_features(params)))
        return state._replace(params=params, extra=extra)

    # ---- QAT forward -----------------------------------------------------
    def quantized_splat_inputs(self, params, extra, *, training=True,
                               key=None):
        """Returns (quantized geometry dict, colors, vq_loss, new_vq_state)."""
        geo = {}
        for name, raw in self._uq_raw_values(params).items():
            geo[name] = self._uq(name)(self._uq_state(params, name), raw)
        means = jnp.tanh(fake_quantize_half(params["_xyz"]))
        colors, _, vq_loss, vq_state = self.features_vq(
            extra["vq"], self.get_features(params), training=training, key=key)
        return means, geo, colors, vq_loss, vq_state

    def render_quantize(self, params, *, extra, key=None, training=True, **kw):
        means, geo, colors, vq_loss, vq_state = self.quantized_splat_inputs(
            params, extra, training=training, key=key)
        img, alpha, aux = self._rasterize_quantized(params, means, geo, colors)
        img = jnp.clip(img, 0.0, 1.0)
        N = params["_xyz"].shape[0]
        return {
            "render": img.transpose(2, 0, 1)[None],
            "alpha_map": alpha[None, None],
            "vq_loss": vq_loss,
            "vq_state": vq_state,
            "raster_aux": aux,
            # train-time fixed bit terms (reference :127,131 — quantizer
            # bits are 0 during training)
            "unit_bit": [16 * N * 2, 0, 0, 0],
        }

    def loss(self, params, gt_image, *, key=None, iteration=0, extra=None):
        # reference keeps plain forward() available even when quantize=True;
        # only the training loss switches to the QAT path
        # (train_iter_quantize, gaussianimage_cholesky.py:141-152)
        if not self.cfg.quantize:
            return super().loss(params, gt_image, key=key,
                                iteration=iteration, extra=extra)
        from gaussianimage_tpu.utils.losses import loss_fn as _lf

        pkg = self.render_quantize(params, extra=extra, key=key, training=True)
        img = pkg["render"]
        loss = _lf(img, gt_image, self.cfg.loss_type, self.cfg.lambda_value)
        loss = loss + pkg["vq_loss"]
        mse = jnp.mean((img.astype(jnp.float32)
                        - gt_image.astype(jnp.float32)) ** 2)
        return loss, {"mse": mse, "render": img, "pkg": pkg}

    def update_extra(self, extra, params, aux, iteration):
        extra = super().update_extra(extra, params, aux, iteration)
        if self.cfg.quantize and "vq_state" in aux.get("pkg", {}):
            extra = {**extra, "vq": aux["pkg"]["vq_state"]}
        return extra

    # ---- codec (host-side) -------------------------------------------------
    def compress_wo_ec(self, params, extra) -> Dict[str, np.ndarray]:
        """Integer/float16 code arrays, no bitstream (reference :154-159)."""
        out = {"xyz": np.asarray(params["_xyz"], np.float16)}
        for name, raw in self._uq_raw_values(params).items():
            codes, _ = self._uq(name).compress(self._uq_state(params, name), raw)
            out[f"quant_{name}"] = np.asarray(codes, np.int32)
        _, idx = self.features_vq.compress(extra["vq"],
                                           self.get_features(params))
        out["feature_dc_index"] = np.asarray(idx, np.int32)
        return out

    def dequantize_wo_ec(self, params, extra, enc: Dict):
        """Code arrays -> (means, geo dict, colors) on device — the decode
        path's dequantization front half (shared by single and batched
        decode)."""
        means = jnp.tanh(jnp.asarray(enc["xyz"], jnp.float32))
        geo = {}
        for name in self._uq_channels():
            geo[name] = self._uq(name).decompress(
                self._uq_state(params, name),
                jnp.asarray(enc[f"quant_{name}"], jnp.float32))
        colors = self.features_vq.decompress(
            extra["vq"], jnp.asarray(enc["feature_dc_index"]))
        return means, geo, colors

    def decompress_wo_ec(self, params, extra, enc: Dict) -> Dict:
        means, geo, colors = self.dequantize_wo_ec(params, extra, enc)
        img, alpha, aux = self._rasterize_quantized(params, means, geo,
                                                    colors)
        img = jnp.clip(img, 0.0, 1.0)
        return {"render": img.transpose(2, 0, 1)[None], "raster_aux": aux}

    def compress(self, params, extra) -> Dict:
        """With rANS entropy coding (reference :210-219)."""
        enc = self.compress_wo_ec(params, extra)
        for name in self._uq_channels():
            enc[f"{name}_bitstream"] = compress_categorical(
                enc[f"quant_{name}"])
        enc["feature_dc_bitstream"] = compress_categorical(
            enc["feature_dc_index"])
        return enc

    def entropy_decode(self, enc: Dict) -> Dict:
        """Host-side rANS decode of the bitstreams back to code arrays —
        the CPU half of the full entropy-coded decode path (the device half
        is decompress_wo_ec). Split out so callers can jit the device half
        and time the two honestly."""
        N = enc["xyz"].shape[0]
        dec = {"xyz": enc["xyz"]}
        for name, ch in self._uq_channels().items():
            words, counts, uniq = enc[f"{name}_bitstream"]
            dec[f"quant_{name}"] = decompress_categorical(
                words, counts, uniq, N * ch, (N, ch))
        nq = self.features_vq.num_quantizers
        words, counts, uniq = enc["feature_dc_bitstream"]
        dec["feature_dc_index"] = decompress_categorical(
            words, counts, uniq, N * nq, (N, nq))
        return dec

    def decompress(self, params, extra, enc: Dict) -> Dict:
        return self.decompress_wo_ec(params, extra, self.entropy_decode(enc))

    # ---- bit accounting ------------------------------------------------------
    def _codebook_bits(self, extra) -> int:
        return np_bits(np.asarray(extra["vq"].embed))

    def _uq_side_bits(self, params, name) -> int:
        return (np_bits(np.asarray(params[f"{name}_quant_scale"]))
                + np_bits(np.asarray(params[f"{name}_quant_beta"])))

    def measure_unit_bits(self, params, extra) -> Tuple[int, int, int, int]:
        """Eval-time [m_bit, s_bit, r_bit, c_bit] with a real ANS probe
        (reference UniformQuantizer.size / VectorQuantizer.size)."""
        N = params["_xyz"].shape[0]
        m_bit = 16 * N * 2
        s_bit = r_bit = 0
        for name in self._uq_channels():
            raw = self._uq_raw_values(params)[name]
            codes, _ = self._uq(name).compress(self._uq_state(params, name), raw)
            words, counts, uniq = compress_categorical(np.asarray(codes, np.int32))
            bits = (np_bits(words) + np_bits(counts) + np_bits(uniq)
                    + self._uq_side_bits(params, name))
            if name == "rotation":
                r_bit += bits
            else:
                s_bit += bits
        _, idx = self.features_vq.compress(extra["vq"], self.get_features(params))
        words, counts, uniq = compress_categorical(np.asarray(idx, np.int32))
        c_bit = (self._codebook_bits(extra) + np_bits(words) + np_bits(counts)
                 + np_bits(uniq))
        return m_bit, s_bit, r_bit, c_bit

    def analysis_wo_ec(self, params, extra, enc: Dict) -> Dict[str, float]:
        """bpp breakdown, codes at fixed 6 bits and index at ceil(log2(max))
        bits (reference :174-208; the all-zero-index edge case yields
        max_bit=0 there — we floor at 1 bit)."""
        H, W = self.cfg.H, self.cfg.W
        N = params["_xyz"].shape[0]
        position_bits = N * 2 * 16
        per_name = {
            name: (self._uq_side_bits(params, name)
                   + np.asarray(enc[f"quant_{name}"]).size * 6)
            for name in self._uq_channels()}
        cov_bits = sum(per_name.values())
        idx = np.asarray(enc["feature_dc_index"])
        max_bit = max(int(np.ceil(np.log2(max(idx.max(), 1) + 1e-9))), 1)
        feature_bits = self._codebook_bits(extra) + idx.size * max_bit
        total = position_bits + cov_bits + feature_bits
        out = {"bpp": total / H / W,
               "position_bpp": position_bits / H / W,
               "cholesky_bpp": cov_bits / H / W,
               "feature_dc_bpp": feature_bits / H / W}
        # per-component covariance keys (the RS reference reports separate
        # scaling_bpp / rotation_bpp, gaussianimage_rs.py:186-192)
        for name, bits in per_name.items():
            out.setdefault(f"{name}_bpp", bits / H / W)
        return out

    def analysis(self, params, extra, enc: Dict) -> Dict[str, float]:
        """bpp with the real entropy-coded stream sizes (reference :242-283)."""
        H, W = self.cfg.H, self.cfg.W
        N = params["_xyz"].shape[0]
        position_bits = N * 2 * 16
        per_name = {}
        for name in self._uq_channels():
            words, counts, uniq = compress_categorical(
                np.asarray(enc[f"quant_{name}"], np.int32))
            per_name[name] = (self._uq_side_bits(params, name)
                              + np_bits(words) + np_bits(counts)
                              + np_bits(uniq))
        cov_bits = sum(per_name.values())
        words, counts, uniq = compress_categorical(
            np.asarray(enc["feature_dc_index"], np.int32))
        feature_bits = (self._codebook_bits(extra) + np_bits(words)
                        + np_bits(counts) + np_bits(uniq))
        total = position_bits + cov_bits + feature_bits
        out = {"bpp": total / H / W,
               "position_bpp": position_bits / H / W,
               "cholesky_bpp": cov_bits / H / W,
               "feature_dc_bpp": feature_bits / H / W}
        for name, bits in per_name.items():
            out.setdefault(f"{name}_bpp", bits / H / W)
        return out
