"""Scalar quantizers for quantization-aware training.

TPU-native counterparts of the reference's toolkit (quantize.py):
 - ``fake_quantize_half``: fp16 round-trip with straight-through gradient
   (reference FakeQuantizationHalf, quantize.py:15-24).
 - ``UniformQuantizer``: asymmetric uniform quantization with learned
   per-channel scale/offset (quantize.py:26-87). The reference computes an
   LSQ grad-scale then discards it (:53-56 — the assignment on :56 overrides
   it), so the effective behavior is plain STE through round() with scale and
   beta receiving their analytic gradients; we implement that effective
   behavior directly.

Functional style: parameters (scale, beta) live in a small state pytree owned
by the model's params so the optimizer trains them jointly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


@jax.custom_vjp
def fake_quantize_half(x: jnp.ndarray) -> jnp.ndarray:
    """Round-trip through float16 with identity gradient."""
    return x.astype(jnp.float16).astype(jnp.float32)


def _fqh_fwd(x):
    return fake_quantize_half(x), None


def _fqh_bwd(_, g):
    return (g,)


fake_quantize_half.defvjp(_fqh_fwd, _fqh_bwd)


class UniformQuantizerState(NamedTuple):
    scale: jnp.ndarray  # [num_channels]
    beta: jnp.ndarray   # [num_channels]


class UniformQuantizer:
    """b-bit asymmetric uniform quantizer with learned scale/offset."""

    def __init__(self, bits: int = 6, signed: bool = False,
                 num_channels: int = 1):
        if signed:
            self.qmin = -(2 ** (bits - 1))
            self.qmax = 2 ** (bits - 1) - 1
        else:
            self.qmin = 0
            self.qmax = 2 ** bits - 1
        self.bits = bits
        self.num_channels = num_channels

    def init_state(self) -> UniformQuantizerState:
        v = jnp.full((self.num_channels,), 1.0 / self.qmax, jnp.float32)
        return UniformQuantizerState(scale=v, beta=v)

    def init_from_data(self, x: jnp.ndarray) -> UniformQuantizerState:
        """Data-driven (min, max) range init — the two-stage warm-start hook
        (reference _init_data, quantize.py:44-49, called via model._init_data
        at train_quantize.py:59)."""
        t_min = x.min(axis=0)
        t_max = x.max(axis=0)
        scale = (t_max - t_min) / (self.qmax - self.qmin)
        return UniformQuantizerState(scale=scale.astype(jnp.float32),
                                     beta=t_min.astype(jnp.float32))

    def __call__(self, state: UniformQuantizerState, x: jnp.ndarray
                 ) -> jnp.ndarray:
        """Fake-quantize [N, C] with STE; differentiable w.r.t. x and state."""
        code = jnp.clip((x - state.beta) / state.scale, self.qmin, self.qmax)
        quant = _ste_round(code)
        return quant * state.scale + state.beta

    def compress(self, state: UniformQuantizerState, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (integer codes, dequantized values)."""
        code = jnp.clip((x - state.beta) / state.scale, self.qmin, self.qmax)
        q = jnp.round(code)
        return q, q * state.scale + state.beta

    def decompress(self, state: UniformQuantizerState, codes: jnp.ndarray
                   ) -> jnp.ndarray:
        return codes * state.scale + state.beta
