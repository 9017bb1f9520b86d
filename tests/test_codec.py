"""Codec tests: rANS round-trip (native C++ and NumPy, cross-compatible),
categorical bitstream, uniform quantizer, residual VQ."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianimage_tpu.codec import (
    ResidualVQ,
    UniformQuantizer,
    fake_quantize_half,
)
from gaussianimage_tpu.codec import rans
from gaussianimage_tpu.codec.bitstream import (
    compress_categorical,
    decompress_categorical,
    minimal_int_dtype,
    np_bits,
)


# ---------------------------------------------------------------- rANS


def test_rans_roundtrip_numpy():
    rng = np.random.default_rng(0)
    counts = np.asarray([100, 50, 25, 12, 6, 3, 2, 2])
    freqs = rans.quantize_freqs(counts)
    assert freqs.sum() == 1 << 16 and (freqs >= 1).all()
    syms = rng.choice(8, 5000, p=counts / counts.sum()).astype(np.int32)
    words = rans.encode(syms, freqs, use_native=False)
    back = rans.decode(words, freqs, len(syms), use_native=False)
    np.testing.assert_array_equal(back, syms)


def test_rans_native_matches_numpy():
    if not rans.native_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(1)
    counts = np.asarray([7, 3, 90, 1])
    freqs = rans.quantize_freqs(counts)
    syms = rng.choice(4, 2000, p=counts / counts.sum()).astype(np.int32)
    w_native = rans.encode(syms, freqs, use_native=True)
    w_numpy = rans.encode(syms, freqs, use_native=False)
    np.testing.assert_array_equal(w_native, w_numpy)
    # cross-decode
    np.testing.assert_array_equal(
        rans.decode(w_native, freqs, len(syms), use_native=False), syms)
    np.testing.assert_array_equal(
        rans.decode(w_numpy, freqs, len(syms), use_native=True), syms)


def test_rans_compression_near_entropy():
    rng = np.random.default_rng(2)
    p = np.asarray([0.9, 0.05, 0.03, 0.02])
    n = 20000
    syms = rng.choice(4, n, p=p).astype(np.int32)
    counts = np.bincount(syms, minlength=4)
    words = rans.encode(syms, rans.quantize_freqs(counts))
    bits = len(words) * 16
    entropy = -(p * np.log2(p)).sum() * n
    assert bits < entropy * 1.05 + 64, (bits, entropy)


def test_categorical_bitstream_roundtrip():
    rng = np.random.default_rng(3)
    vals = rng.integers(-5, 60, size=(700, 3)).astype(np.int32)
    words, counts, unique = compress_categorical(vals)
    back = decompress_categorical(words, counts, unique, vals.size, vals.shape)
    np.testing.assert_array_equal(back, vals)


def test_categorical_single_symbol():
    vals = np.full((100, 2), 7, np.int32)
    words, counts, unique = compress_categorical(vals)
    assert len(words) == 0
    back = decompress_categorical(words, counts, unique, vals.size, vals.shape)
    np.testing.assert_array_equal(back, vals)


def test_minimal_dtype_boundaries():
    assert minimal_int_dtype(0, 255) == np.uint8
    assert minimal_int_dtype(0, 256) == np.uint16  # reference had <=256 bug
    assert minimal_int_dtype(-1, 100) == np.int8
    assert minimal_int_dtype(0, 70000) == np.uint32
    assert np_bits(np.zeros(4, np.uint16)) == 64


# ---------------------------------------------------------- quantizers


def test_fake_quantize_half_values_and_grad():
    x = jnp.asarray([0.1234567, -3.14159, 1e-5])
    y = fake_quantize_half(x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x, np.float16).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(fake_quantize_half(v) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(y), rtol=1e-6)


def test_uniform_quantizer_roundtrip_and_ste():
    q = UniformQuantizer(bits=6, num_channels=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0.2, 1.8, (500, 3)).astype(np.float32))
    st = q.init_from_data(x)
    deq = q(st, x)
    err = float(jnp.abs(deq - x).max())
    step = float(jnp.max(st.scale))
    assert err <= 0.51 * step + 1e-6
    codes, deq2 = q.compress(st, x)
    assert float(jnp.min(codes)) >= 0 and float(jnp.max(codes)) <= 63
    np.testing.assert_allclose(np.asarray(q.decompress(st, codes)),
                               np.asarray(deq2), rtol=1e-6)
    # STE: gradient w.r.t. x inside range is ~1 (identity through round)
    g = jax.grad(lambda v: jnp.sum(q(st, v)))(x)
    frac_ones = float(jnp.mean(jnp.isclose(g, 1.0, atol=1e-5)))
    assert frac_ones > 0.95


def test_residual_vq_trains_and_roundtrips():
    rvq = ResidualVQ(dim=3, codebook_size=8, num_quantizers=2, kmeans_iters=5)
    rng = np.random.default_rng(5)
    centers = rng.uniform(0, 1, (8, 3))
    x = jnp.asarray((centers[rng.integers(0, 8, 600)]
                     + 0.02 * rng.standard_normal((600, 3))).astype(np.float32))
    st = rvq.init_state()
    key = jax.random.PRNGKey(0)
    out = None
    for i in range(20):
        out, idx, commit, st = rvq(st, x, training=True,
                                   key=jax.random.fold_in(key, i))
    assert bool(st.initted)
    err = float(jnp.mean((out - x) ** 2))
    assert err < 0.005, err
    # compress/decompress consistency
    deq, idx = rvq.compress(st, x)
    rec = rvq.decompress(st, idx)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(deq), atol=1e-5)
    assert idx.shape == (600, 2)


def test_residual_vq_commit_gradient_flows():
    rvq = ResidualVQ(dim=3, codebook_size=4, num_quantizers=2)
    x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (64, 3)).astype(np.float32))
    st = rvq.init_state()
    _, _, _, st = rvq(st, x, training=True, key=jax.random.PRNGKey(1))

    def loss(v):
        out, _, commit, _ = rvq(st, v, training=True, key=jax.random.PRNGKey(2))
        return jnp.sum(out ** 2) + commit

    g = jax.grad(loss)(x)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
