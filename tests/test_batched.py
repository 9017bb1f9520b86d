"""Batched (vertically stacked) rendering/decoding equals per-frame results
exactly — the band containment must prevent any cross-frame bleed."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu import batched
from gaussianimage_tpu.models import make_model
from gaussianimage_tpu.ops import RasterizeConfig
from gaussianimage_tpu.utils.image_io import synthetic_image

H, W, N, B = 64, 96, 256, 3


def _params_batch(model, seeds):
    ps = [model.init_params(jax.random.PRNGKey(s)) for s in seeds]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)


def test_render_batch_matches_per_frame():
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       raster=RasterizeConfig())
    pb = _params_batch(model, range(B))
    out = batched.render_batch(model, pb)
    assert out["render"].shape == (B, 3, H, W)
    for b in range(B):
        p = jax.tree.map(lambda x: x[b], pb)
        ref = model.render(p)["render"][0]
        np.testing.assert_allclose(np.asarray(out["render"][b]),
                                   np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_render_batch_band_containment():
    # gaussians with huge radii near frame edges must not bleed into the
    # neighbour frame: compare against per-frame renders (which clip at the
    # frame boundary by construction)
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W)
    pb = _params_batch(model, range(B))
    # push frame 1's gaussians to the bottom edge and make them huge
    p = dict(jax.tree.map(lambda x: x[1], pb))
    p["_xyz"] = jnp.arctanh(jnp.clip(
        jnp.tanh(p["_xyz"]).at[:, 1].set(0.98), -0.999, 0.999))
    p["_cholesky"] = jnp.full_like(p["_cholesky"], 8.0)
    pb = jax.tree.map(lambda xb, xi: xb.at[1].set(xi), pb,
                      {k: p[k] for k in pb})
    out = batched.render_batch(model, pb)
    for b in range(B):
        pp = jax.tree.map(lambda x: x[b], pb)
        ref = model.render(pp)["render"][0]
        np.testing.assert_allclose(np.asarray(out["render"][b]),
                                   np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_decode_batch_matches_per_frame():
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       quantize=True)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    states, encs = [], []
    for s in range(B):
        st = model.init_state(jax.random.PRNGKey(s))
        st = model.init_quantizer_data(st)
        st, _ = model.train_chunk(st, gt, jax.random.PRNGKey(s + 7),
                                  jnp.asarray(1), 20)
        states.append(st)
        encs.append(jax.tree.map(jnp.asarray,
                                 model.compress_wo_ec(st.params, st.extra)))
    pb = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.params for s in states])
    eb = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.extra for s in states])
    encb = jax.tree.map(lambda *xs: jnp.stack(xs), *encs)
    out = batched.decompress_wo_ec_batch(model, pb, eb, encb)
    assert out["render"].shape == (B, 3, H, W)
    for b in range(B):
        ref = model.decompress_wo_ec(states[b].params, states[b].extra,
                                     encs[b])["render"][0]
        np.testing.assert_allclose(np.asarray(out["render"][b]),
                                   np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_decode_many_routes_by_regime_and_matches():
    """decode_many (the regime-gated dataset-decode API) must equal the
    per-frame decodes under BOTH strategies, and the default route must
    follow the measured frame-size gate (prefer_batched)."""
    model = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       quantize=True)
    gt = jnp.asarray(synthetic_image(H, W, seed=0))
    states, encs = [], []
    for s in range(B):
        st = model.init_state(jax.random.PRNGKey(s))
        st = model.init_quantizer_data(st)
        st, _ = model.train_chunk(st, gt, jax.random.PRNGKey(s + 7),
                                  jnp.asarray(1), 20)
        states.append(st)
        encs.append(jax.tree.map(jnp.asarray,
                                 model.compress_wo_ec(st.params, st.extra)))
    pb = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.params for s in states])
    eb = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.extra for s in states])
    encb = jax.tree.map(lambda *xs: jnp.stack(xs), *encs)

    refs = np.stack([
        np.asarray(model.decompress_wo_ec(states[b].params, states[b].extra,
                                          encs[b])["render"][0])
        for b in range(B)])
    for force in ("batched", "scan"):
        out = batched.decode_many(model, pb, eb, encb, force=force)
        assert out["render"].shape == (B, 3, H, W), force
        np.testing.assert_allclose(np.asarray(out["render"]), refs,
                                   atol=1e-5, rtol=1e-5, err_msg=force)

    # the gate: small frames -> batched; the flagship 768x512 -> scan
    assert batched.prefer_batched(H, W)  # 64x96 is deep in the win regime
    assert batched.prefer_batched(256, 256)
    assert not batched.prefer_batched(512, 768)


def test_blockize_roundtrip():
    from gaussianimage_tpu.ops import stream_common as sc

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(512, 16)).astype(np.float32))
    blocks = sc.blockize_stream(g, 64, interpret=True)
    assert blocks.shape == (8, 16, 64)
    np.testing.assert_array_equal(
        np.asarray(blocks[2]), np.asarray(g[128:192]).T)
    back = sc.unblockize_stream(blocks, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(g))


def test_decode_batch_fused_matches_generic():
    """The one-pass batched fused prep (splat_prep._batch_decode_kernel)
    must reproduce the generic batched decode path within the fused-prep
    boundary-ulp envelope, per-frame side info (quantizer state, VQ
    codebooks) correctly selected by frame."""
    m_ref = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                       quantize=True)
    m_fused = make_model("GaussianImage_Cholesky", num_points=N, H=H, W=W,
                         quantize=True,
                         raster=RasterizeConfig(fused_prep=True))
    states, encs = [], []
    for s in range(B):
        gt = jnp.asarray(synthetic_image(H, W, seed=s))  # distinct scenes
        st = m_ref.init_state(jax.random.PRNGKey(s))
        st = m_ref.init_quantizer_data(st)
        st, _ = m_ref.train_chunk(st, gt, jax.random.PRNGKey(s + 7),
                                  jnp.asarray(1), 20)
        states.append(st)
        encs.append(jax.tree.map(jnp.asarray,
                                 m_ref.compress_wo_ec(st.params, st.extra)))
    pb = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.params for s in states])
    eb = jax.tree.map(lambda *xs: jnp.stack(xs), *[s.extra for s in states])
    encb = jax.tree.map(lambda *xs: jnp.stack(xs), *encs)

    # dispatcher picks the fused kernel (hook returns non-None)
    assert m_fused.fused_decode_batch(pb, eb, encb) is not None
    assert m_ref.fused_decode_batch(pb, eb, encb) is None  # flag off

    out_ref = batched.decompress_wo_ec_batch(m_ref, pb, eb, encb)
    out_fused = batched.decompress_wo_ec_batch(m_fused, pb, eb, encb)
    np.testing.assert_allclose(np.asarray(out_fused["render"]),
                               np.asarray(out_ref["render"]),
                               atol=2e-5, rtol=0)
    # and against the single-frame generic decode (band containment)
    for b in range(B):
        ref = m_ref.decompress_wo_ec(states[b].params, states[b].extra,
                                     encs[b])["render"][0]
        np.testing.assert_allclose(np.asarray(out_fused["render"][b]),
                                   np.asarray(ref), atol=2e-5, rtol=0)
