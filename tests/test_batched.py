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
