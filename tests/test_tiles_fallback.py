"""The packed-int32 sort and the stable pair-sort fallback (used when
(tile, rank) doesn't fit 31 bits) must produce identical streams."""

import jax.numpy as jnp
import numpy as np

from gaussianimage_tpu.ops import tiles


def test_pair_sort_fallback_matches_packed():
    rng = np.random.default_rng(3)
    N, tiles_x, tiles_y, tp = 300, 6, 4, 16
    T = tiles_x * tiles_y
    xys = jnp.asarray(rng.uniform(-10, 100, (N, 2)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0, 25, N).astype(np.float32))

    tile, live, trunc = tiles._expand_instances(
        xys, radii, tiles_x, tiles_y, tp, 16, None)
    packed = tiles._sorted_stream(tile, live, N, T, force_pair=False)
    pair = tiles._sorted_stream(tile, live, N, T, force_pair=True)
    for a, b in zip(packed, pair):
        # srank of dead entries is arbitrary in the pair path; compare the
        # live prefix (dead mask must agree exactly)
        dead_a, dead_b = np.asarray(packed[1]), np.asarray(pair[1])
        np.testing.assert_array_equal(dead_a, dead_b)
    sr_a = np.asarray(packed[0])[~np.asarray(packed[1])]
    sr_b = np.asarray(pair[0])[~np.asarray(pair[1])]
    np.testing.assert_array_equal(sr_a, sr_b)


def test_sorted_window_bounds_matches_searchsorted():
    """The blocked two-level bounds must equal searchsorted 'left' for any
    sorted key array: random keys with duplicates + INT32_MAX dead tails,
    lengths off the block size, queries below/between/above."""
    import numpy as np
    import jax.numpy as jnp
    from gaussianimage_tpu.ops.tiles import sorted_window_bounds

    rng = np.random.default_rng(0)
    for L in (7, 512, 513, 4096, 40960 - 3):
        keys = np.sort(rng.integers(0, 2 ** 20, size=L)).astype(np.int32)
        keys[-max(1, L // 10):] = np.int32(2 ** 31 - 1)  # dead tail
        queries = np.unique(
            np.concatenate([rng.integers(0, 2 ** 20, size=100),
                            [0, 2 ** 20, 2 ** 30]])).astype(np.int32)
        got = np.asarray(sorted_window_bounds(jnp.asarray(keys),
                                              jnp.asarray(queries)))
        want = np.searchsorted(keys, queries, side="left")
        np.testing.assert_array_equal(got, want, err_msg=f"L={L}")


def test_serving_config_stays_on_flat_stream_through_sweep():
    """The serving config must keep the fast flat [I,16] stream layout
    through the reference's whole 10k-70k sweep (RasterizeConfig.serving
    raises the forward-only flat ceiling to 196608; the training default
    keeps 65536 because its backward carries a same-size gradient stream).
    The aligned block layout is ~2x slower per instance
    (results/fps_vs_n.json) — a regression here is a serving perf cliff."""
    from gaussianimage_tpu.ops import RasterizeConfig
    from gaussianimage_tpu.ops.stream_common import stream_caps

    for n in (10000, 20000, 40000, 70000):
        cfg = RasterizeConfig.serving(n)
        cap, span, aligned = stream_caps(n, cfg)
        assert not aligned, (n, cap)
        assert cap <= 196608, (n, cap)
        assert cap % cfg.block_inst == 0, (n, cap)
    # the training default still switches above its backward-safe ceiling
    _, _, aligned_default = stream_caps(40000, RasterizeConfig())
    assert aligned_default
