"""Microbenchmark: candidate replacements for the train-step grad reduction.

The fused train step's per-instance gradient rows dW [I,16] must become
per-gaussian sums [N,16] (ops/stream_common.py scatter_stream_grads). On the
round-2 profile this XLA add-scatter costs ~315 us at I~40k — ~20% of the
1.55 ms step. Candidates measured here (wall clock, sync dispatch, each op
isolated in its own jit with runtime-arg inputs so nothing folds):

  a. add-scatter [I,16] -> [N+1,16]          (current)
  b. set-scatter int32 [I] -> [M*N] unique   (inverse-permutation build)
  c. gather [M*N,16] from [I+1,16]           (apply inverse permutation)
  d. c + reshape-sum [M,N,16] -> [N,16]      (full gather-based reduction)
  e. searchsorted scan_unrolled [M*N] queries over sorted [I] keys
     (scatter-free inverse build)

If (b)+(c)+(d) << (a), the gather-based path wins; if (e) is also cheap the
whole thing needs no scatter at all.

Run on the real TPU: python scripts/microbench_scatter.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e6  # us


def main():
    N, I, M = 10000, 40960, 12
    rng = np.random.default_rng(0)
    gids = rng.integers(0, N, I).astype(np.int32)
    dW = rng.standard_normal((I, 16)).astype(np.float32)
    dW_pad = np.concatenate([dW, np.zeros((1, 16), np.float32)])
    # unique pre-sort slots (one per instance), scattered over M*N space
    pre = rng.permutation(M * N)[:I].astype(np.int32)
    inv = np.full(M * N, I, np.int32)
    inv[pre] = np.arange(I, dtype=np.int32)
    skey = np.sort(rng.permutation(1 << 26)[:I].astype(np.int32))
    queries = rng.integers(0, 1 << 26, M * N).astype(np.int32)

    gids, dW, dW_pad, pre, inv, skey, queries = map(
        jnp.asarray, (gids, dW, dW_pad, pre, inv, skey, queries))

    # poison dispatch once: honest sync-mode wall clocks from here on
    _ = np.asarray(jnp.zeros(()) + 1)

    a = jax.jit(lambda d, g: jnp.zeros((N + 1, 16), jnp.float32)
                .at[g].add(d, mode="promise_in_bounds"))
    b = jax.jit(lambda p: jnp.full((M * N,), I, jnp.int32)
                .at[p].set(jnp.arange(I, dtype=jnp.int32),
                           mode="promise_in_bounds", unique_indices=True))
    c = jax.jit(lambda d, iv: d[iv])
    d_ = jax.jit(lambda d, iv: d[iv].reshape(N, M, 16).sum(axis=1))
    e = jax.jit(lambda k, q: jnp.searchsorted(
        k, q, method="scan_unrolled"))

    res = {
        "a_add_scatter_I16_us": timeit(a, dW, gids),
        "b_set_scatter_int_us": timeit(b, pre),
        "c_gather_MN16_us": timeit(c, dW_pad, inv),
        "d_gather_reduce_us": timeit(d_, dW_pad, inv),
        "e_searchsorted_us": timeit(e, skey, queries),
    }
    res["gather_path_total_us"] = (res["b_set_scatter_int_us"]
                                   + res["d_gather_reduce_us"])
    print(json.dumps({k: round(v, 1) for k, v in res.items()}))


if __name__ == "__main__":
    main()
