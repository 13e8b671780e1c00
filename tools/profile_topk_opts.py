"""Is `lax.approx_max_k` a drop-in win over `lax.top_k` for decode?

Both decode paths pay ~4.6 ms/batch in a top-k over ~25k lanes at B=128
(box candidates (128, 25200) f32, keypoint tile keys (128, 25600) int32) —
together ~half of decode_ms. XLA lowers `top_k` to a full variadic sort on
TPU; `approx_max_k` lowers to the O(N) PartialReduce TPU op. At
`recall_target=1.0` PartialReduce degenerates to an exact top-k — this
script measures the speed and CHECKS EXACTNESS (set equality of the
returned (value, index) pairs; order must match too since NMS priority /
keep-k truncation depend on it).

  python tools/profile_topk_opts.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # true barrier on the tunneled backend: fetch one value
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B = 128

    cases = []
    # box candidate plane: mostly -1.0 sentinel, sparse positives (serving
    # conf gate) AND dense uniform (worst case)
    n = 25200
    sparse = np.full((B, n), -1.0, np.float32)
    for b in range(B):
        nz = rng.integers(50, 400)
        idx = rng.choice(n, nz, replace=False)
        sparse[b, idx] = rng.uniform(0.25, 1.0, nz).astype(np.float32)
    cases.append(("box f32 sparse", jnp.asarray(sparse), 1024))
    cases.append(("box f32 dense",
                  jnp.asarray(rng.uniform(0, 1, (B, n)).astype(np.float32)),
                  1024))
    # keypoint tile keys: int32, positive survivors, zero elsewhere
    nt = 25600
    keys = np.zeros((B, nt), np.int32)
    for b in range(B):
        nz = rng.integers(500, 6000)
        idx = rng.choice(nt, nz, replace=False)
        keys[b, idx] = rng.integers(1, 2**30, nz).astype(np.int32)
    cases.append(("kpt keys int32", jnp.asarray(keys), 1000))

    for name, x, k in cases:
        exact = jax.jit(functools.partial(jax.lax.top_k, k=k))
        t_exact = timeit(exact, x)
        ve, ie = jax.device_get(exact(x))
        print(f"top_k        {name:18s} k={k:5d}  {t_exact:7.2f} ms/batch")
        for rt in (1.0, 0.99, 0.95):
            apx = jax.jit(functools.partial(
                jax.lax.approx_max_k, k=k, recall_target=rt))
            t_apx = timeit(apx, x)
            va, ia = jax.device_get(apx(x))
            val_eq = bool(np.array_equal(ve, va))
            idx_eq = bool(np.array_equal(ie, ia))
            print(f"approx rt={rt:4.2f} {name:18s} k={k:5d}  {t_apx:7.2f} "
                  f"ms/batch  values_equal={val_eq} order+idx_equal={idx_eq}")


if __name__ == "__main__":
    main()
