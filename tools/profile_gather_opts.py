"""Profile top-k + candidate-fetch formulations for the box decode.

The (B, N, 4) boxes layout pads 4 -> 128 lanes (32x HBM blowup); this
script measures layout- and algorithm-variants to pick the serving path.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = 25200
    K = 1024
    rng = np.random.default_rng(0)
    score = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    planes = jnp.asarray(rng.normal(size=(B, 6, N)).astype(np.float32))
    boxes_bn4 = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))

    def _scalar(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        x = leaves[0]
        return x.reshape(-1)[:1].astype(jnp.float32).sum()

    def timeit(fn, args, label, iters=10):
        f = jax.jit(fn)
        float(jax.device_get(_scalar(f(*args))))
        float(jax.device_get(_scalar(f(*args))))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*args)
        float(jax.device_get(_scalar(out)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:52s} {dt*1e3:9.2f} ms/batch", flush=True)
        return f(*args)

    # 0) plain top_k baseline
    timeit(lambda s: jax.lax.top_k(s, K), (score,), "t0 top_k(score, 1024)")

    # 1) sort with 6 payload planes (no gather needed afterwards)
    def sort_payload(score, planes):
        ops = (jnp.negative(score),) + tuple(planes[:, i, :] for i in range(6))
        out = jax.lax.sort(ops, dimension=-1, num_keys=1)
        return tuple(o[:, :K] for o in out)

    timeit(sort_payload, (score, planes), "t1 lax.sort key+6 payloads, slice K")

    # 2) approx_max_k then exact behavior on the small set
    def approx(s):
        v, i = jax.lax.approx_max_k(s, K, recall_target=0.99)
        return v, i

    timeit(approx, (score,), "t2 approx_max_k(1024, recall .99)")

    _, idx = jax.jit(lambda s: jax.lax.top_k(s, K))(score)

    # 3) row gather from (B, N, 4)
    timeit(lambda b, i: jnp.take_along_axis(b, i[..., None], axis=1),
           (boxes_bn4, idx), "t3 take_along_axis (B,N,4) rows")

    # 4) per-plane gather from (B, N) x6
    def plane_gather(planes, idx):
        return tuple(
            jnp.take_along_axis(planes[:, i, :], idx, axis=1) for i in range(6)
        )

    timeit(plane_gather, (planes, idx), "t4 6x take_along_axis (B,N) planes")

    # 5) gather from (B, 6, N) along last dim in one op
    timeit(lambda p, i: jnp.take_along_axis(p, i[:, None, :], axis=2),
           (planes, idx), "t5 take_along_axis (B,6,N) lanes")

    # 6) one-hot MXU gather per image, tiled over N (bf16 matmul)
    def onehot_gather(planes, idx):
        # (B, K, N) one-hot in bf16 would be 6.6 GB; tile over N in chunks
        # via matmul accumulation: out[b] = OH[b] @ planes[b].T
        oh_dtype = jnp.bfloat16
        out = jnp.zeros((B, K, 6), jnp.float32)
        CH = 8400
        for c0 in range(0, N, CH):
            sub = planes[:, :, c0:c0 + CH]                      # (B, 6, CH)
            oh = (idx[..., None] == (c0 + jnp.arange(CH))[None, None, :])
            oh = oh.astype(oh_dtype)                            # (B, K, CH)
            out = out + jax.lax.dot_general(
                oh, sub.astype(oh_dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        return out

    timeit(onehot_gather, (planes, idx), "t6 tiled one-hot MXU gather")

    # 7) top_k over packed key (score f32 bits + idx) — values only
    def packed_topk(s):
        # monotone map f32->u32, pack idx in low 15 bits (N < 2^15)
        u = jax.lax.bitcast_convert_type(s, jnp.uint32)
        u = jnp.where(s >= 0, u | jnp.uint32(0x80000000), ~u)
        key = (u & jnp.uint32(0xFFFF8000)) | jnp.arange(
            N, dtype=jnp.uint32)[None, :] >> jnp.uint32(0)
        kk = jnp.sort(key, axis=-1)[:, ::-1][:, :K]
        return kk & jnp.uint32(0x7FFF), kk

    timeit(packed_topk, (score,), "t7 sort packed u32 key, slice K")


if __name__ == "__main__":
    main()
