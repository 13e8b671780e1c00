"""Decompose train-step time on the real chip: where do the ms go?

Times state-carrying variants of the jitted step at the bench operating
point (YOLOPoint-S, 640 px, bf16 conv stack). Timing MUST end in a value
fetch: over the tunneled axon backend `block_until_ready` returns before
device execution finishes, so only fetching a scalar from the last
program's output (in-order execution) proves all enqueued work retired —
see `_sync`.

  fwd        single forward, train=True, scalar reduce -> param carry
  fwd2_bwd   double forward + backward of an L2 scalar (conv-stack cost)
  noaug      the real step fed precomputed identity views (no device aug)
  full       the real step incl. on-device photometric+homographic aug

  python tools/train_profile_breakdown.py [--batch 16] [--size 640]
         [--trace /tmp/traindump]   # also capture a jax.profiler trace
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _sync(out) -> float:
    """Force real completion by FETCHING a scalar derived from an output.

    Over the tunneled axon backend `jax.block_until_ready` returns before
    device execution finishes (measured: a B=16 640px forward "completes" in
    1.1 ms against a 1.6 ms FLOPs floor, and total time does not change when
    the program is made 8x longer). Device execution is in-order, so fetching
    one scalar of program N's output proves every enqueued program retired.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _chained_ms(step, state, extra, iters_pair=(4, 16), warmup=2):
    """Per-step ms for a (state, *extra) -> (state, aux) step.

    Times two loop lengths and reports the slope, cancelling both the
    fixed sync round-trip (~30 ms over the tunnel) and any dispatch ramp."""
    for _ in range(warmup):
        state, aux = step(state, *extra)
    _sync(aux)  # absorbs the first device->host fetch stall of the process
    totals = {}
    for iters in iters_pair:
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state, *extra)
        _sync(aux)
        totals[iters] = time.perf_counter() - t0
    i0, i1 = iters_pair
    return float((totals[i1] - totals[i0]) / (i1 - i0) * 1e3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--version", default="s")
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--skip", default="", help="comma list of slices to skip")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/yolopoint_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from yolopoint_tpu.losses.objects import ObjectLossConfig
    from yolopoint_tpu.models import build_model
    from yolopoint_tpu.parallel.mesh import make_mesh, shard_batch
    from yolopoint_tpu.training.state import create_train_state, make_optimizer
    from yolopoint_tpu.training.step import (
        LossWeights, make_train_step, rescale_yolo_gains,
    )

    skip = set(filter(None, args.skip.split(",")))
    B, S = args.batch, args.size
    model = build_model("YOLOPoint", args.version, nc=args.nc, dtype=jnp.bfloat16)
    mesh = make_mesh()
    tx = make_optimizer(learning_rate=1e-3, lrf=0.1, total_epochs=10,
                        steps_per_epoch=100)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, S, S, 3),
                               tx=tx, ema=True)

    rng = np.random.default_rng(0)
    npts, nbox = 200, 30
    batch_np = {
        "image": rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32),
        "points": rng.uniform(8, S - 8, (B, npts, 2)).astype(np.float32),
        "point_mask": np.ones((B, npts), bool),
        "boxes": np.concatenate([
            rng.uniform(100, 500, (B, nbox, 4)),
            rng.integers(0, args.nc, (B, nbox, 1)).astype(np.float32),
        ], axis=-1).astype(np.float32),
        "box_mask": np.ones((B, nbox), bool),
    }
    imgs = jnp.asarray(batch_np["image"])
    results = {}

    def report(name, ms, t0):
        results[name] = ms
        print(f"{name}: {ms:.1f} ms ({B / ms * 1e3:.1f} img/s)  "
              f"(incl-compile wall {time.perf_counter() - t0:.0f}s)", flush=True)

    # --- fwd: param carry forces serialization -------------------------
    if "fwd" not in skip:
        @jax.jit
        def fwd_step(params, stats, x):
            out, vs = model.apply({"params": params, "batch_stats": stats},
                                  x.astype(jnp.bfloat16), train=True,
                                  mutable=["batch_stats"])
            s = sum(jnp.sum(o.astype(jnp.float32))
                    for o in [out["semi"], out["desc"], *out["objects"]])
            new_params = jax.tree_util.tree_map(lambda p: p + 0.0 * s, params)
            return new_params, {"loss": s, "stats": vs["batch_stats"]}

        def fwd_chain(carry, x):
            params, stats = carry
            new_params, aux = fwd_step(params, stats, x)
            return (new_params, aux["stats"]), aux

        t0 = time.perf_counter()
        ms = _chained_ms(fwd_chain, (state.params, state.batch_stats), (imgs,))
        report("fwd", ms, t0)

    # --- double forward + backward --------------------------------------
    if "fwd2_bwd" not in skip:
        def loss_scalar(params, stats, xa, xb):
            out, vs = model.apply({"params": params, "batch_stats": stats},
                                  xa.astype(jnp.bfloat16), train=True,
                                  mutable=["batch_stats"])
            out2, _ = model.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                xb.astype(jnp.bfloat16), train=True, mutable=["batch_stats"])
            leaves = [out["semi"], out["desc"], *out["objects"],
                      out2["semi"], out2["desc"], *out2["objects"]]
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in leaves)

        @jax.jit
        def gstep(params, stats, xa, xb):
            gr = jax.grad(loss_scalar)(params, stats, xa, xb)
            new_params = jax.tree_util.tree_map(lambda p, g: p - 0.0 * g,
                                                params, gr)
            return new_params, {"g0": jax.tree_util.tree_leaves(gr)[0]}

        def g_chain(carry, x):
            new_params, aux = gstep(carry, state.batch_stats, x, x)
            return new_params, aux

        t0 = time.perf_counter()
        ms = _chained_ms(g_chain, state.params, (imgs,))
        report("fwd2_bwd", ms, t0)

    aug = {
        "photometric": {"enable": False},
        "homographic": {"enable": True, "params": {"patch_ratio": 0.85},
                        "valid_border_margin": 3},
        "warped_pair": {"params": {"patch_ratio": 0.85}},
    }
    obj_cfg = rescale_yolo_gains(ObjectLossConfig(), nc=args.nc, img_size=S)
    weights = LossWeights(num_samples_per_image=600,
                          num_masked_non_matches_per_match=100)
    key = jax.random.PRNGKey(5)

    # --- real step, precomputed identity views (no device aug) ----------
    if "noaug" not in skip:
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
        pre_batch = dict(
            batch_np,
            precomputed_image_base=batch_np["image"],
            precomputed_valid_base=np.ones((B, S, S), np.float32),
            precomputed_image_pair=batch_np["image"],
            precomputed_valid_pair=np.ones((B, S, S), np.float32),
            precomputed_h1=eye, precomputed_h2=eye,
        )
        step_pre = make_train_step(model, mesh, aug, obj_cfg, weights, args.nc,
                                   donate=False, remat=args.remat)
        sb = shard_batch(pre_batch, mesh)
        t0 = time.perf_counter()
        ms = _chained_ms(step_pre, state, (sb, key))
        report("noaug", ms, t0)

    # --- full step with on-device augmentation --------------------------
    step_full = make_train_step(model, mesh, aug, obj_cfg, weights, args.nc,
                                donate=False, remat=args.remat)
    sb_full = shard_batch(batch_np, mesh)
    t0 = time.perf_counter()
    ms = _chained_ms(step_full, state, (sb_full, key))
    report("full", ms, t0)

    if args.trace:
        st = state
        with jax.profiler.trace(args.trace):
            for i in range(3):
                st, aux = step_full(st, sb_full, jax.random.fold_in(key, i))
            _sync(aux["loss"])
        print(f"trace written to {args.trace}")

    print()
    if {"fwd", "fwd2_bwd", "noaug", "full"} <= results.keys():
        fwd, f2b, noaug, full = (results[k] for k in
                                 ("fwd", "fwd2_bwd", "noaug", "full"))
        print(f"B={B} {S}px  fwd={fwd:.1f}  fwd2+bwd={f2b:.1f}  "
              f"+losses/opt={noaug - f2b:+.1f}  +aug={full - noaug:+.1f}  "
              f"full={full:.1f} ms  ({B / full * 1e3:.1f} img/s)")
    else:
        print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
