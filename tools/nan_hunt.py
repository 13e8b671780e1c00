"""Replay a training run step-by-step to catch the first non-finite loss.

Mirrors `TrainAgent._train_loop` (steps_per_dispatch=1 path) exactly —
same rng splits, same data order — while stashing a host copy of the
pre-step (params, batch_stats, batch, key) ring so that when a step goes
non-finite the *clean* inputs that produced it are dumped for offline
analysis (tools/nan_analyze.py).

    python tools/nan_hunt.py --config configs/synthetic.yaml \
        --exper_name nanhunt --output_dir /tmp/nanhunt_runs
"""

from __future__ import annotations

import os
import pickle
import sys
from collections import deque

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def tree_finite(tree) -> bool:
    return all(
        bool(np.all(np.isfinite(x)))
        for x in jax.tree_util.tree_leaves(tree)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
    )


def main():
    from yolopoint_tpu.parallel.mesh import shard_batch
    from yolopoint_tpu.training.cli import build_agent

    agent = build_agent()
    assert agent.steps_per_dispatch == 1, "hunt only mirrors the single-step path"

    ring: deque = deque(maxlen=2)  # last two steps' clean inputs
    for epoch in range(agent.start_epoch, agent.epochs):
        for batch in agent.train_loader:
            batch.pop("names", None)
            host_prev = jax.device_get(
                {"params": agent.state.params, "batch_stats": agent.state.batch_stats}
            )
            b = shard_batch(batch, agent.mesh)
            agent.rng, k = jax.random.split(agent.rng)
            rec = {
                "epoch": epoch,
                "step": agent.global_step + 1,
                "state": host_prev,
                "batch": jax.device_get(batch),
                "key": jax.device_get(k),
                "params_finite": tree_finite(host_prev["params"]),
            }
            ring.append(rec)
            agent.state, aux = agent.train_step(agent.state, b, k)
            agent.global_step += 1
            scalars = {kk: float(vv) for kk, vv in aux.items()}
            if agent.global_step % 50 == 1:
                print(f"e{epoch} s{agent.global_step} loss={scalars['loss']:.4f}",
                      flush=True)
            bad = [kk for kk, vv in scalars.items() if not np.isfinite(vv)]
            if bad or not rec["params_finite"]:
                print(f"NON-FINITE at e{epoch} s{agent.global_step}: "
                      f"terms={bad} params_were_finite={rec['params_finite']}")
                print({kk: vv for kk, vv in scalars.items()})
                with open("/tmp/nan_dump.pkl", "wb") as f:
                    pickle.dump(list(ring), f)
                print("dumped last-2-step ring -> /tmp/nan_dump.pkl")
                return 0
        print(f"epoch {epoch} clean; validating (mirrors rng splits)", flush=True)
        agent.validate(epoch)
    print("no non-finite loss observed over the whole run")
    return 1


if __name__ == "__main__":
    sys.exit(main())
