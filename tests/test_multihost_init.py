"""2-process `jax.distributed` smoke test for
`parallel.mesh.initialize_multi_host` (VERDICT r4 #7 — the one parallel/
function with zero coverage; it replaces the reference's Accelerate/DDP
process-group setup, /root/reference/src/train.py:26-47).

Spawns two CPU subprocesses that each call `initialize_multi_host`
explicitly (coordinator + num_processes + process_id), build the global
mesh, and run a psum across BOTH processes' devices — asserting the mesh
spans hosts and the collective reduces globally, plus the
`process_local_batch_slice` disjoint-shard contract."""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, "__ROOT__")
    import jax
    # the axon sitecustomize force-sets jax_platforms at interpreter start;
    # pin back to CPU before the backend (or distributed service) comes up
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from yolopoint_tpu.parallel.mesh import (
        initialize_multi_host, process_local_batch_slice, data_sharding,
    )

    pid = int(sys.argv[1])
    mesh = initialize_multi_host(
        coordinator_address=sys.argv[2], num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * n_local, (n_global, n_local)
    assert mesh.devices.size == n_global

    # global psum over the data axis: each process contributes its
    # process_index + 1 per local device -> total = 1*n + 2*n
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    local = jnp.full((n_local, 1), float(pid + 1))
    arr = jax.make_array_from_process_local_data(data_sharding(mesh), local)
    f = jax.jit(
        shard_map(lambda x: jax.lax.psum(x.sum(), "data"),
                  mesh=mesh, in_specs=P("data"), out_specs=P()),
    )
    total = float(f(arr))
    sl = process_local_batch_slice(8)
    print(json.dumps({"pid": pid, "total": total, "n_global": n_global,
                      "slice": [sl.start, sl.stop]}))
""")


@pytest.mark.slow
def test_two_process_initialize_multi_host(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    env.pop("TPU_WORKER_HOSTNAMES", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__ROOT__", str(ROOT)))
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), coord],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    # 2 procs x 2 devices, contributions (1+1) + (2+2) = 6
    assert by_pid[0]["n_global"] == 4
    assert by_pid[0]["total"] == by_pid[1]["total"] == 6.0
    # disjoint global-batch shards
    assert by_pid[0]["slice"] == [0, 4]
    assert by_pid[1]["slice"] == [4, 8]
