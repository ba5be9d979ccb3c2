"""Two-process jax.distributed exercise of parallel/multihost.py.

The reference has no distribution, so this is a new-framework obligation
(BASELINE.json's >=80% scaling target): prove the communication backend
actually brings up a 2-process cluster, builds a dp mesh spanning both
processes, runs a sharded computation with a cross-process collective, and
tears down cleanly — on CPU devices, coordinator on localhost.

Each worker runs in a subprocess (jax.distributed is process-global state;
it cannot be exercised twice in one interpreter). Worker 0's stdout carries
the collective result, asserted against the single-process value.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = str(Path(__file__).resolve().parent.parent)

WORKER = r"""
import os, sys
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from llamavk_tpu.parallel import multihost

pid = int(sys.argv[1])
port = sys.argv[2]
multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

# dp mesh across BOTH processes' cpu devices (4 per process via XLA flag)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = multihost.local_devices_first()
assert devs[0].process_index == pid  # local devices lead
mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))

# a process-spanning collective: global sum over rows sharded across dp.
# make_array_from_callback: each process provides only its local rows.
n = len(jax.devices())
sharding = NamedSharding(mesh, P("dp"))
rows = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
garr = jax.make_array_from_callback(
    (n, 4), sharding, lambda idx: np.asarray(rows[idx])
)
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(garr)
val = float(jax.device_get(total))

# request-stream dp: the two hosts split the work without overlap
items = list(range(10))
mine = multihost.host_shard(items)
assert sorted(mine + multihost.host_shard(items, process_id=1 - pid)) == items

if pid == 0:
    print(f"RESULT {val}", flush=True)
multihost.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_dp_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    # 8 global devices -> rows 0..31, sum = 31*32/2
    expect = float(np.arange(8 * 4, dtype=np.float32).sum())
    assert f"RESULT {expect}" in outs[0][1]
