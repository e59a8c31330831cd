"""Multi-process jax.distributed smoke test (SURVEY.md §4).

Launches two local processes that join a jax.distributed coordinator over
loopback (CPU backend), build a global mesh, and verify a cross-process
psum — the communication-runtime path a real multi-host pod slice uses,
without a cluster.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:%(port)d",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
sharding = NamedSharding(mesh, PartitionSpec("data"))

# each process contributes its local shard; global sum must see both
local = jnp.full((1, 4), float(jax.process_index() + 1))
global_arr = jax.make_array_from_single_device_arrays(
    (2, 4), sharding, [jax.device_put(local, jax.local_devices()[0])]
)
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, PartitionSpec())
)(global_arr)
expected = 4.0 * (1 + 2)
assert abs(float(total) - expected) < 1e-6, float(total)
print("WORKER_OK", jax.process_index(), flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("DCT_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_two_process_distributed_psum(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER % {"port": port})
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out
