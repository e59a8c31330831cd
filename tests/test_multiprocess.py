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


def test_initialize_raises_on_bad_explicit_coordinator(tmp_path):
    """core.distributed.initialize must FAIL LOUDLY when a coordinator is
    explicitly configured but unreachable — silent single-process
    degradation on a misconfigured pod would shard work incorrectly
    (every worker believing it is process 0 of 1)."""
    script = tmp_path / "bad_coord.py"
    script.write_text(
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from depth_completion_tpu.core.distributed import initialize\n"
        "try:\n"
        "    initialize(coordinator_address='127.0.0.1:9',\n"
        "               num_processes=2, process_id=1,\n"
        "               initialization_timeout=5)\n"
        "except RuntimeError as e:\n"
        "    print('RAISED_AS_EXPECTED', str(e)[:80], flush=True)\n"
        "else:\n"
        "    print('SILENT_DEGRADATION', flush=True)\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=180,
    )
    # Loud failure comes in two shapes depending on the jax version: our
    # RuntimeError from initialize(), or the coordination client killing
    # the process outright (absl fatal on RegisterTask deadline). Both are
    # acceptable; what must NEVER happen is a clean exit that silently
    # degraded to single-process.
    loud = "RAISED_AS_EXPECTED" in proc.stdout or proc.returncode != 0
    assert loud, proc.stdout
    assert "SILENT_DEGRADATION" not in proc.stdout, proc.stdout


def test_initialize_raises_on_processes_without_coordinator(tmp_path):
    """DCT_NUM_PROCESSES/DCT_PROCESS_ID without a coordinator address is
    still an explicit multi-process config: initialize must raise, not
    degrade to two independent single-process runs that each shard the
    work believing they are process 0."""
    script = tmp_path / "no_coord.py"
    script.write_text(
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from depth_completion_tpu.core.distributed import initialize\n"
        "try:\n"
        "    initialize(num_processes=2, process_id=0,\n"
        "               initialization_timeout=5)\n"
        "except RuntimeError as e:\n"
        "    print('RAISED_AS_EXPECTED', str(e)[:80], flush=True)\n"
        "else:\n"
        "    print('SILENT_DEGRADATION', flush=True)\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("DCT_COORDINATOR_ADDRESS", None)
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, timeout=180,
    )
    loud = "RAISED_AS_EXPECTED" in proc.stdout or proc.returncode != 0
    assert loud, proc.stdout
    assert "SILENT_DEGRADATION" not in proc.stdout, proc.stdout


@pytest.mark.skipif(
    os.environ.get("DCT_SKIP_MULTIPROCESS") == "1",
    reason="multi-process test disabled",
)
def test_multihost_predict_two_processes(tmp_path):
    """The CLI's --multihost flag end-to-end: two concurrent local worker
    processes join a jax.distributed coordinator (explicit DCT_* env
    config) and run sharded predict against a shared destination —
    disjoint work, jointly complete outputs (SURVEY §2.4 communication
    backend + per-host work sharding)."""
    import socket

    import numpy as np

    from depth_completion_tpu.io.image import save_img_array

    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(1, 255, size=(48, 64, 3)).astype(np.uint8)
        save_img_array(img, data / "scene" / "image" / f"{i:05d}.png")
        sparse = np.zeros((48, 64, 3), np.uint8)
        mask = rng.random((48, 64)) < 0.05
        sparse[mask, 0] = rng.integers(10, 250, mask.sum()).astype(np.uint8)
        save_img_array(sparse, data / "scene" / "sparse" / f"{i:05d}.png")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    out = tmp_path / "out"
    repo = str(Path(__file__).resolve().parents[1])
    procs = []
    for idx in range(2):
        env = dict(
            os.environ,
            DCT_RANDOM_MODEL_SIZE="tiny",
            JAX_PLATFORMS="cpu",
            DCT_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            DCT_NUM_PROCESSES="2",
            DCT_PROCESS_ID=str(idx),
            JAX_COMPILATION_CACHE_DIR=str(tmp_path / "xla_cache"),
            JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
        )
        env.pop("XLA_FLAGS", None)  # one device per process
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "depth_completion_tpu.cli.predict",
                    str(data), str(out),
                    "--model", "random", "--steps", "1", "--res", "48",
                    "--precision", "fp32", "--compress", "npy",
                    "--vis", "false", "--multihost", "true",
                    "--shard-index", str(idx), "--num-shards", "2",
                ],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env,
            )
        )
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outs.append(stdout)
    for i, (p, text) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{text}"
        assert "distributed: process" in text, text

    import numpy as np  # noqa: F811

    denses = sorted((out / "scene" / "dense").glob("*.npy"))
    assert [p.name for p in denses] == ["00000.npy", "00001.npy", "00002.npy"]
    for p in denses:
        d = np.load(p)
        assert d.shape == (48, 64, 1) and np.isfinite(d).all()
