"""Two-process jax.distributed runtime test (CPU).

Exercises the multi-host bring-up path end-to-end without TPU hardware:
two OS processes initialize through parallel/mesh.multihost_initialize
(the same wiring `server --distributed` uses,
server/__main__.py) and run a psum over a global 2-device mesh — the
pattern a real multi-host pod slice executes over DCN. The reference
delegates all of this to vLLM's Ray/NCCL world bootstrap
(reference: benchmark-vllm/configs/test_small_model.yaml:25
worker-use-ray).
"""

import socket
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vllm_backend_public_tpu.parallel.mesh import multihost_initialize

    pid = int(sys.argv[1])
    multihost_initialize(coordinator=sys.argv[2], num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    devs = jax.devices()
    assert len(devs) == 2, devs  # one CPU device per process, global view

    # cross-process collective: psum over the global mesh
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(devs), ("data",))
    local = jnp.asarray([float(pid + 1)])  # proc0: [1], proc1: [2]
    arr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("data")),
        [jax.device_put(local, jax.local_devices()[0])])

    @jax.jit
    def total(x):
        return jnp.sum(x)

    out = total(arr)
    # the global sum must see both processes' shards
    assert float(out) == 3.0, float(out)
    print(f"proc{{pid}} ok", flush=True)
""").format(repo="/root/repo")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_runtime():
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu",
                 "VIRTUAL_ENV": "/opt/venv"})
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-2000:]}"
        assert f"proc{i} ok" in out
