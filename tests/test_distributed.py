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


ENGINE_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vllm_backend_public_tpu.parallel.mesh import multihost_initialize

    pid = int(sys.argv[1])
    multihost_initialize(coordinator=sys.argv[2], num_processes=2,
                         process_id=pid)
    assert len(jax.devices()) == 2

    import numpy as np
    import jax.numpy as jnp
    from vllm_backend_public_tpu.loader.hf import parse_hf_config
    from vllm_backend_public_tpu.models.llama import init_random_params
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams

    # identical host-side state on both processes: same params (same
    # PRNGKey), same requests in the same order => SPMD decode. The
    # engine mesh spans BOTH processes' devices (tp=2 across hosts).
    cfg = parse_hf_config({{
        "architectures": ["LlamaForCausalLM"], "vocab_size": 512,
        "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5}})
    params = init_random_params(cfg, jax.random.PRNGKey(0),
                                dtype=jnp.float32)
    eng = LLMEngine(
        EngineConfig(model="dist", dtype="float32", block_size=8,
                     max_num_seqs=4, max_model_len=64,
                     max_num_batched_tokens=32, num_kv_blocks=40,
                     decode_steps_per_call=2, tensor_parallel_size=2,
                     enable_prefix_caching=False),
        model_cfg=cfg, params=params)
    outs = eng.generate(
        [[1, 2, 3], [7, 8, 9, 10]],
        SamplingParams(max_tokens=8, temperature=0.8, top_k=16,
                       ignore_eos=True))
    toks = [o.output_token_ids for o in outs]
    print(f"proc{{pid}} tokens={{toks}}", flush=True)
""").format(repo="/root/repo")


def test_two_process_engine_decode_identical():
    """A REAL engine decode (sharded params, paged cache, sampler) over a
    mesh spanning two processes: both hosts run the same SPMD schedule
    from identical host-side scheduler state and must sample identical
    tokens — the correctness substrate for multi-host continuous
    batching (SURVEY §7; BASELINE config #4 scaling target)."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", ENGINE_WORKER, str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                 "JAX_PLATFORMS": "cpu",
                 "VIRTUAL_ENV": "/opt/venv"})
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    toks = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines()
                if ln.startswith(f"proc{i} tokens=")]
        assert line, out[-2000:]
        toks.append(line[0].split("=", 1)[1])
    assert toks[0] == toks[1], f"hosts diverged: {toks}"
