"""Scaling-efficiency harness: decode throughput vs mesh size.

BASELINE.md targets ">= 97% linear scaling to >= 2 hosts" (config #4) and
"pod-slice scaling measured at 1 chip / 1 host / N hosts" (config #5).
This harness measures tokens/sec of the jitted decode step on growing
device meshes and reports per-chip efficiency vs the 1-device run.

On real multi-chip TPU (or multi-host via jax.distributed) the numbers are
true scaling measurements over ICI/DCN. On a CPU host with
--xla_force_host_platform_device_count=N the mesh is virtual (one physical
socket), so the harness validates sharding + collective correctness and
reports *overhead*, not speedup — it prints which mode it ran in.

Usage:
  python -m vllm_backend_public_tpu.benchmarks.scaling [--devices 1,2,4,8]
      [--model tiny|tinyllama|llama8b] [--quant w8a8] [--steps 32]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def model_cfg(name: str):
    from ..loader.hf import parse_hf_config

    shapes = {
        "tiny": dict(hidden_size=256, intermediate_size=512,
                     num_hidden_layers=4, num_attention_heads=8,
                     num_key_value_heads=8, vocab_size=2048),
        "tinyllama": dict(hidden_size=2048, intermediate_size=5632,
                          num_hidden_layers=22, num_attention_heads=32,
                          num_key_value_heads=4, vocab_size=32000),
        "llama8b": dict(hidden_size=4096, intermediate_size=14336,
                        num_hidden_layers=32, num_attention_heads=32,
                        num_key_value_heads=8, vocab_size=128256,
                        head_dim=128),
    }
    return parse_hf_config({
        "architectures": ["LlamaForCausalLM"],
        "max_position_embeddings": 4096, "rms_norm_eps": 1e-5,
        "rope_theta": 500000.0, **shapes[name]})


def run_mesh(n: int, cfg, quant, batch: int, steps: int,
             block_size: int) -> float:
    """Tokens/sec of the fused decode step on an n-device mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from ..engine.sampling import sample
    from ..models import llama as jl
    from ..models.common import AttnInputs, init_kv_cache
    from ..ops.quant import quantize_params
    from ..parallel.mesh import make_mesh
    from ..parallel.sharding import kv_cache_spec, shard_params

    # tp over kv heads when possible, else dp
    tp = n if cfg.num_kv_heads % n == 0 else 1
    dp = n // tp
    mesh = make_mesh(tensor_parallel=tp, data_parallel=dp)

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = jl.init_random_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if quant:
        params = quantize_params(params, quant)
    params = shard_params(params, mesh, cfg)

    B = batch
    MB = 4
    NB = B * MB + dp
    cache = init_kv_cache(cfg, NB, block_size, dtype=dtype)
    sh = NamedSharding(mesh, kv_cache_spec())
    cache = type(cache)(k=jax.device_put(cache.k, sh),
                        v=jax.device_put(cache.v, sh))

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    bt = put(jnp.asarray(np.arange(1, B * MB + 1, dtype=np.int32)
                         .reshape(B, MB)), P("data", None))
    tokens = put(jnp.zeros((B,), jnp.int32), P("data"))
    kv_lens = put(jnp.full((B,), block_size, jnp.int32), P("data"))
    active = put(jnp.ones((B,), bool), P("data"))
    seeds = put(jnp.arange(B, dtype=jnp.int32), P("data"))

    @jax.jit
    def decode_k(params, cache, tokens, kv_lens, steps_in):
        def body(carry, _):
            tokens, cache, kv_lens = carry
            attn = AttnInputs(block_tables=bt,
                              kv_lens=kv_lens + active.astype(jnp.int32),
                              positions=kv_lens[:, None],
                              write_mask=active[:, None])
            hidden, cache = jl.forward_hidden(params, cfg, tokens[:, None],
                                              attn, cache)
            logits = jl.logits_from_hidden(params, hidden[:, 0])
            toks = sample(logits, seeds=seeds, steps=steps_in,
                          temperature=jnp.zeros((B,), jnp.float32),
                          top_k=jnp.zeros((B,), jnp.int32),
                          top_p=jnp.ones((B,), jnp.float32),
                          min_p=jnp.zeros((B,), jnp.float32))
            return (toks, cache, kv_lens + 1), ()
        carry, _ = jax.lax.scan(body, (tokens, cache, kv_lens), (),
                                length=steps)
        return carry[0]

    steps_in = put(jnp.zeros((B,), jnp.int32), P("data"))
    out = decode_k(params, cache, tokens, kv_lens, steps_in)
    np.asarray(out)  # force (block_until_ready is lazy on remote backends)
    t0 = time.perf_counter()
    out = decode_k(params, cache, tokens, kv_lens, steps_in)
    np.asarray(out)
    dt = time.perf_counter() - t0
    return B * steps / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma list of mesh sizes (default: 1..all)")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--quant", default=None,
                    choices=[None, "none", "int8", "w8a8", "fp8", "int4"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--block-size", type=int, default=16)
    args = ap.parse_args(argv)

    import jax

    avail = len(jax.devices())
    if args.devices:
        sizes = [int(s) for s in args.devices.split(",")]
    else:
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= avail]
    cfg = model_cfg(args.model)
    quant = None if args.quant in (None, "none") else args.quant
    virtual = jax.default_backend() == "cpu"

    base = None
    rows = []
    for n in sizes:
        tps = run_mesh(n, cfg, quant, args.batch, args.steps,
                       args.block_size)
        if base is None:
            base = tps
        eff = tps / (base * n)
        rows.append({"devices": n, "tokens_per_sec": round(tps, 1),
                     "scaling_efficiency": round(eff, 4)})
        print(json.dumps({"mode": "virtual-cpu" if virtual else "tpu",
                          **rows[-1]}), flush=True)
    return rows


if __name__ == "__main__":
    main()
