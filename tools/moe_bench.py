"""MoE decode throughput on one chip (BASELINE config #5's 1-chip cell).

Mixtral-8x7B itself cannot fit a single v5e (47B params), so this runs a
Mixtral-ARCHITECTURE model scaled to fit (8 experts, top-2 routing, same
grouped expert path the full model uses) with int8/fp8 experts, through
the real engine: random weights, B sequences, fused multi-step decode.
Prints one summary line; the grouped path computes only routed
assignments (top-k/E of the dense expert FLOPs).

Usage: python tools/moe_bench.py [--quant fp8] [--batch 32] [--steps 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="fp8",
                    choices=["none", "int8", "w8a8", "fp8"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--multi-step", type=int, default=16)
    ap.add_argument("--layers", type=int, default=8,
                help="8 (2.5 GB quantized) fits one v5e with headroom; 12+ hits HBM limits at prefill")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams
    from vllm_backend_public_tpu.loader.hf import parse_hf_config
    from vllm_backend_public_tpu.models.mixtral import init_random_params
    from vllm_backend_public_tpu.ops.quant import quantize_params

    cfg = parse_hf_config({
        "architectures": ["MixtralForCausalLM"],
        "hidden_size": 2048, "intermediate_size": 5632,
        "num_hidden_layers": args.layers, "num_attention_heads": 32,
        "num_key_value_heads": 8, "vocab_size": 32000,
        "num_local_experts": 8, "num_experts_per_tok": 2,
        "max_position_embeddings": 4096, "rms_norm_eps": 1e-5,
        "rope_theta": 1e6})
    params = init_random_params(cfg, jax.random.PRNGKey(0),
                                dtype=jnp.bfloat16)
    quant = None if args.quant == "none" else args.quant
    if quant:
        params = quantize_params(params, quant)
    n_bytes = sum(
        (x.q.size if hasattr(x, "q") else x.size)
        * (1 if hasattr(x, "q") else x.dtype.itemsize)
        for x in jax.tree.leaves(params, is_leaf=lambda v: hasattr(v, "q")))

    B = args.batch
    mb = 3
    econ = EngineConfig(
        model="mixtral-scaled", dtype="bfloat16", quantization=quant,
        kv_cache_dtype="int8", block_size=128, max_num_seqs=B,
        max_model_len=128 * mb, max_num_batched_tokens=1024,
        num_kv_blocks=B * mb + 1,
        decode_steps_per_call=args.multi_step,
        max_consecutive_prefills=0)
    engine = LLMEngine(econ, model_cfg=cfg, params=params)

    rng = np.random.default_rng(0)
    warm, n_calls = 2, max(args.steps // args.multi_step, 1)
    budget = (warm + n_calls + 1) * args.multi_step
    sp = SamplingParams(max_tokens=budget, temperature=0.0, ignore_eos=True)
    for _ in range(B):
        engine.add_request(
            rng.integers(0, cfg.vocab_size, size=args.prompt_len).tolist(),
            sp)
    while engine.scheduler.num_waiting:
        engine.step()
    for _ in range(warm):
        engine.step()
    t0 = time.perf_counter()
    done = 0
    for _ in range(n_calls):
        done += sum(len(o.new_token_ids) for o in engine.step())
    dt = time.perf_counter() - t0
    print(f"mixtral-arch L={args.layers} E=8 top2 {args.quant} B={B}: "
          f"{done / dt:.1f} tok/s/chip, "
          f"step={dt / (n_calls * args.multi_step) * 1e3:.2f} ms, "
          f"params={n_bytes / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
