"""Quantization-accuracy report: ppl deltas per scheme + int8 KV.

No model checkpoints exist in this image (zero egress), so the corpus is
SELF-GENERATED: an HF-initialized model samples its own text, then
perplexity is measured teacher-forced on those sequences — near the
model's own entropy, so quantization deltas measure how each scheme
shifts the model's distribution (the quantity the <=0.1-ppl budget
bounds; BASELINE.md accuracy row). With a real checkpoint the same
harness runs unchanged:
  python -m vllm_backend_public_tpu.benchmarks.ppl --model DIR --quant int8

Usage: python tools/ppl_report.py [--layers 8] [--hidden 512] [--seqs 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from vllm_backend_public_tpu.benchmarks.ppl import (perplexity,
                                                        ppl_delta_report)
    from vllm_backend_public_tpu.loader.hf import parse_hf_config
    from vllm_backend_public_tpu.loader.safetensors import \
        torch_state_dict_to_numpy
    from vllm_backend_public_tpu.models.llama import convert_hf_state_dict

    hf_cfg = LlamaConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.hidden * 3,
        num_hidden_layers=args.layers, num_attention_heads=8,
        num_key_value_heads=4, max_position_embeddings=1024,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()

    # self-generated corpus: sample from the model's own distribution
    torch.manual_seed(1)
    prompts = torch.randint(0, args.vocab, (args.seqs, 4))
    with torch.no_grad():
        gen = model.generate(prompts, max_new_tokens=args.seq_len - 4,
                             do_sample=True, temperature=1.0,
                             pad_token_id=0)
    tokens = gen.reshape(-1).tolist()

    cfg = parse_hf_config(hf_cfg.to_dict())
    params = convert_hf_state_dict(
        torch_state_dict_to_numpy(model.state_dict()), cfg,
        dtype=jnp.float32)

    report = ppl_delta_report(params, cfg, tokens,
                              ["int8", "fp8", "w8a8", "int4", "int4_awq"],
                              seq_len=args.seq_len, max_seqs=args.seqs)
    base = perplexity(params, cfg, tokens, seq_len=args.seq_len,
                      max_seqs=args.seqs, kv_dtype=jnp.float32)
    q_kv = perplexity(params, cfg, tokens, seq_len=args.seq_len,
                      max_seqs=args.seqs, kv_dtype=jnp.int8)
    report["int8_kv_cache"] = {"ppl": round(q_kv, 4),
                               "delta": round(q_kv - base, 4)}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
