"""Perplexity harness — the accuracy side of the quantization targets.

Measures teacher-forced perplexity of a model (optionally quantized) over
a token corpus, and the ppl delta quantized-vs-dense (BASELINE.md target:
<= 0.1 ppl delta vs FP16 at INT8/FP8).

Library use:
    ppl = perplexity(params, cfg, tokens)                # float
    report = ppl_delta_report(params, cfg, tokens, ["int8", "w8a8"])

CLI (real checkpoint):
    python -m vllm_backend_public_tpu.benchmarks.ppl \
        --model /data/local_models/Meta-Llama-3-8B --quant int8 \
        --data /path/corpus.txt
"""

from __future__ import annotations

import argparse
import json
import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..loader.hf import ModelConfig
from ..models import get_model
from ..models.common import AttnInputs, init_kv_cache


def _seq_nll(params, cfg: ModelConfig, seq: np.ndarray,
             kv_dtype=jnp.bfloat16, attn_impl: str = "xla",
             chunk: int = 64):
    """Summed next-token NLL and token count for one sequence.

    The sequence is processed in CHUNKS like serving-time chunked
    prefill, so every chunk after the first attends through the cached —
    possibly quantized — KV pages. A single full-length pass would keep
    all attention in-chunk and never read the cache, making int8-KV
    deltas trivially zero."""
    fam = get_model(cfg.arch)
    T = len(seq)
    bs = 16
    mb = -(-T // bs)
    cache = init_kv_cache(cfg, mb + 1, bs, dtype=kv_dtype)
    bt = jnp.arange(1, mb + 1, dtype=jnp.int32)[None, :]
    nll = 0.0
    logps = []
    for start in range(0, T, chunk):
        end = min(start + chunk, T)
        attn = AttnInputs(
            block_tables=bt,
            kv_lens=jnp.array([end], jnp.int32),
            positions=jnp.arange(start, end, dtype=jnp.int32)[None, :],
            write_mask=jnp.ones((1, end - start), bool))
        hidden, cache = fam.forward_hidden(
            params, cfg,
            jnp.asarray(seq[start:end], dtype=jnp.int32)[None, :], attn,
            cache, attn_impl=attn_impl)
        logps.append(fam.logits_from_hidden(params, hidden)[0])
    logits = jnp.concatenate(logps, axis=0)            # [T, V] f32
    logp = jax.nn.log_softmax(logits[:-1], axis=-1)
    tgt = jnp.asarray(seq[1:], dtype=jnp.int32)
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1).sum()
    return float(nll), T - 1


def perplexity(params, cfg: ModelConfig, tokens: Sequence[int],
               seq_len: int = 512, max_seqs: int = 0,
               kv_dtype=jnp.bfloat16) -> float:
    tokens = np.asarray(tokens, dtype=np.int32)
    n_seq = len(tokens) // seq_len
    if max_seqs:
        n_seq = min(n_seq, max_seqs)
    if n_seq == 0:
        raise ValueError(f"need >= {seq_len} tokens")
    total_nll = 0.0
    total_tok = 0
    for i in range(n_seq):
        nll, n = _seq_nll(params, cfg,
                          tokens[i * seq_len:(i + 1) * seq_len],
                          kv_dtype=kv_dtype)
        total_nll += nll
        total_tok += n
    return math.exp(total_nll / total_tok)


def ppl_delta_report(params, cfg: ModelConfig, tokens: Sequence[int],
                     kinds: List[str], seq_len: int = 512,
                     max_seqs: int = 0) -> Dict[str, dict]:
    """Dense ppl + per-scheme quantized ppl and delta."""
    from ..ops.quant import quantize_params

    base = perplexity(params, cfg, tokens, seq_len, max_seqs)
    out = {"dense": {"ppl": base}}
    for kind in kinds:
        if kind == "int4_awq":
            # activation-aware calibration on the same corpus (AWQ scale
            # fold + weighted clip + GPTQ compensation, ops/awq.py)
            from ..ops.awq import awq_quantize_llama
            qp = awq_quantize_llama(params, cfg, tokens)
        else:
            qp = quantize_params(params, kind)
        p = perplexity(qp, cfg, tokens, seq_len, max_seqs)
        out[kind] = {"ppl": p, "delta": p - base}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--data", required=True,
                    help="text file (tokenized with the model tokenizer)")
    ap.add_argument("--quant", nargs="*", default=["int8"])
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--max-seqs", type=int, default=16)
    args = ap.parse_args()

    from ..engine.tokenizer import Tokenizer
    from ..loader.safetensors import load_model

    cfg, params = load_model(args.model)
    tok = Tokenizer.from_path(args.model)
    with open(args.data) as f:
        tokens = tok.encode(f.read())
    report = ppl_delta_report(params, cfg, tokens, args.quant,
                              args.seq_len, args.max_seqs)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
