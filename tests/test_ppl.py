"""Perplexity harness sanity: quantization deltas ordered as expected."""

import numpy as np
import pytest

from fixtures import tiny_llama_jax
from vllm_backend_public_tpu.benchmarks.ppl import (perplexity,
                                                    ppl_delta_report)

import jax.numpy as jnp


def test_ppl_delta_ordering():
    cfg, params, _ = tiny_llama_jax(hidden=128)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=256).tolist()
    report = ppl_delta_report(params, cfg, tokens, ["int8", "int4"],
                              seq_len=64, max_seqs=2)
    assert report["dense"]["ppl"] > 0
    # int8 must be much tighter than int4
    assert abs(report["int8"]["delta"]) < abs(report["int4"]["delta"]) + 1e-6
    # random tiny model: int8 delta should still be a small fraction of ppl
    assert abs(report["int8"]["delta"]) / report["dense"]["ppl"] < 0.05


def test_ppl_int8_kv_cache_close():
    cfg, params, _ = tiny_llama_jax(hidden=128)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=128).tolist()
    base = perplexity(params, cfg, tokens, seq_len=64, max_seqs=2,
                      kv_dtype=jnp.float32)
    q = perplexity(params, cfg, tokens, seq_len=64, max_seqs=2,
                   kv_dtype=jnp.int8)
    assert abs(q - base) / base < 0.02
