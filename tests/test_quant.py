"""Quantization correctness: weight schemes, W8A8, int8 KV cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import tiny_llama_jax, jax_greedy
from vllm_backend_public_tpu.engine.config import EngineConfig
from vllm_backend_public_tpu.engine.engine import LLMEngine
from vllm_backend_public_tpu.engine.request import SamplingParams
from vllm_backend_public_tpu.ops.linear import matmul, quantize_activations
from vllm_backend_public_tpu.ops.quant import quantize_params


@pytest.fixture(scope="module")
def tiny():
    return tiny_llama_jax(hidden=128)  # 128-divisible for int4 groups


# int4's tolerance reflects 4-bit at group=hidden on a 3-layer random toy
# model (errors compound with depth); real-model accuracy is measured by
# the perplexity harness, not this smoke bound.
@pytest.mark.parametrize("kind,tol", [("int8", 0.03), ("w8a8", 0.05),
                                      ("fp8", 0.08), ("int4", 0.6)])
def test_quantized_logits_close_to_dense(tiny, kind, tol):
    """Relative logit error stays within the scheme's expected budget
    (the unit analog of the <=0.1 ppl-delta target, BASELINE.md)."""
    cfg, params, _ = tiny
    from vllm_backend_public_tpu.models import llama as jl
    from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache

    qp = quantize_params(params, kind)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=16).tolist()

    def logits(p):
        cache = init_kv_cache(cfg, 4, 8, dtype=jnp.float32)
        attn = AttnInputs(jnp.arange(1, 3, dtype=jnp.int32)[None, :],
                          jnp.array([16], jnp.int32),
                          jnp.arange(16, dtype=jnp.int32)[None, :],
                          jnp.ones((1, 16), bool))
        h, _ = jl.forward_hidden(p, cfg, jnp.asarray(tokens)[None, :], attn,
                                 cache)
        return np.asarray(jl.logits_from_hidden(p, h))[0, -1]

    dense = logits(params)
    quant = logits(qp)
    rel = np.abs(quant - dense).max() / (np.abs(dense).max() + 1e-9)
    assert rel < tol, f"{kind}: rel err {rel}"


def test_w8a8_matmul_math():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 256), dtype=jnp.float32)
    w = jax.random.normal(key, (256, 128), dtype=jnp.float32)
    from vllm_backend_public_tpu.ops.quant import quantize_w8a8

    qw = quantize_w8a8(w)
    out = matmul(x, qw)
    # manual reference
    x8, sx = quantize_activations(x)
    ref = (x8.astype(np.int64) @ np.asarray(qw.q, np.int64)
           ).astype(np.float32) * np.asarray(sx) * np.asarray(qw.s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)
    rel = np.abs(np.asarray(out) - np.asarray(x @ w)).max() / \
        np.abs(np.asarray(x @ w)).max()
    assert rel < 0.05


def test_int8_kv_cache_engine_greedy(tiny):
    """Engine with int8 KV produces outputs close to the bf16-KV run
    (identical early tokens on a well-separated trajectory)."""
    cfg, params, _ = tiny
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, cfg.vocab_size, size=12).tolist()

    def run(kv_dtype):
        engine = LLMEngine(
            EngineConfig(model="t", dtype="float32", kv_cache_dtype=kv_dtype,
                         block_size=8, max_num_seqs=2, max_model_len=64,
                         num_kv_blocks=32),
            model_cfg=cfg, params=params)
        outs = engine.generate([prompt], SamplingParams(
            max_tokens=6, temperature=0.0, ignore_eos=True))
        return outs[0].output_token_ids

    ref = run("float32")
    q = run("int8")
    assert ref == jax_greedy(cfg, params, prompt, 6)
    # int8 KV is lossy; demand agreement on the first few tokens
    assert q[:3] == ref[:3], (q, ref)


def test_int8_kv_write_read_roundtrip(tiny):
    """Scatter+gather through the quantized cache: dequantized values are
    close to the originals."""
    cfg, _, _ = tiny
    from vllm_backend_public_tpu.models.common import (
        AttnInputs, gather_pages, init_kv_cache, write_kv_layer)

    cache = init_kv_cache(cfg, 4, 8, dtype=jnp.int8)
    assert cache.quantized
    key = jax.random.PRNGKey(1)
    B, T = 1, 10
    nkv, d = cfg.num_kv_heads, cfg.head_dim
    k_new = jax.random.normal(key, (B, T, nkv, d), dtype=jnp.float32)
    bt = jnp.array([[1, 2]], jnp.int32)
    from vllm_backend_public_tpu.models.common import slot_ids_from_positions

    slots = slot_ids_from_positions(bt, jnp.arange(T, dtype=jnp.int32)[None, :], 8)
    kv = write_kv_layer((cache.k[0], cache.v[0], cache.k_scale[0],
                         cache.v_scale[0]), k_new, k_new, slots,
                        jnp.ones((B, T), bool))
    got = gather_pages(kv[0], bt, kv[2])[:, :, :T]  # [B, NKV, T, D]
    ref = k_new.transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.02, atol=0.02)
