"""Logit parity of the JAX models vs HF transformers (torch CPU).

No-egress environment: fixtures are tiny random-weight HF models built
locally, converted in-memory. This replaces the reference's "deploy real
vLLM on CPU and curl it" strategy (SURVEY.md §4) with real unit tests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_backend_public_tpu.loader.hf import parse_hf_config
from vllm_backend_public_tpu.loader.safetensors import torch_state_dict_to_numpy
from vllm_backend_public_tpu.models import llama as jl
from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache


def _tiny_llama_torch(num_kv_heads=4):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=num_kv_heads, max_position_embeddings=128,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model.eval()
    return cfg, model


def _run_ours(cfg_dict, state_dict, tokens, attn_impl="xla"):
    cfg = parse_hf_config(cfg_dict)
    params = jl.convert_hf_state_dict(
        torch_state_dict_to_numpy(state_dict), cfg, dtype=jnp.float32)
    T = len(tokens)
    block_size = 8
    mb = (T + block_size - 1) // block_size
    cache = init_kv_cache(cfg, num_blocks=mb + 1, block_size=block_size,
                          dtype=jnp.float32)
    attn = AttnInputs(
        block_tables=jnp.arange(1, mb + 1, dtype=jnp.int32)[None, :],
        kv_lens=jnp.array([T], dtype=jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        write_mask=jnp.ones((1, T), dtype=bool),
    )
    hidden, cache = jl.forward_hidden(
        params, cfg, jnp.asarray(tokens, dtype=jnp.int32)[None, :], attn,
        cache, attn_impl=attn_impl)
    logits = jl.logits_from_hidden(params, hidden)
    return np.asarray(logits[0]), cache, cfg, params


@pytest.mark.parametrize("num_kv_heads", [4, 2])  # MHA and GQA
def test_llama_logits_match_hf(num_kv_heads):
    import torch

    cfg, model = _tiny_llama_torch(num_kv_heads)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=21).tolist()
    with torch.no_grad():
        ref = model(torch.tensor([tokens])).logits[0].float().numpy()
    ours, _, _, _ = _run_ours(cfg.to_dict(), model.state_dict(), tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_llama_decode_step_matches_prefill():
    """Prefill N tokens then decode one more == prefill N+1 at once."""
    cfg, model = _tiny_llama_torch()
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, size=12).tolist()

    full, _, _, _ = _run_ours(cfg.to_dict(), model.state_dict(), tokens)

    # prefill first 11, then decode token 12
    mcfg = parse_hf_config(cfg.to_dict())
    params = jl.convert_hf_state_dict(
        torch_state_dict_to_numpy(model.state_dict()), mcfg, dtype=jnp.float32)
    block_size = 8
    cache = init_kv_cache(mcfg, num_blocks=3, block_size=block_size,
                          dtype=jnp.float32)
    bt = jnp.array([[1, 2]], dtype=jnp.int32)
    attn_prefill = AttnInputs(
        block_tables=bt, kv_lens=jnp.array([11], dtype=jnp.int32),
        positions=jnp.arange(11, dtype=jnp.int32)[None, :],
        write_mask=jnp.ones((1, 11), dtype=bool))
    _, cache = jl.forward_hidden(
        params, mcfg, jnp.asarray(tokens[:11], dtype=jnp.int32)[None, :],
        attn_prefill, cache)
    attn_decode = AttnInputs(
        block_tables=bt, kv_lens=jnp.array([12], dtype=jnp.int32),
        positions=jnp.array([[11]], dtype=jnp.int32),
        write_mask=jnp.ones((1, 1), dtype=bool))
    hidden, cache = jl.forward_hidden(
        params, mcfg, jnp.asarray([[tokens[11]]], dtype=jnp.int32),
        attn_decode, cache)
    step_logits = np.asarray(jl.logits_from_hidden(params, hidden))[0, 0]
    np.testing.assert_allclose(step_logits, full[-1], rtol=2e-4, atol=2e-4)


def test_padding_queries_are_inert():
    """Padded (masked) tokens must not corrupt the cache or real logits."""
    cfg, model = _tiny_llama_torch()
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 256, size=9).tolist()
    full, _, _, _ = _run_ours(cfg.to_dict(), model.state_dict(), tokens)

    mcfg = parse_hf_config(cfg.to_dict())
    params = jl.convert_hf_state_dict(
        torch_state_dict_to_numpy(model.state_dict()), mcfg, dtype=jnp.float32)
    cache = init_kv_cache(mcfg, num_blocks=4, block_size=8, dtype=jnp.float32)
    T_pad = 16
    padded = tokens + [0] * (T_pad - len(tokens))
    attn = AttnInputs(
        block_tables=jnp.array([[1, 2]], dtype=jnp.int32),
        kv_lens=jnp.array([9], dtype=jnp.int32),
        positions=jnp.arange(T_pad, dtype=jnp.int32)[None, :],
        write_mask=(jnp.arange(T_pad) < 9)[None, :],
    )
    hidden, cache = jl.forward_hidden(
        params, mcfg, jnp.asarray(padded, dtype=jnp.int32)[None, :], attn, cache)
    logits = np.asarray(jl.logits_from_hidden(params, hidden))[0, :9]
    np.testing.assert_allclose(logits, full, rtol=2e-4, atol=2e-4)
    assert np.all(np.isfinite(np.asarray(hidden)))
