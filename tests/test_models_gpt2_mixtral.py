"""Logit parity for gpt2 (DialoGPT-class) and mixtral families vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp

from vllm_backend_public_tpu.loader.hf import parse_hf_config
from vllm_backend_public_tpu.loader.safetensors import torch_state_dict_to_numpy
from vllm_backend_public_tpu.models import get_model
from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache


def run_ours(arch, cfg_dict, state_dict, tokens):
    cfg = parse_hf_config(cfg_dict)
    fam = get_model(cfg.arch)
    params = fam.convert_hf_state_dict(
        torch_state_dict_to_numpy(state_dict), cfg, dtype=jnp.float32)
    T = len(tokens)
    bs = 8
    mb = (T + bs - 1) // bs
    cache = init_kv_cache(cfg, num_blocks=mb + 1, block_size=bs,
                          dtype=jnp.float32)
    attn = AttnInputs(
        block_tables=jnp.arange(1, mb + 1, dtype=jnp.int32)[None, :],
        kv_lens=jnp.array([T], dtype=jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        write_mask=jnp.ones((1, T), dtype=bool))
    hidden, _ = fam.forward_hidden(
        params, cfg, jnp.asarray(tokens, dtype=jnp.int32)[None, :], attn,
        cache)
    return np.asarray(fam.logits_from_hidden(params, hidden))[0]


def test_gpt2_logits_match_hf():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(vocab_size=256, n_positions=128, n_embd=64, n_layer=3,
                     n_head=4, attn_implementation="eager")
    torch.manual_seed(0)
    model = GPT2LMHeadModel(cfg)
    model.eval()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=17).tolist()
    with torch.no_grad():
        ref = model(torch.tensor([tokens])).logits[0].float().numpy()
    sd = {k.replace("transformer.", ""): v
          for k, v in model.state_dict().items()}
    ours = run_ours("gpt2", cfg.to_dict(), sd, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_mixtral_logits_match_hf():
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(0)
    model = MixtralForCausalLM(cfg)
    model.eval()
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, size=13).tolist()
    with torch.no_grad():
        ref = model(torch.tensor([tokens])).logits[0].float().numpy()
    ours = run_ours("mixtral", cfg.to_dict(), model.state_dict(), tokens)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_mixtral_engine_generates():
    """MoE through the full engine (continuous batching path)."""
    import jax

    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams
    from vllm_backend_public_tpu.models import mixtral as mx

    cfg = parse_hf_config({
        "architectures": ["MixtralForCausalLM"], "vocab_size": 128,
        "hidden_size": 32, "intermediate_size": 48, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "max_position_embeddings": 128, "rms_norm_eps": 1e-5})
    params = mx.init_random_params(cfg, jax.random.PRNGKey(0))
    engine = LLMEngine(
        EngineConfig(model="moe", dtype="float32", block_size=8,
                     max_num_seqs=2, max_model_len=64, num_kv_blocks=20),
        model_cfg=cfg, params=params)
    outs = engine.generate([[1, 2, 3], [4, 5, 6, 7]],
                           SamplingParams(max_tokens=5, temperature=0.0,
                                          ignore_eos=True))
    assert all(len(o.output_token_ids) == 5 for o in outs)
