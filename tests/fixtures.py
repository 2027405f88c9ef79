"""Shared tiny-model fixtures (random weights, built locally — no egress)."""

import numpy as np
import jax.numpy as jnp

from vllm_backend_public_tpu.loader.hf import parse_hf_config
from vllm_backend_public_tpu.loader.safetensors import torch_state_dict_to_numpy


def tiny_llama_torch(num_kv_heads=4, num_layers=3, hidden=64, vocab=256,
                     seed=0):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=num_layers, num_attention_heads=4,
        num_key_value_heads=num_kv_heads, max_position_embeddings=256,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    model = LlamaForCausalLM(cfg)
    model.eval()
    return cfg, model


def tiny_llama_jax(num_kv_heads=4, dtype=jnp.float32, **kw):
    from vllm_backend_public_tpu.models.llama import convert_hf_state_dict

    hf_cfg, model = tiny_llama_torch(num_kv_heads, **kw)
    cfg = parse_hf_config(hf_cfg.to_dict())
    params = convert_hf_state_dict(
        torch_state_dict_to_numpy(model.state_dict()), cfg, dtype=dtype)
    return cfg, params, model


def hf_greedy(model, prompt_ids, max_new_tokens):
    import torch

    with torch.no_grad():
        out = model.generate(
            torch.tensor([prompt_ids]), max_new_tokens=max_new_tokens,
            do_sample=False, eos_token_id=None, pad_token_id=0)
    return out[0].tolist()[len(prompt_ids):]


def jax_greedy(cfg, params, prompt_ids, max_new_tokens):
    """Exact greedy reference: full re-prefill per step through the same
    model code, no batching/paging reuse. Trajectory oracle for engine tests
    (HF trajectories can diverge on sub-1e-2 logit ties between fp32 stacks;
    logit-level HF parity is asserted separately in test_model_parity)."""
    from vllm_backend_public_tpu.models import get_model
    from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache

    fam = get_model(cfg.arch)
    seq = list(prompt_ids)
    out = []
    for _ in range(max_new_tokens):
        T = len(seq)
        bs = 8
        mb = (T + bs - 1) // bs
        cache = init_kv_cache(cfg, num_blocks=mb + 1, block_size=bs,
                              dtype=jnp.float32)
        attn = AttnInputs(
            jnp.arange(1, mb + 1, dtype=jnp.int32)[None, :],
            jnp.array([T], dtype=jnp.int32),
            jnp.arange(T, dtype=jnp.int32)[None, :],
            jnp.ones((1, T), bool))
        h, _ = fam.forward_hidden(
            params, cfg, jnp.asarray(seq, dtype=jnp.int32)[None, :], attn, cache)
        logits = np.asarray(fam.logits_from_hidden(params, h))[0, -1]
        tok = int(np.argmax(logits))
        out.append(tok)
        seq.append(tok)
    return out
