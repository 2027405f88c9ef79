"""Sliding-window attention (Mistral): HF logit parity + op-level checks.

The reference serves Mistral-class models only through vLLM flags; here the
window is honored natively in every attention path (models/common.py,
ops/attention.py) — prefill (write-then-gather), chunked prefill
(deferred), decode (deferred; Pallas kernel skips below-window pages).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_backend_public_tpu.loader.hf import parse_hf_config
from vllm_backend_public_tpu.loader.safetensors import torch_state_dict_to_numpy
from vllm_backend_public_tpu.models import llama as jl
from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache

WINDOW = 8


def _tiny_mistral_torch():
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        sliding_window=WINDOW, attn_implementation="eager")
    torch.manual_seed(0)
    model = MistralForCausalLM(cfg)
    model.eval()
    return cfg, model


def _ours(cfg_dict, state_dict):
    cfg = parse_hf_config(cfg_dict)
    assert cfg.sliding_window == WINDOW
    params = jl.convert_hf_state_dict(
        torch_state_dict_to_numpy(state_dict), cfg, dtype=jnp.float32)
    return cfg, params


def _forward(cfg, params, tokens, start=0, cache=None, bs=8, mb=4):
    T = len(tokens)
    if cache is None:
        cache = init_kv_cache(cfg, num_blocks=mb + 1, block_size=bs,
                              dtype=jnp.float32)
    attn = AttnInputs(
        block_tables=jnp.arange(1, mb + 1, dtype=jnp.int32)[None, :],
        kv_lens=jnp.array([start + T], dtype=jnp.int32),
        positions=(start + jnp.arange(T, dtype=jnp.int32))[None, :],
        write_mask=jnp.ones((1, T), bool))
    h, cache = jl.forward_hidden(
        params, cfg, jnp.asarray(tokens, jnp.int32)[None, :], attn, cache)
    return np.asarray(jl.logits_from_hidden(params, h))[0], cache


def test_mistral_logits_match_hf():
    """Seq 3x longer than the window: full prefill parity vs HF eager."""
    import torch

    hf_cfg, model = _tiny_mistral_torch()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=3 * WINDOW).tolist()
    with torch.no_grad():
        ref = model(torch.tensor([tokens])).logits[0].float().numpy()
    cfg, params = _ours(hf_cfg.to_dict(), model.state_dict())
    ours, _ = _forward(cfg, params, tokens)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_windowed_decode_matches_full_prefill():
    """Chunked path then windowed decode == one windowed prefill."""
    hf_cfg, model = _tiny_mistral_torch()
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, size=2 * WINDOW + 3).tolist()
    cfg, params = _ours(hf_cfg.to_dict(), model.state_dict())

    full, _ = _forward(cfg, params, tokens)

    n = len(tokens) - 1
    _, cache = _forward(cfg, params, tokens[:n])
    step, _ = _forward(cfg, params, tokens[n:], start=n, cache=cache)
    np.testing.assert_allclose(step[0], full[-1], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("prefix_len", [5, WINDOW, 3 * WINDOW + 2])
def test_decode_kernel_window(prefix_len):
    """Pallas decode kernel (interpret) == XLA gather path with window."""
    from vllm_backend_public_tpu.ops.attention import (
        decode_attention_deferred, decode_attention_deferred_xla)

    B, NKV, G, D, BS, MB = 2, 2, 2, 8, 8, 8
    NH = NKV * G
    key = jax.random.PRNGKey(prefix_len)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, NH, D), jnp.float32)
    k_new = jax.random.normal(ks[1], (B, NKV, D), jnp.float32)
    v_new = jax.random.normal(ks[2], (B, NKV, D), jnp.float32)
    k_pages = jax.random.normal(ks[3], (B * MB + 1, NKV, BS, D), jnp.float32)
    v_pages = jax.random.normal(ks[4], (B * MB + 1, NKV, BS, D), jnp.float32)
    bt = jnp.asarray(np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB))
    pl_lens = jnp.full((B,), prefix_len, jnp.int32)

    want = decode_attention_deferred_xla(
        q, k_new, v_new, k_pages, v_pages, bt, pl_lens, 0.3, window=WINDOW)
    got = decode_attention_deferred(
        q, k_new, v_new, k_pages, v_pages, bt, pl_lens, 0.3,
        interpret=True, window=WINDOW)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_window_engine_end_to_end():
    """Engine greedy generation honors the window: same as full attention
    while context < window, still correct (vs stepwise oracle) beyond."""
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams

    hf_cfg, model = _tiny_mistral_torch()
    cfg, params = _ours(hf_cfg.to_dict(), model.state_dict())
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 256, size=WINDOW + 4).tolist()
    n_out = WINDOW

    eng = LLMEngine(
        EngineConfig(model="m", dtype="float32", block_size=8,
                     max_num_seqs=2, max_model_len=64, num_kv_blocks=32,
                     enable_prefix_caching=False),
        model_cfg=cfg, params=params)
    out = eng.generate([prompt],
                       SamplingParams(max_tokens=n_out, temperature=0.0,
                                      ignore_eos=True))[0].output_token_ids

    # stepwise oracle: full re-prefill per token through the same model
    seq = list(prompt)
    want = []
    for _ in range(n_out):
        logits, _ = _forward(cfg, params, seq, mb=8)
        tok = int(np.argmax(logits[-1]))
        want.append(tok)
        seq.append(tok)
    assert out == want


@pytest.mark.slow
def test_window_page_recycling():
    """Pages wholly below the window are freed back to the pool during
    decode (block-table entries become the null block) without changing
    the generated tokens."""
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams

    hf_cfg, model = _tiny_mistral_torch()
    cfg, params = _ours(hf_cfg.to_dict(), model.state_dict())
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 256, size=12).tolist()
    n_out = 24

    eng = LLMEngine(
        EngineConfig(model="m", dtype="float32", block_size=4,
                     max_num_seqs=2, max_model_len=64, num_kv_blocks=24,
                     enable_prefix_caching=False, decode_steps_per_call=2),
        model_cfg=cfg, params=params)
    assert eng.scheduler.sliding_window == WINDOW
    rid = eng.add_request(prompt, SamplingParams(
        max_tokens=n_out, temperature=0.0, ignore_eos=True))
    req = eng._requests[rid]

    saw_recycled = False
    out = []
    while eng.has_unfinished():
        for o in eng.step():
            out.extend(o.new_token_ids)
        if req.block_ids and req.block_ids[0] == 0:
            saw_recycled = True
    assert saw_recycled, "head pages were never recycled"
    # pool fully restored after finish (no leaked / double-freed pages)
    assert eng.allocator.num_free == eng.allocator.num_blocks - 1

    # stepwise oracle: full re-prefill per token
    seq = list(prompt)
    want = []
    for _ in range(n_out):
        logits, _ = _forward(cfg, params, seq, bs=4, mb=16)
        tok = int(np.argmax(logits[-1]))
        want.append(tok)
        seq.append(tok)
    assert out == want


@pytest.mark.slow
def test_window_engine_multi_step_lookahead():
    """Sliding-window models on the lookahead multi-step decode path:
    K fused steps (pending buffer, window bound at the TRUE query
    position prefix+count) == single-step decode."""
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams

    hf_cfg, model = _tiny_mistral_torch()
    cfg, params = _ours(hf_cfg.to_dict(), model.state_dict())
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 256, size=n).tolist()
               for n in (WINDOW + 3, 5)]
    sp = SamplingParams(max_tokens=WINDOW, temperature=0.0,
                        ignore_eos=True)

    def run(k):
        eng = LLMEngine(
            EngineConfig(model="m", dtype="float32", block_size=8,
                         max_num_seqs=2, max_model_len=64,
                         num_kv_blocks=32, enable_prefix_caching=False,
                         decode_steps_per_call=k),
            model_cfg=cfg, params=params)
        return [o.output_token_ids for o in eng.generate(prompts, sp)]

    assert run(4) == run(1)


@pytest.mark.parametrize("prefix_len", [0, 3, WINDOW + 9])
def test_chunk_prefill_kernel_window(prefix_len):
    """Windowed chunked prefill on the KERNEL path (per-row window
    bounds, round-2 gap: window forced the XLA gather path) == the XLA
    path. Rows early in the chunk have smaller windows than later rows;
    pages the page-skip clamp keeps for late rows are fully masked for
    early rows (the in-kernel p-remask guards that)."""
    from vllm_backend_public_tpu.ops.attention import (
        chunk_prefill_attention_deferred)

    B, T, MB, BS, NB, nh, nkv, d = 2, 8, 6, 8, 32, 4, 2, 128
    key = jax.random.PRNGKey(prefix_len)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, T, nh, d), jnp.float32)
    kc = jax.random.normal(ks[1], (B, T, nkv, d), jnp.float32)
    vc = jax.random.normal(ks[2], (B, T, nkv, d), jnp.float32)
    k_pages = jax.random.normal(ks[3], (NB, nkv, BS, d), jnp.float32)
    v_pages = jax.random.normal(ks[4], (NB, nkv, BS, d), jnp.float32)
    bt = jax.random.permutation(ks[5], jnp.arange(1, NB))[:B * MB]
    bt = bt.reshape(B, MB).astype(jnp.int32)
    prefix = jnp.asarray([prefix_len, max(prefix_len - 2, 0)], jnp.int32)
    wmask = jnp.array([[True] * T, [True] * 5 + [False] * 3])
    scale = 1.0 / np.sqrt(d)

    ref = chunk_prefill_attention_deferred(
        q, kc, vc, k_pages, v_pages, bt, prefix, wmask, scale,
        interpret=True, use_kernel=False, window=WINDOW)
    out = chunk_prefill_attention_deferred(
        q, kc, vc, k_pages, v_pages, bt, prefix, wmask, scale,
        interpret=True, use_kernel=True, window=WINDOW)
    for b in range(2):
        n = int(jnp.sum(wmask[b]))
        np.testing.assert_allclose(
            np.asarray(out)[b, :n], np.asarray(ref)[b, :n],
            rtol=3e-5, atol=3e-5, err_msg=f"b={b}")
