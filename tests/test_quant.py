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


# ------------------------------------------------------- AWQ-style int4

def _self_corpus(cfg, params, n_tokens=1024, seed=3):
    """Calibration/eval corpus sampled from the model itself (no egress:
    the protocol tools/ppl_report.py documents)."""
    import torch
    from fixtures import tiny_llama_torch
    rng = np.random.default_rng(seed)
    return rng.integers(0, cfg.vocab_size, size=n_tokens).tolist()


def test_awq_scale_fold_is_exact(tiny):
    """quantize=False returns scale-folded FP params: the folds (norm /
    s, wv out-channels, wu out-channels, lm_head via final_norm) are
    linear identities, so logits must match the original params."""
    from vllm_backend_public_tpu.models import llama as jl
    from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache
    from vllm_backend_public_tpu.ops.awq import awq_quantize_llama

    cfg, params, _ = tiny
    toks = _self_corpus(cfg, params, 256)
    folded = awq_quantize_llama(params, cfg, toks, group_size=64,
                                seq_len=64, n_rows=64, n_grid=3,
                                quantize=False)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=12).tolist()

    def logits(p):
        cache = init_kv_cache(cfg, 4, 8, dtype=jnp.float32)
        attn = AttnInputs(jnp.arange(1, 3, dtype=jnp.int32)[None, :],
                          jnp.array([12], jnp.int32),
                          jnp.arange(12, dtype=jnp.int32)[None, :],
                          jnp.ones((1, 12), bool))
        h, _ = jl.forward_hidden(p, cfg, jnp.asarray(tokens)[None, :], attn,
                                 cache)
        return np.asarray(jl.logits_from_hidden(p, h))[0, -1]

    ref = logits(params)
    out = logits(folded)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_awq_int4_beats_rtn_int4():
    """Activation-aware calibration must cut the int4 ppl delta vs plain
    round-to-nearest (VERDICT r2 #5: RTN was +14.2% relative).

    Protocol = tools/ppl_report.py: an HF-initialized model SAMPLES its
    own corpus (low-entropy, quant-sensitive); uniform-random tokens or
    a sub-~256-hidden model put base ppl at ~vocab_size and drown quant
    deltas in noise. Measured at this config: RTN +4.5%, AWQ+GPTQ +1.8%
    (and +14.2% -> +2.2% at the full ppl_report scale)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    from vllm_backend_public_tpu.benchmarks.ppl import perplexity
    from vllm_backend_public_tpu.loader.hf import parse_hf_config
    from vllm_backend_public_tpu.loader.safetensors import \
        torch_state_dict_to_numpy
    from vllm_backend_public_tpu.models.llama import convert_hf_state_dict
    from vllm_backend_public_tpu.ops.awq import awq_quantize_llama

    hf_cfg = LlamaConfig(
        vocab_size=2048, hidden_size=256, intermediate_size=768,
        num_hidden_layers=6, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=1024, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    cfg = parse_hf_config(hf_cfg.to_dict())
    params = convert_hf_state_dict(
        torch_state_dict_to_numpy(model.state_dict()), cfg,
        dtype=jnp.float32)
    torch.manual_seed(1)
    prompts = torch.randint(0, cfg.vocab_size, (4, 4))
    with torch.no_grad():
        gen = model.generate(prompts, max_new_tokens=252, do_sample=True,
                             temperature=1.0, pad_token_id=0)
    toks = gen.reshape(-1).tolist()
    base = perplexity(params, cfg, toks, seq_len=256, max_seqs=4,
                      kv_dtype=jnp.float32)
    rtn = perplexity(quantize_params(params, "int4"), cfg, toks,
                     seq_len=256, max_seqs=4, kv_dtype=jnp.float32)
    awq = perplexity(
        awq_quantize_llama(params, cfg, toks, group_size=128, seq_len=128,
                           n_rows=256), cfg, toks, seq_len=256, max_seqs=4,
        kv_dtype=jnp.float32)
    assert awq < rtn, (base, rtn, awq)
    # the activation-aware pass should recover most of the RTN damage
    assert (awq - base) < 0.6 * (rtn - base), (base, rtn, awq)


def test_int8_pending_buffer_matches_bf16_buffer(tiny, monkeypatch):
    """round 5: the int8 lookahead buffer (quantize-at-write) must flush a
    bit-identical cache and keep decode on the same greedy trajectory as
    the kill-switched (float-buffer) engine: both quantize the SAME
    values with the SAME quantize_kv — only WHERE attention reads the
    in-flight tokens differs (quantized a few steps earlier)."""
    cfg, params, _ = tiny
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).tolist()
               for n in (9, 13)]

    def run(flag):
        monkeypatch.setenv("VBPT_PENDING_INT8", flag)
        engine = LLMEngine(
            EngineConfig(model="t", dtype="float32", kv_cache_dtype="int8",
                         block_size=8, max_num_seqs=2, max_model_len=64,
                         num_kv_blocks=32, decode_steps_per_call=4),
            model_cfg=cfg, params=params)
        outs = engine.generate(prompts, SamplingParams(
            max_tokens=10, temperature=0.0, ignore_eos=True))
        return [o.output_token_ids for o in outs]

    on = run("1")
    off = run("0")
    # int8-KV decode is lossy either way; the two buffer disciplines
    # read in-flight tokens at slightly different precision, so demand
    # agreement on a solid prefix of every sequence
    for a, b in zip(on, off):
        assert a[:6] == b[:6], (a, b)


def test_quantized_pending_attention_parity():
    """ops-level: int8 pending + scales through the kernel == the same
    buffer dequantized up front (both interpret-mode, all paths)."""
    from vllm_backend_public_tpu.models.common import quantize_kv
    from vllm_backend_public_tpu.ops.attention import (
        decode_attention_deferred, decode_attention_deferred_xla)

    B, MB, BS, NB, nh, nkv, d = 4, 2, 16, 32, 8, 8, 64
    L, K = 3, 8
    key = jax.random.PRNGKey(21)
    ks = jax.random.split(key, 9)
    q = jax.random.normal(ks[0], (B, nh, d), jnp.float32)
    kn = jax.random.normal(ks[1], (B, nkv, d), jnp.float32)
    vn = jax.random.normal(ks[2], (B, nkv, d), jnp.float32)
    kp = jax.random.normal(ks[3], (L, NB, nkv, BS, d), jnp.float32)
    vp = jax.random.normal(ks[4], (L, NB, nkv, BS, d), jnp.float32)
    bt = jax.random.permutation(ks[5], jnp.arange(1, NB))[:B * MB] \
        .reshape(B, MB).astype(jnp.int32)
    pl_ = jnp.asarray([7, BS * 2, BS * MB - 1, 0], jnp.int32)
    scale = 1.0 / np.sqrt(d)
    pkb = jax.random.normal(ks[6], (L, K, B, nkv, d), jnp.float32)
    pvb = jax.random.normal(ks[7], (L, K, B, nkv, d), jnp.float32)
    pkq, pks = quantize_kv(pkb)
    pvq, pvs = quantize_kv(pvb)
    pk_dq = pkq.astype(jnp.float32) * pks[..., None]
    pv_dq = pvq.astype(jnp.float32) * pvs[..., None]
    cnt = jnp.int32(5)
    lay = jnp.int32(1)
    for manual in (False, True):
        for window in (None, BS + 3):
            a = decode_attention_deferred(
                q, kn, vn, kp, vp, bt, pl_, scale, interpret=True,
                pending=(pkq, pvq, cnt, pks, pvs), layer=lay,
                manual=manual, window=window)
            b = decode_attention_deferred(
                q, kn, vn, kp, vp, bt, pl_, scale, interpret=True,
                pending=(pk_dq, pv_dq, cnt), layer=lay, manual=manual,
                window=window)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
    # XLA reference (page-shaped 5-tuple, stacked pools via layer)
    xr = decode_attention_deferred_xla(
        q, kn, vn, kp, vp, bt, pl_, scale, layer=lay,
        pending=(pkq[1].transpose(1, 2, 0, 3), pvq[1].transpose(1, 2, 0, 3),
                 cnt, pks[1].transpose(1, 2, 0), pvs[1].transpose(1, 2, 0)))
    a = decode_attention_deferred(
        q, kn, vn, kp, vp, bt, pl_, scale, interpret=True,
        pending=(pkq, pvq, cnt, pks, pvs), layer=lay)
    np.testing.assert_allclose(np.asarray(a), np.asarray(xr),
                               rtol=2e-5, atol=2e-5)
