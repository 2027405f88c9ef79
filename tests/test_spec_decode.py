"""Speculative decoding (engine/engine.py:_run_spec_decode).

Greedy spec decode must be BIT-IDENTICAL to non-speculative greedy
decode: verification argmaxes every position of the drafted chunk in one
forward, so the emitted prefix + bonus token is exactly the sequence
plain decode would produce, whatever the drafter proposes. The deployed
reference engine (vllm-openai v0.9.1) ships the same contract via
--num-speculative-tokens with the [ngram] speculator.
"""

import numpy as np
import pytest


def _tiny():
    import jax
    import jax.numpy as jnp
    from vllm_backend_public_tpu.loader.hf import parse_hf_config
    from vllm_backend_public_tpu.models.llama import init_random_params

    cfg = parse_hf_config({
        "architectures": ["LlamaForCausalLM"], "vocab_size": 256,
        "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "max_position_embeddings": 256,
        "rms_norm_eps": 1e-5})
    params = init_random_params(cfg, jax.random.PRNGKey(3),
                                dtype=jnp.float32)
    return cfg, params


def _build(num_spec, **kw):
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine

    cfg, params = _tiny()
    econ = EngineConfig(model="t", dtype="float32", block_size=8,
                        max_num_seqs=4, max_model_len=96,
                        max_num_batched_tokens=64, num_kv_blocks=60,
                        decode_steps_per_call=1,
                        num_speculative_tokens=num_spec,
                        enable_prefix_caching=False, **kw)
    return LLMEngine(econ, model_cfg=cfg, params=params)


def _gen(engine, prompts, max_tokens=24):
    from vllm_backend_public_tpu.engine.request import SamplingParams

    sp = SamplingParams(max_tokens=max_tokens, temperature=0.0,
                        ignore_eos=True)
    outs = engine.generate(prompts, sp)
    return [list(o.output_token_ids) for o in outs]


@pytest.mark.parametrize("num_spec", [1, 3])
def test_spec_greedy_matches_plain(num_spec):
    # repetitive prompts (bigram drafter accepts) AND a non-repetitive
    # one (acceptance ~0: the round degrades to plain 1-token decode)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6],
               [1, 2, 3, 4, 9, 11, 13, 17],
               [8, 8, 8, 8, 8, 8]]
    ref = _gen(_build(0), prompts)
    out = _gen(_build(num_spec), prompts)
    assert out == ref


def test_spec_emits_multiple_tokens_per_round():
    """With a looping continuation the n-gram drafter must get drafts
    accepted: rounds < generated tokens."""
    eng = _build(3)
    # greedy decode of this tiny random model settles into a constant
    # cycle (... 246 246 246 ...) after ~35 tokens; once it does, the
    # bigram matcher's continuation is exact and drafts are accepted
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]]
    toks = _gen(eng, prompts, max_tokens=48)[0]
    assert len(toks) == 48
    m = eng.metrics
    assert m["spec_rounds"] > 0
    assert m["spec_emitted"] > m["spec_rounds"], (
        m["spec_rounds"], m["spec_emitted"])


def test_spec_falls_back_for_sampling():
    """Non-greedy requests must take the normal decode path (and still
    produce the same tokens as a non-spec engine with the same seed)."""
    from vllm_backend_public_tpu.engine.request import SamplingParams

    sp = SamplingParams(max_tokens=12, temperature=0.8, top_k=40, seed=7,
                        ignore_eos=True)
    ref = _build(0).generate([[5, 6, 7, 5, 6]], sp)
    out = _build(3).generate([[5, 6, 7, 5, 6]], sp)
    assert list(out[0].output_token_ids) == list(ref[0].output_token_ids)
