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
    kw.setdefault("spec_throughput_gate", False)
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
    accepted: rounds < generated tokens. (Adaptive gating off: the tiny
    model only settles into its loop after ~35 tokens, and this test is
    about verification mechanics, not the gating policy.)"""
    eng = _build(3, spec_min_accept=0.0)
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
    """A batch with NO spec-eligible rows (truncation filters) must take
    the normal decode path (and still produce the same tokens as a
    non-spec engine with the same seed)."""
    from vllm_backend_public_tpu.engine.request import SamplingParams

    sp = SamplingParams(max_tokens=12, temperature=0.8, top_k=40, seed=7,
                        ignore_eos=True)
    ref = _build(0).generate([[5, 6, 7, 5, 6]], sp)
    out = _build(3).generate([[5, 6, 7, 5, 6]], sp)
    assert list(out[0].output_token_ids) == list(ref[0].output_token_ids)


def test_spec_mixed_batch_per_request():
    """Round 5: per-request speculation. 2 greedy + 2 pure-temperature
    sampled requests share spec rounds; the greedy rows must stay
    BIT-IDENTICAL to plain greedy decode AND emit > 1 token/round on
    average (the round-4 batch-global gate would have disabled
    speculation for this whole batch)."""
    from vllm_backend_public_tpu.engine.request import SamplingParams

    N = 48
    greedy_prompts = [[5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6], [8, 8, 8, 8, 8]]
    sampled_prompts = [[1, 2, 3, 4], [9, 11, 13, 17]]
    g_sp = SamplingParams(max_tokens=N, temperature=0.0, ignore_eos=True)
    s_sp = SamplingParams(max_tokens=N, temperature=1.0, seed=11,
                          ignore_eos=True)

    ref_eng = _build(0, spec_min_accept=0.0)
    ids = [ref_eng.add_request(p, g_sp) for p in greedy_prompts]
    ref = {i: None for i in ids}
    while ref_eng.has_unfinished():
        for o in ref_eng.step():
            if o.finished:
                ref[o.request_id] = list(o.output_token_ids)

    eng = _build(3, spec_min_accept=0.0)
    gids = [eng.add_request(p, g_sp) for p in greedy_prompts]
    [eng.add_request(p, s_sp) for p in sampled_prompts]
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = list(o.output_token_ids)
    for rid, gid in zip(ids, gids):
        assert outs[gid] == ref[rid], (outs[gid], ref[rid])
    m = eng.metrics
    assert m["spec_rounds"] > 0
    # each round emits >= 1 token per active row; if the greedy rows only
    # ever got 1/round they would need >= N rounds to finish
    assert m["spec_rounds"] < N, m["spec_rounds"]


def test_spec_penalty_row_rides_along_bit_exact():
    """A repetition-penalty request is spec-INELIGIBLE but rides the spec
    round as a plain 1-token row: same penalty math, same (seed, step)
    sampler stream as plain decode => bit-identical output in f32, while
    the greedy neighbor still speculates."""
    from vllm_backend_public_tpu.engine.request import SamplingParams

    g_sp = SamplingParams(max_tokens=24, temperature=0.0, ignore_eos=True)
    p_sp = SamplingParams(max_tokens=24, temperature=0.9, seed=3,
                          repetition_penalty=1.3, ignore_eos=True)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 3, 4, 5]]

    def run(num_spec):
        eng = _build(num_spec)
        ids = [eng.add_request(prompts[0], g_sp),
               eng.add_request(prompts[1], p_sp)]
        outs = {}
        while eng.has_unfinished():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = list(o.output_token_ids)
        return [outs[i] for i in ids], eng.metrics

    ref, _ = run(0)
    out, m = run(3)
    assert out[0] == ref[0]            # greedy row: bit parity
    assert out[1] == ref[1]            # penalty row: same sampler stream
    assert m["spec_rounds"] > 0


def test_spec_adaptive_gating_disables_on_zero_acceptance():
    """A spec round costs a whole dispatch to emit acc+1 tokens; rows
    whose acceptance EMA collapses must stop drafting (cooldown) so the
    batch falls back to fused plain decode, re-probing only after
    spec_probe_tokens. Unstructured sampled text has ~zero bigram
    acceptance — without gating every round emits ~1 token/row."""
    from vllm_backend_public_tpu.engine.request import SamplingParams

    eng = _build(3, spec_min_accept=0.25, spec_probe_tokens=1000)
    sp = SamplingParams(max_tokens=40, temperature=1.0, seed=2,
                        ignore_eos=True)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 256, size=16).tolist() for _ in range(2)]
    outs = eng.generate(prompts, sp)
    assert all(len(o.output_token_ids) == 40 for o in outs)
    # EMA 1.0 halves per zero round: < 0.25 after 3 rounds; probe horizon
    # (1000) is beyond max_tokens, so no further rounds run
    assert 0 < eng.metrics["spec_rounds"] <= 4, eng.metrics["spec_rounds"]


def test_spec_rejection_sampling_distribution():
    """The emitted-token marginal of rejection-sampled verification must
    equal plain temperature sampling EXACTLY (speculative-sampling
    theorem for point-mass proposals). Empirical check on the factored
    primitive: ~4000 independent streams, fixed logits, K=2 drafts fixed
    on a high-probability token (so acceptance genuinely happens), first
    emitted token's frequency vs softmax within 5 sigma."""
    import jax
    import jax.numpy as jnp
    from vllm_backend_public_tpu.engine.sampling import (sample,
                                                         speculative_verify)

    W, K, V = 4000, 2, 8
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(1, K + 1, V)), jnp.float32)
    logits = jnp.broadcast_to(base, (W, K + 1, V))
    draft_tok = int(np.argmax(np.asarray(base[0, 0])))  # likely accepted
    drafts = jnp.full((W, K), draft_tok, jnp.int32)
    seeds = jnp.arange(W, dtype=jnp.int32)
    steps = jnp.zeros((W,), jnp.int32)
    ones = jnp.ones((W,), jnp.float32)
    acc, bonus_logits = speculative_verify(
        logits, drafts, seeds=seeds, steps=steps, temperature=ones,
        greedy_row=jnp.zeros((W,), bool), spec_ok=jnp.ones((W,), bool))
    bonus = sample(bonus_logits, seeds=seeds, steps=steps + acc,
                   temperature=ones, top_k=jnp.zeros((W,), jnp.int32),
                   top_p=ones, min_p=jnp.zeros((W,), jnp.float32))
    acc_h = np.asarray(acc)
    first = np.where(acc_h >= 1, draft_tok, np.asarray(bonus))
    assert (acc_h >= 1).mean() > 0.05, "acceptance never triggered"
    assert (acc_h == 0).sum() > 50, "rejection never triggered"
    p_ref = np.asarray(jax.nn.softmax(base[0, 0]))
    freq = np.bincount(first, minlength=V) / W
    sigma = np.sqrt(p_ref * (1 - p_ref) / W)
    assert np.all(np.abs(freq - p_ref) < 5 * sigma + 1e-3), (
        freq, p_ref, sigma)


def test_spec_throughput_gate_phases():
    """round 5: the engine-level wall-clock gate probes spec rounds, then
    fused plain calls, and holds the faster mode; a slow spec regime
    must land in phase 'plain' and re-probe after the hold."""
    eng = _build(3, spec_throughput_gate=True)
    g = eng._spec_clock
    # spec probe: 6 slow spec calls (1 tok per 10 ms)
    for _ in range(6):
        assert eng._spec_gate_allows()
        eng._spec_gate_record("spec", 0.010, 1)
    assert g["phase"] == "plain_probe"
    assert not eng._spec_gate_allows()
    # plain probe: 2 fast plain calls (32 toks per 10 ms)
    for _ in range(2):
        eng._spec_gate_record("plain", 0.010, 32)
    assert g["phase"] == "plain"
    assert not eng._spec_gate_allows()
    # hold expires -> re-probe
    for _ in range(g["hold"]):
        eng._spec_gate_record("plain", 0.010, 32)
    assert g["phase"] == "spec_probe"
    assert eng._spec_gate_allows()
    # this time spec is faster -> phase 'spec'
    for _ in range(6):
        eng._spec_gate_record("spec", 0.010, 64)
    for _ in range(2):
        eng._spec_gate_record("plain", 0.010, 32)
    assert g["phase"] == "spec"
    assert eng._spec_gate_allows()
