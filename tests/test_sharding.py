"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dryrun_multichip(eight_cpu_devices):
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_tp_matches_single_device(eight_cpu_devices):
    """TP-sharded forward == unsharded forward (same math, different layout)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fixtures import tiny_llama_jax
    from vllm_backend_public_tpu.models import llama as jl
    from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache
    from vllm_backend_public_tpu.parallel.mesh import make_mesh
    from vllm_backend_public_tpu.parallel.sharding import shard_params

    cfg, params, _ = tiny_llama_jax(num_kv_heads=4)
    T = 12
    tokens = jnp.arange(T, dtype=jnp.int32)[None, :] % cfg.vocab_size
    attn = AttnInputs(
        block_tables=jnp.array([[1, 2]], dtype=jnp.int32),
        kv_lens=jnp.array([T], dtype=jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32)[None, :],
        write_mask=jnp.ones((1, T), bool))

    def run(params, cache):
        h, _ = jl.forward_hidden(params, cfg, tokens, attn, cache)
        return jl.logits_from_hidden(params, h)

    cache0 = init_kv_cache(cfg, num_blocks=4, block_size=8, dtype=jnp.float32)
    ref = jax.jit(run)(params, cache0)

    mesh = make_mesh(tensor_parallel=4, data_parallel=2)
    sharded = shard_params(params, mesh, cfg)
    cache1 = init_kv_cache(cfg, num_blocks=4, block_size=8, dtype=jnp.float32)
    out = jax.jit(run)(sharded, cache1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_engine_tensor_parallel_matches_single(eight_cpu_devices):
    """Full engine with tensor_parallel_size=4 produces the same greedy
    outputs as the unsharded engine."""
    from fixtures import tiny_llama_jax
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams

    cfg, params, _ = tiny_llama_jax(num_kv_heads=4)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 256, size=n).tolist() for n in (5, 11)]
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    def run(**over):
        kw = dict(model="t", dtype="float32", block_size=8, max_num_seqs=2,
                  max_model_len=64, num_kv_blocks=32,
                  enable_prefix_caching=False)
        kw.update(over)
        eng = LLMEngine(EngineConfig(**kw), model_cfg=cfg, params=params)
        return [o.output_token_ids for o in eng.generate(prompts, sp)]

    ref = run()
    tp = run(tensor_parallel_size=4)
    assert tp == ref
    tp_dp = run(tensor_parallel_size=2, data_parallel_size=2)
    assert tp_dp == ref


@pytest.mark.slow
def test_engine_tp_kernel_path_matches_single(eight_cpu_devices):
    """TP engine on the PALLAS kernel path (interpret mode) == unsharded
    XLA engine. Pins the shard_map self-wrap of paged_prefix_attention:
    under a ('data','model') mesh each shard runs the kernel on its kv
    heads — round 1 silently reverted to XLA attention under any mesh."""
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams
    from vllm_backend_public_tpu.loader.hf import parse_hf_config
    from vllm_backend_public_tpu.models.llama import init_random_params
    from vllm_backend_public_tpu.ops import attention as attn_ops

    # head_dim 128 (the kernel's lane-width requirement)
    cfg = parse_hf_config({
        "architectures": ["LlamaForCausalLM"], "vocab_size": 512,
        "hidden_size": 256, "intermediate_size": 512,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "head_dim": 128,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-5})
    params = init_random_params(cfg, jax.random.PRNGKey(7),
                                dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 512, size=n).tolist() for n in (5, 9)]
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)

    def run(**over):
        kw = dict(model="t", dtype="float32", block_size=8, max_num_seqs=2,
                  max_model_len=64, num_kv_blocks=32,
                  enable_prefix_caching=False)
        kw.update(over)
        eng = LLMEngine(EngineConfig(**kw), model_cfg=cfg, params=params)
        return [o.output_token_ids for o in eng.generate(prompts, sp)]

    ref = run(attn_impl="xla")
    attn_ops.set_interpret(True)
    try:
        tp = run(attn_impl="pallas", tensor_parallel_size=2)
        # multi-step decode exercises the pending-lookahead merge too
        tp_ms = run(attn_impl="pallas", tensor_parallel_size=2,
                    decode_steps_per_call=2)
    finally:
        attn_ops.set_interpret(False)
    assert tp == ref
    assert tp_ms == ref


@pytest.mark.slow
def test_engine_pipeline_parallel_matches_single(eight_cpu_devices):
    """Full engine with pipeline_parallel_size=2 (x TP=2) produces the
    same greedy outputs as the unsharded engine — stages split the layer
    stack and the KV pool, microbatches flow via ppermute
    (parallel/pipeline.py)."""
    from fixtures import tiny_llama_jax
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams

    cfg, params, _ = tiny_llama_jax(num_kv_heads=4, num_layers=4)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 256, size=n).tolist() for n in (5, 11)]
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    def run(**over):
        kw = dict(model="t", dtype="float32", block_size=8, max_num_seqs=2,
                  max_model_len=64, num_kv_blocks=32,
                  enable_prefix_caching=False)
        kw.update(over)
        eng = LLMEngine(EngineConfig(**kw), model_cfg=cfg, params=params)
        return [o.output_token_ids for o in eng.generate(prompts, sp)]

    ref = run()
    pp = run(pipeline_parallel_size=2, tensor_parallel_size=2)
    assert pp == ref
    pp_mb = run(pipeline_parallel_size=2, pipeline_microbatches=2)
    assert pp_mb == ref
    # steady-state pipelined decode: K fused greedy steps keep the ring
    # full across steps (parallel/pipeline.py:pipelined_decode_greedy)
    pp_ss = run(pipeline_parallel_size=2, pipeline_microbatches=2,
                decode_steps_per_call=3)
    assert pp_ss == ref


@pytest.mark.slow
def test_engine_pp_kernel_path_matches_single(eight_cpu_devices):
    """Pipeline parallelism KEEPS the Pallas attention kernel (round-2
    gap: PP forced the XLA gather path): each stage runs the kernel on
    its layer-local pool slice, and the TP self-wrap nests inside the
    pipe-manual region (pp2 and pp2 x tp2, interpret mode)."""
    from fixtures import tiny_llama_jax
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams
    from vllm_backend_public_tpu.ops import attention as att

    cfg, params, _ = tiny_llama_jax(num_kv_heads=4, num_layers=4,
                                    hidden=512)  # head_dim 128 for kernel
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 256, size=n).tolist() for n in (5, 11)]
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    def run(**over):
        kw = dict(model="t", dtype="float32", block_size=8, max_num_seqs=2,
                  max_model_len=64, num_kv_blocks=32,
                  enable_prefix_caching=False)
        kw.update(over)
        eng = LLMEngine(EngineConfig(**kw), model_cfg=cfg, params=params)
        return [o.output_token_ids for o in eng.generate(prompts, sp)]

    ref = run()
    att.set_interpret(True)
    try:
        pp = run(pipeline_parallel_size=2, pipeline_microbatches=2,
                 attn_impl="pallas")
        assert pp == ref
        pptp = run(pipeline_parallel_size=2, tensor_parallel_size=2,
                   attn_impl="pallas")
        assert pptp == ref
    finally:
        att.set_interpret(False)


@pytest.mark.slow
def test_engine_pp_sampled_steady_state(eight_cpu_devices, monkeypatch):
    """Sampled (temperature>0, penalties) decode rides the SAME
    steady-state pipelined ring as greedy (round-2 gap: any sampled
    request dropped PP to per-step fill/drain), and matches the
    single-device engine's sampled tokens exactly (same seeds/steps)."""
    from fixtures import tiny_llama_jax
    from vllm_backend_public_tpu.engine.config import EngineConfig
    from vllm_backend_public_tpu.engine.engine import LLMEngine
    from vllm_backend_public_tpu.engine.request import SamplingParams
    from vllm_backend_public_tpu.parallel import pipeline as pl

    cfg, params, _ = tiny_llama_jax(num_kv_heads=4, num_layers=4)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 256, size=n).tolist() for n in (5, 11)]
    sp = SamplingParams(max_tokens=6, temperature=0.8, top_k=12, seed=7,
                        repetition_penalty=1.2, ignore_eos=True)

    def run(**over):
        kw = dict(model="t", dtype="float32", block_size=8, max_num_seqs=2,
                  max_model_len=64, num_kv_blocks=32,
                  enable_prefix_caching=False, decode_steps_per_call=3)
        kw.update(over)
        eng = LLMEngine(EngineConfig(**kw), model_cfg=cfg, params=params)
        return [o.output_token_ids for o in eng.generate(prompts, sp)]

    ref = run()

    calls = {"steady": 0}
    orig = pl.pipelined_decode

    def spy(*a, **kw):
        calls["steady"] += 1
        assert kw.get("samp") is not None, "sampled run must carry samp"
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pipelined_decode", spy)
    pp = run(pipeline_parallel_size=2, pipeline_microbatches=2)
    assert calls["steady"] > 0, "sampled decode did not use the ring"
    assert pp == ref
