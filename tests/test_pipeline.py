"""Pipeline parallelism: pipelined forward == single-program forward.

Runs on the 8-virtual-CPU-device mesh (conftest) with a
(pipe=2, model=2) mesh — pipeline composed with TP — checking both
chunked prefill and decode, including the KV pages each stage writes for
its own layers. (PP+DP in one program trips an XLA partitioner
check-failure — see parallel/pipeline.py — so DP scale-out pairs with PP
at the process level, not in-program.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_backend_public_tpu.loader.hf import parse_hf_config
from vllm_backend_public_tpu.models import gpt2 as g2
from vllm_backend_public_tpu.models import llama as jl
from vllm_backend_public_tpu.models.common import AttnInputs, init_kv_cache
from vllm_backend_public_tpu.parallel.mesh import make_mesh
from vllm_backend_public_tpu.parallel.pipeline import pipelined_forward_hidden
from vllm_backend_public_tpu.parallel.sharding import (kv_cache_spec,
                                                       shard_params)

B, MB, BS, T = 4, 4, 8, 8


def _llama_cfg():
    return parse_hf_config({
        "architectures": ["LlamaForCausalLM"], "vocab_size": 256,
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 4,
        "num_attention_heads": 8, "num_key_value_heads": 4,
        "max_position_embeddings": 128, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0})


def _gpt2_cfg():
    return parse_hf_config({
        "architectures": ["GPT2LMHeadModel"], "vocab_size": 256,
        "n_embd": 64, "n_inner": 128, "n_layer": 4, "n_head": 8,
        "n_positions": 128, "layer_norm_epsilon": 1e-5})


def _mk_attn(prefill: bool, kv_len: int):
    bt = np.arange(1, B * MB + 1, dtype=np.int32).reshape(B, MB)
    if prefill:
        positions = np.tile(np.arange(T, dtype=np.int32), (B, 1))
        return AttnInputs(
            block_tables=jnp.asarray(bt),
            kv_lens=jnp.full((B,), T, jnp.int32),
            positions=jnp.asarray(positions),
            write_mask=jnp.ones((B, T), bool))
    return AttnInputs(
        block_tables=jnp.asarray(bt),
        kv_lens=jnp.full((B,), kv_len + 1, jnp.int32),
        positions=jnp.full((B, 1), kv_len, jnp.int32),
        write_mask=jnp.ones((B, 1), bool))


def _shard_inputs(mesh, attn, tokens):
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return (
        AttnInputs(block_tables=put(attn.block_tables, P("data", None)),
                   kv_lens=put(attn.kv_lens, P("data")),
                   positions=put(attn.positions, P("data", None)),
                   write_mask=put(attn.write_mask, P("data", None))),
        put(tokens, P("data", None) if tokens.ndim == 2 else P("data")))


def _shard_cache(mesh, cache):
    spec5 = kv_cache_spec(pipelined=True)
    sh = NamedSharding(mesh, spec5)
    return type(cache)(k=jax.device_put(cache.k, sh),
                       v=jax.device_put(cache.v, sh))


@pytest.mark.parametrize("family,mkcfg", [(jl, _llama_cfg), (g2, _gpt2_cfg)])
@pytest.mark.parametrize("microbatches", [2, 4])
def test_pipeline_matches_reference(eight_cpu_devices, family, mkcfg,
                                    microbatches):
    cfg = mkcfg()
    mesh = make_mesh(tensor_parallel=2, data_parallel=1, pipeline_parallel=2)
    params = family.init_random_params(cfg, jax.random.PRNGKey(0))

    # ----- reference: plain forward, single program -----------------------
    ref_cache = init_kv_cache(cfg, B * MB + 2, BS, dtype=jnp.float32)
    attn_p = _mk_attn(True, 0)
    tok_p = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0,
                               cfg.vocab_size)
    ref_h, ref_cache = family.forward_hidden(params, cfg, tok_p, attn_p,
                                             ref_cache)
    attn_d = _mk_attn(False, T)
    tok_d = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, cfg.vocab_size)
    ref_hd, ref_cache = family.forward_hidden(params, cfg, tok_d[:, None],
                                              attn_d, ref_cache)

    # ----- pipelined ------------------------------------------------------
    pp_params = shard_params(params, mesh, cfg, pipelined=True)
    pp_cache = _shard_cache(mesh, init_kv_cache(cfg, B * MB + 2, BS,
                                                dtype=jnp.float32))
    @jax.jit
    def pp_step(params, cache, tokens, attn):
        return pipelined_forward_hidden(
            params, cfg, tokens, attn, cache, mesh, family,
            num_microbatches=microbatches)

    attn_ps, tok_ps = _shard_inputs(mesh, attn_p, tok_p)
    pp_h, pp_cache = pp_step(pp_params, pp_cache, tok_ps, attn_ps)
    np.testing.assert_allclose(np.asarray(pp_h), np.asarray(ref_h),
                               atol=2e-4, rtol=2e-3)

    attn_ds, tok_ds = _shard_inputs(mesh, attn_d, tok_d)
    pp_hd, pp_cache = pp_step(pp_params, pp_cache, tok_ds[:, None], attn_ds)
    np.testing.assert_allclose(np.asarray(pp_hd), np.asarray(ref_hd),
                               atol=2e-4, rtol=2e-3)
    # every stage wrote its layers' pages identically to the reference
    np.testing.assert_allclose(np.asarray(pp_cache.k), np.asarray(ref_cache.k),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pp_cache.v), np.asarray(ref_cache.v),
                               atol=2e-4, rtol=2e-3)


def test_pipeline_under_jit(eight_cpu_devices):
    """The pipelined step compiles as one jitted program (engine path)."""
    cfg = _llama_cfg()
    mesh = make_mesh(tensor_parallel=2, data_parallel=1, pipeline_parallel=4)
    params = shard_params(jl.init_random_params(cfg, jax.random.PRNGKey(0)),
                          mesh, cfg, pipelined=True)
    cache = _shard_cache(mesh, init_kv_cache(cfg, B * MB + 2, BS,
                                             dtype=jnp.float32))
    attn, tokens = _shard_inputs(mesh, _mk_attn(False, T),
                                 jnp.zeros((B,), jnp.int32))

    @jax.jit
    def step(params, cache, tokens, attn):
        h, cache = pipelined_forward_hidden(params, cfg, tokens[:, None],
                                            attn, cache, mesh, jl,
                                            num_microbatches=2)
        return jl.logits_from_hidden(params, h[:, 0]), cache

    logits, cache = step(params, cache, tokens, attn)
    assert logits.shape == (B, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
