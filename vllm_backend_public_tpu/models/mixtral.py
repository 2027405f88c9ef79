"""Mixtral-family sparse-MoE decoder.

Top-k routed experts (BASELINE.json config #5: Mixtral-8x7B FP8
expert-parallel). Two expert-compute paths (ops/moe.py):

- "grouped" (default, exact): top-k dispatch sorts (token, expert)
  assignments into tile-aligned groups and a grouped matmul computes only
  the routed experts — Pallas kernel with fused dequant on TPU,
  lax.ragged_dot elsewhere. Capacity-free, so bit-identical to dense.
- "dense": every expert computed, gated sum — the EP layout: with the
  expert axis sharded over the mesh's "expert" axis each device computes
  its local experts for all tokens and XLA inserts the psum from the
  sharding. The engine selects this under a mesh.

Both paths accept QuantizedWeight experts (int8 / fp8 / w8a8 / int4).
Attention is identical to llama (GQA + RoPE + paged KV).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..loader.hf import ModelConfig
from ..ops.linear import LayerView, matmul
from ..ops.moe import (moe_mlp_a2a_sharded, moe_mlp_dense, moe_mlp_grouped,
                       moe_mlp_grouped_sharded)
from .common import (AttnInputs, KVCache, attention_block, rms_norm,
                     rope_cos_sin, write_kv_all_layers)

# "grouped" computes only routed experts; "grouped_ep" is the mesh form
# (shard_map over ("expert", "model"): each shard computes only the
# assignments routed to its local experts — ops/moe.py
# moe_mlp_grouped_sharded); "dense" computes all experts; "auto" (the
# default) picks per call site: DECODE-sized token counts go dense —
# expert weights stream from HBM once either way, so the grouped path's
# dispatch machinery (sort, scatter/gather, per-tile kernel steps) is
# pure overhead when bandwidth-bound (measured on one v5e,
# mixtral-arch L8 E8 top2 B16: dense 6.85 ms/step vs grouped 46.6 fp8 /
# 8.1 int8) — while big prefill batches go grouped (compute-bound; the
# top-k/E FLOP saving is real there). The engine selects the impl (and
# mesh) when it builds one.
MOE_IMPL_DEFAULT = os.environ.get("VBPT_MOE_IMPL", "auto")
MOE_IMPL = MOE_IMPL_DEFAULT
MOE_MESH = None

# below this many tokens the expert pass is HBM-bound and dense wins
_AUTO_DENSE_MAX_TOKENS = 512


def set_moe_impl(impl: str, mesh=None) -> None:
    global MOE_IMPL, MOE_MESH
    if impl not in ("auto", "grouped", "grouped_ep", "grouped_ep_a2a",
                    "dense"):
        raise ValueError(impl)
    MOE_IMPL = impl
    MOE_MESH = mesh

# Attention projections go zero-copy (LayerView -> stacked Pallas kernels).
# The expert weights stay scan-sliced: their consumers are XLA einsums,
# which fuse the dynamic-slice (no materialized copy) — only opaque
# Pallas operands pay the copy tax (models/llama.py:scan_layers).
_BIG_WEIGHTS = ("wq", "wk", "wv", "wo", "wqkv")


def moe_mlp(x: jax.Array, layer, cfg: ModelConfig) -> jax.Array:
    """x: [B, T, H] -> [B, T, H] via top-k routed experts."""
    if MOE_IMPL == "grouped_ep":
        return moe_mlp_grouped_sharded(
            x, layer["router"], layer["we_gate"], layer["we_up"],
            layer["we_down"], cfg.experts_per_token, MOE_MESH)
    if MOE_IMPL == "grouped_ep_a2a":
        return moe_mlp_a2a_sharded(
            x, layer["router"], layer["we_gate"], layer["we_up"],
            layer["we_down"], cfg.experts_per_token, MOE_MESH)
    impl = MOE_IMPL
    if impl == "auto":
        from ..ops.linear import is_quantized
        n_tok = x.shape[0] * x.shape[1]
        gate = layer["we_gate"]
        fp8 = is_quantized(gate) and gate.kind == "fp8"
        # fp8 experts always go dense: the grouped path's fp8 handling
        # is broken on real v5e inside the full engine program
        # (runtime InvalidArgument; standalone + in-scan repros pass),
        # and XLA's dense fused-convert path measured fastest anyway
        impl = ("dense" if fp8 or n_tok <= _AUTO_DENSE_MAX_TOKENS
                else "grouped")
    fn = moe_mlp_grouped if impl == "grouped" else moe_mlp_dense
    return fn(x, layer["router"], layer["we_gate"], layer["we_up"],
              layer["we_down"], cfg.experts_per_token)


def scan_layers(layers, cfg: ModelConfig, x: jax.Array, attn: AttnInputs,
                cache_arrays: tuple, cos, sin, attn_impl: str = "xla",
                defer: bool = True, kv_pending=None):
    """Layer scan over (a shard of) the stacked layers — see
    models/llama.py:scan_layers for the contract."""

    if defer:
        small = {k: v for k, v in layers.items() if k not in _BIG_WEIGHTS}
        L = jax.tree.leaves(layers)[0].shape[0]

        def body(x, per_layer):
            small_l, li = per_layer
            layer = dict(small_l)
            for k in _BIG_WEIGHTS:
                if k in layers:
                    layer[k] = LayerView(layers[k], li)
            # the stacked [L, ...] lookahead buffer passes through whole;
            # attention layer-indexes it (kernel: scalar prefetch, XLA
            # fallback: slices) — a per-layer slice here materializes a
            # buffer-layer copy even on the kernel path
            pending = kv_pending
            h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
            a, _, k_new, v_new = attention_block(
                h, layer, cfg, attn, cache_arrays, cos, sin, attn_impl,
                defer_write=True, layer_idx=li, pending=pending)
            x = x + a
            h = rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps)
            x = x + moe_mlp(h, layer, cfg)
            return x, (k_new, v_new)

        return jax.lax.scan(body, x,
                            (small, jnp.arange(L, dtype=jnp.int32)))

    def body(x, per_layer):
        layer, kv = per_layer[0], per_layer[1:]
        h = rms_norm(x, layer["attn_norm"], cfg.rms_norm_eps)
        a, kv, k_new, v_new = attention_block(
            h, layer, cfg, attn, kv, cos, sin, attn_impl,
            defer_write=defer)
        x = x + a
        h = rms_norm(x, layer["mlp_norm"], cfg.rms_norm_eps)
        x = x + moe_mlp(h, layer, cfg)
        return x, ((k_new, v_new) if defer else kv)

    return jax.lax.scan(body, x, (layers,) + cache_arrays)


def forward_hidden(params, cfg: ModelConfig, tokens: jax.Array,
                   attn: AttnInputs, cache: KVCache,
                   attn_impl: str = "xla", kv_pending=None,
                   defer_out: bool = False):
    x = params["embed"][tokens]
    cos, sin = rope_cos_sin(attn.positions, cfg.head_dim, cfg.rope_theta)
    # all paths defer: one post-scan scatter (int8 KV quantizes at
    # the scatter; a scan-carried quantized pool would double-buffer
    # a pool-sized temp and pay per-layer copies)
    defer = True
    cache_arrays = tuple(a for a in cache if a is not None)

    x, ys = scan_layers(params["layers"], cfg, x, attn, cache_arrays,
                        cos, sin, attn_impl, defer, kv_pending=kv_pending)
    if defer_out:
        assert defer
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return x, ys
    if defer:
        cache = write_kv_all_layers(cache, ys[0], ys[1], attn)
    else:
        cache = KVCache(*ys)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, cache


USES_ROPE = True


def embed_tokens(params, cfg: ModelConfig, tokens: jax.Array,
                 positions: jax.Array) -> jax.Array:
    return params["embed"][tokens]


def finalize_hidden(params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def logits_from_hidden(params, hidden: jax.Array) -> jax.Array:
    return matmul(hidden, params["lm_head"]).astype(jnp.float32)


def convert_hf_state_dict(tensors: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    def get(name):
        return jnp.asarray(tensors[name], dtype=dtype)

    def lin(name):
        return get(name).T

    L, E = cfg.num_layers, cfg.num_experts
    p = "model."

    def experts(i, which):
        return jnp.stack([
            lin(f"{p}layers.{i}.block_sparse_moe.experts.{e}.{which}.weight")
            for e in range(E)])

    layers = {
        "attn_norm": jnp.stack([get(f"{p}layers.{i}.input_layernorm.weight")
                                for i in range(L)]),
        "wq": jnp.stack([lin(f"{p}layers.{i}.self_attn.q_proj.weight")
                         for i in range(L)]),
        "wk": jnp.stack([lin(f"{p}layers.{i}.self_attn.k_proj.weight")
                         for i in range(L)]),
        "wv": jnp.stack([lin(f"{p}layers.{i}.self_attn.v_proj.weight")
                         for i in range(L)]),
        "wo": jnp.stack([lin(f"{p}layers.{i}.self_attn.o_proj.weight")
                         for i in range(L)]),
        "mlp_norm": jnp.stack(
            [get(f"{p}layers.{i}.post_attention_layernorm.weight")
             for i in range(L)]),
        "router": jnp.stack(
            [lin(f"{p}layers.{i}.block_sparse_moe.gate.weight")
             for i in range(L)]),
        "we_gate": jnp.stack([experts(i, "w1") for i in range(L)]),
        "we_up": jnp.stack([experts(i, "w3") for i in range(L)]),
        "we_down": jnp.stack([experts(i, "w2") for i in range(L)]),
    }
    embed = get(f"{p}embed_tokens.weight")
    return {"embed": embed, "layers": layers,
            "final_norm": get(f"{p}norm.weight"),
            "lm_head": (embed.T if cfg.tie_word_embeddings
                        else lin("lm_head.weight"))}


def init_random_params(cfg: ModelConfig, key, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    h, i_sz, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, nkv, d, L, E = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                        cfg.num_layers, cfg.num_experts)

    def w(key, *shape):
        scale = 1.0 / jnp.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, h), dtype),
        "wq": w(ks[0], L, h, nh * d), "wk": w(ks[1], L, h, nkv * d),
        "wv": w(ks[2], L, h, nkv * d), "wo": w(ks[3], L, nh * d, h),
        "mlp_norm": jnp.ones((L, h), dtype),
        "router": w(ks[4], L, h, E),
        "we_gate": w(ks[5], L, E, h, i_sz),
        "we_up": w(ks[6], L, E, h, i_sz),
        "we_down": w(ks[7], L, E, i_sz, h),
    }
    embed = w(ks[8], v, h) * 0.3
    return {"embed": embed, "layers": layers,
            "final_norm": jnp.ones((h,), dtype),
            "lm_head": w(ks[9], h, v)}
