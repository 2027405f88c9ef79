"""GPT-2 family decoder (covers DialoGPT, the reference's CPU test model —
reference: benchmark-vllm/configs/vllm_config_macos.yaml uses
microsoft/DialoGPT-small).

Learned position embeddings, pre-LN blocks with biases, gelu MLP, tied
lm_head. Same paged-KV attention core as the llama family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..loader.hf import ModelConfig
from ..ops.linear import LayerView, matmul
from .common import (AttnInputs, KVCache, attention_block, layer_norm,
                     write_kv_all_layers)

_BIG_WEIGHTS = ("wq", "wk", "wv", "wo", "w_fc", "w_proj", "wqkv")


def scan_layers(layers, cfg: ModelConfig, x: jax.Array, attn: AttnInputs,
                cache_arrays: tuple, cos, sin, attn_impl: str = "xla",
                defer: bool = True, kv_pending=None):
    """Layer scan over (a shard of) the stacked layers — see
    models/llama.py:scan_layers for the contract (incl. the zero-copy
    deferred path). cos/sin unused (GPT-2 has learned position
    embeddings, no RoPE)."""

    def block(x, layer, kv, li, pending=None):
        h = layer_norm(x, layer["ln1_w"], layer["ln1_b"], cfg.layer_norm_eps)
        a, kv, k_new, v_new = attention_block(
            h, layer, cfg, attn, kv, cos=None, sin=None,
            attn_impl=attn_impl, defer_write=defer, layer_idx=li,
            pending=pending)
        x = x + a
        h = layer_norm(x, layer["ln2_w"], layer["ln2_b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(matmul(h, layer["w_fc"]) + layer["b_fc"],
                        approximate=True)
        x = x + matmul(h, layer["w_proj"]) + layer["b_proj"]
        return x, kv, k_new, v_new

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
            x, _, k_new, v_new = block(x, layer, cache_arrays, li,
                                       pending=pending)
            return x, (k_new, v_new)

        return jax.lax.scan(body, x,
                            (small, jnp.arange(L, dtype=jnp.int32)))

    def body(x, per_layer):
        layer, kv = per_layer[0], per_layer[1:]
        x, kv, _, _ = block(x, layer, kv, None)
        return x, kv

    return jax.lax.scan(body, x, (layers,) + cache_arrays)


def forward_hidden(params, cfg: ModelConfig, tokens: jax.Array,
                   attn: AttnInputs, cache: KVCache,
                   attn_impl: str = "xla", kv_pending=None,
                   defer_out: bool = False):
    x = params["embed"][tokens] + params["pos_embed"][attn.positions]
    # all paths defer: one post-scan scatter (int8 KV quantizes at
    # the scatter; a scan-carried quantized pool would double-buffer
    # a pool-sized temp and pay per-layer copies)
    defer = True
    cache_arrays = tuple(a for a in cache if a is not None)

    x, ys = scan_layers(params["layers"], cfg, x, attn, cache_arrays,
                        None, None, attn_impl, defer, kv_pending=kv_pending)
    if defer_out:
        assert defer
        x = layer_norm(x, params["final_norm_w"], params["final_norm_b"],
                       cfg.layer_norm_eps)
        return x, ys
    if defer:
        cache = write_kv_all_layers(cache, ys[0], ys[1], attn)
    else:
        cache = KVCache(*ys)
    x = layer_norm(x, params["final_norm_w"], params["final_norm_b"],
                   cfg.layer_norm_eps)
    return x, cache


USES_ROPE = False


def embed_tokens(params, cfg: ModelConfig, tokens: jax.Array,
                 positions: jax.Array) -> jax.Array:
    return params["embed"][tokens] + params["pos_embed"][positions]


def finalize_hidden(params, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    return layer_norm(x, params["final_norm_w"], params["final_norm_b"],
                      cfg.layer_norm_eps)


def logits_from_hidden(params, hidden: jax.Array) -> jax.Array:
    return matmul(hidden, params["lm_head"]).astype(jnp.float32)


def convert_hf_state_dict(tensors: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """HF gpt2 names -> stacked pytree. NB: HF GPT-2 uses Conv1D, whose
    weight is already [in, out] — no transpose, unlike Linear."""
    def get(name):
        return jnp.asarray(tensors[name], dtype=dtype)

    L, h = cfg.num_layers, cfg.hidden_size

    def split_qkv(i):
        w = get(f"h.{i}.attn.c_attn.weight")  # [H, 3H] (Conv1D)
        b = get(f"h.{i}.attn.c_attn.bias")    # [3H]
        return (w[:, :h], w[:, h:2 * h], w[:, 2 * h:],
                b[:h], b[h:2 * h], b[2 * h:])

    per = [split_qkv(i) for i in range(L)]
    layers = {
        "ln1_w": jnp.stack([get(f"h.{i}.ln_1.weight") for i in range(L)]),
        "ln1_b": jnp.stack([get(f"h.{i}.ln_1.bias") for i in range(L)]),
        "ln2_w": jnp.stack([get(f"h.{i}.ln_2.weight") for i in range(L)]),
        "ln2_b": jnp.stack([get(f"h.{i}.ln_2.bias") for i in range(L)]),
        "wq": jnp.stack([p[0] for p in per]),
        "wk": jnp.stack([p[1] for p in per]),
        "wv": jnp.stack([p[2] for p in per]),
        "bq": jnp.stack([p[3] for p in per]),
        "bk": jnp.stack([p[4] for p in per]),
        "bv": jnp.stack([p[5] for p in per]),
        "wo": jnp.stack([get(f"h.{i}.attn.c_proj.weight") for i in range(L)]),
        "bo": jnp.stack([get(f"h.{i}.attn.c_proj.bias") for i in range(L)]),
        "w_fc": jnp.stack([get(f"h.{i}.mlp.c_fc.weight") for i in range(L)]),
        "b_fc": jnp.stack([get(f"h.{i}.mlp.c_fc.bias") for i in range(L)]),
        "w_proj": jnp.stack([get(f"h.{i}.mlp.c_proj.weight")
                             for i in range(L)]),
        "b_proj": jnp.stack([get(f"h.{i}.mlp.c_proj.bias")
                             for i in range(L)]),
    }
    embed = get("wte.weight")
    return {
        "embed": embed,
        "pos_embed": get("wpe.weight"),
        "layers": layers,
        "final_norm_w": get("ln_f.weight"),
        "final_norm_b": get("ln_f.bias"),
        "lm_head": embed.T,  # tied
    }


def init_random_params(cfg: ModelConfig, key, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    L, h, i_sz, v = (cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
                     cfg.vocab_size)

    def w(key, *shape):
        scale = 1.0 / jnp.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    layers = {
        "ln1_w": jnp.ones((L, h), dtype), "ln1_b": jnp.zeros((L, h), dtype),
        "ln2_w": jnp.ones((L, h), dtype), "ln2_b": jnp.zeros((L, h), dtype),
        "wq": w(ks[0], L, h, h), "bq": jnp.zeros((L, h), dtype),
        "wk": w(ks[1], L, h, h), "bk": jnp.zeros((L, h), dtype),
        "wv": w(ks[2], L, h, h), "bv": jnp.zeros((L, h), dtype),
        "wo": w(ks[3], L, h, h), "bo": jnp.zeros((L, h), dtype),
        "w_fc": w(ks[4], L, h, i_sz), "b_fc": jnp.zeros((L, i_sz), dtype),
        "w_proj": w(ks[5], L, i_sz, h), "b_proj": jnp.zeros((L, h), dtype),
    }
    embed = w(ks[6], v, h) * 0.3
    return {"embed": embed, "pos_embed": w(ks[7], cfg.max_position_embeddings,
                                           h) * 0.1,
            "layers": layers,
            "final_norm_w": jnp.ones((h,), dtype),
            "final_norm_b": jnp.zeros((h,), dtype),
            "lm_head": embed.T}
