"""Llama-family decoder (Llama 1/2/3, TinyLlama, Mistral, Qwen2) in pure JAX.

One `lax.scan` over stacked layer parameters; paged KV cache throughout.
Covers the dense model families the reference system deploys via vLLM
(reference configs: Qwen2-1.5B at benchmark-vllm/configs/vllm_config.yaml,
TinyLlama in test scenarios) — built TPU-native, not ported.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..loader.hf import ModelConfig
from ..ops.linear import LayerView, matmul
from .common import (AttnInputs, KVCache, attention_block, rms_norm,
                     rope_cos_sin, write_kv_all_layers)


# big per-layer projection weights: kept stacked in HBM and indexed inside
# the Pallas kernels during decode (LayerView) — never sliced in the scan
# (wqkv/wgu are the engine's load-time-merged forms, single-device)
_BIG_WEIGHTS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd", "wqkv", "wgu")


def scan_layers(layers, cfg: ModelConfig, x: jax.Array, attn: AttnInputs,
                cache_arrays: tuple, cos, sin, attn_impl: str = "xla",
                defer: bool = True, kv_pending=None):
    """One `lax.scan` over the stacked decoder layers.

    x: [B, T, H]; cache_arrays: this scan's per-layer cache arrays, each
    stacked on a leading layer axis (the FULL depth normally; a
    pipeline-parallel stage passes its local [L/S, ...] shard —
    parallel/pipeline.py). Returns (x, ys): ys = (k_news, v_news) stacked
    over the scanned layers when `defer` (caller scatters once), else the
    updated cache arrays.

    Decode (T==1, deferred writes) scans over the LAYER INDEX only: the
    big projection weights and the KV page pools stay closure-captured
    stacked arrays that the Pallas kernels index via scalar prefetch.
    Slicing them as scan xs looks equivalent but costs a full per-layer
    HBM copy per step: XLA cannot fuse a dynamic-slice into an opaque
    kernel operand (measured ~12 ms/step on Llama-3-8B before this).
    """
    # every deferred-write path (decode AND chunked prefill) is zero-copy;
    # only the in-scan write-then-gather path (int8-KV prefill) still
    # carries sliced cache arrays through the scan
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
            if "wgu" in layer:
                # load-time-merged gate|up: one weight stream + one
                # activation quant for the pair (numerics identical)
                gu = matmul(h, layer["wgu"])
                gate = jax.nn.silu(gu[..., :cfg.intermediate_size])
                up = gu[..., cfg.intermediate_size:]
            else:
                gate = jax.nn.silu(matmul(h, layer["wg"]))
                up = matmul(h, layer["wu"])
            x = x + matmul(gate * up, layer["wd"])
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
        gate = jax.nn.silu(matmul(h, layer["wg"]))
        up = matmul(h, layer["wu"])
        x = x + matmul(gate * up, layer["wd"])
        return x, ((k_new, v_new) if defer else kv)

    return jax.lax.scan(body, x, (layers,) + cache_arrays)


def forward_hidden(params, cfg: ModelConfig, tokens: jax.Array,
                   attn: AttnInputs, cache: KVCache,
                   attn_impl: str = "xla", kv_pending=None,
                   defer_out: bool = False):
    """tokens: [B, T] -> hidden states [B, T, H], updated KVCache.

    Decode (T==1) defers all KV-cache writes to one post-scan scatter;
    prefill uses write-then-gather inside the scan (see
    common.attention_block for why).

    kv_pending: (k_buf [L, B, NKV, J, D], v_buf, count) — lookahead
    buffer of tokens from earlier steps of a fused multi-step decode
    call that are NOT yet in the cache; attention folds them in.
    defer_out=True returns (hidden, (k_news, v_news)) with NO cache
    write at all — the multi-step caller scatters once per K steps so
    the multi-GB cache never rides the step loop's carry (a carried
    cache costs a full device copy per iteration).
    """
    x = params["embed"][tokens]  # [B, T, H]
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
    """hidden [..., H] -> logits [..., V] in float32."""
    return matmul(hidden, params["lm_head"]).astype(jnp.float32)


def convert_hf_state_dict(tensors: dict, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Map HF llama/qwen2 safetensors names -> stacked JAX pytree.

    HF Linear stores weight as [out, in]; we store [in, out] so `x @ w`.
    """
    def get(name):
        t = tensors[name]
        return jnp.asarray(t, dtype=dtype)

    def lin(name):
        return get(name).T  # [in, out]

    prefix = "model."
    L = cfg.num_layers
    layer_keys = {
        "attn_norm": lambda i: get(f"{prefix}layers.{i}.input_layernorm.weight"),
        "wq": lambda i: lin(f"{prefix}layers.{i}.self_attn.q_proj.weight"),
        "wk": lambda i: lin(f"{prefix}layers.{i}.self_attn.k_proj.weight"),
        "wv": lambda i: lin(f"{prefix}layers.{i}.self_attn.v_proj.weight"),
        "wo": lambda i: lin(f"{prefix}layers.{i}.self_attn.o_proj.weight"),
        "mlp_norm": lambda i: get(f"{prefix}layers.{i}.post_attention_layernorm.weight"),
        "wg": lambda i: lin(f"{prefix}layers.{i}.mlp.gate_proj.weight"),
        "wu": lambda i: lin(f"{prefix}layers.{i}.mlp.up_proj.weight"),
        "wd": lambda i: lin(f"{prefix}layers.{i}.mlp.down_proj.weight"),
    }
    if cfg.qkv_bias:
        layer_keys.update({
            "bq": lambda i: get(f"{prefix}layers.{i}.self_attn.q_proj.bias"),
            "bk": lambda i: get(f"{prefix}layers.{i}.self_attn.k_proj.bias"),
            "bv": lambda i: get(f"{prefix}layers.{i}.self_attn.v_proj.bias"),
        })

    layers = {k: jnp.stack([fn(i) for i in range(L)]) for k, fn in layer_keys.items()}

    embed = get(f"{prefix}embed_tokens.weight")  # [V, H]
    if cfg.tie_word_embeddings or "lm_head.weight" not in tensors:
        lm_head = embed.T
    else:
        lm_head = lin("lm_head.weight")
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": get(f"{prefix}norm.weight"),
        "lm_head": lm_head,
    }


def init_random_params(cfg: ModelConfig, key, dtype=jnp.float32):
    """Random-weight init (testing / benchmarks without checkpoint files)."""
    ks = jax.random.split(key, 12)
    h, i_sz, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, nkv, d, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers

    def w(key, *shape, scale=None):
        scale = scale or (1.0 / jnp.sqrt(shape[-2] if len(shape) > 1 else shape[-1]))
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    layers = {
        "attn_norm": jnp.ones((L, h), dtype),
        "wq": w(ks[0], L, h, nh * d),
        "wk": w(ks[1], L, h, nkv * d),
        "wv": w(ks[2], L, h, nkv * d),
        "wo": w(ks[3], L, nh * d, h),
        "mlp_norm": jnp.ones((L, h), dtype),
        "wg": w(ks[4], L, h, i_sz),
        "wu": w(ks[5], L, h, i_sz),
        "wd": w(ks[6], L, i_sz, h),
    }
    if cfg.qkv_bias:
        layers.update({
            "bq": jnp.zeros((L, nh * d), dtype),
            "bk": jnp.zeros((L, nkv * d), dtype),
            "bv": jnp.zeros((L, nkv * d), dtype),
        })
    embed = w(ks[7], v, h, scale=0.02)
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "lm_head": embed.T if cfg.tie_word_embeddings else w(ks[8], h, v),
    }
