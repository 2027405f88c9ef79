"""Shared transformer building blocks (pure-functional JAX).

Design notes (TPU-first):
- Layer parameters are STACKED on a leading [L, ...] axis and the decoder
  runs as a single `lax.scan` over layers: one trace/compile regardless of
  depth, and XLA pipelines the per-layer HBM weight streaming.
- The KV cache is paged from day one: `k_pages`/`v_pages` are
  [L, num_blocks, block_size, num_kv_heads, head_dim] arrays; sequences own
  blocks through a block table (reference capability: vLLM's PagedAttention
  behind `--block-size`, see reference benchmark-vllm/vllm_templates.py:54,
  models.py:10 — reimplemented here natively for TPU).
- Forward is "write-then-gather": new K/V are scattered into the page pool
  at slot ids computed from the block table, then attention gathers pages.
  This makes prefill and decode the same code path with static shapes.
  The XLA gather implementation below is the reference/correctness path;
  `ops/` provides Pallas kernels for the performance path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..loader.hf import ModelConfig
from ..ops.linear import matmul


class KVCache(NamedTuple):
    """Paged KV cache for all layers.

    k, v: [num_layers, num_blocks, num_kv_heads, block_size, head_dim]

    One page = [num_kv_heads, block_size, head_dim] is contiguous in HBM so
    the Pallas decode kernel fetches a sequence's page (all kv heads) in a
    single DMA; trailing dims (block_size, head_dim) satisfy TPU tiling.
    """

    k: jax.Array
    v: jax.Array

    @property
    def block_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_blocks(self) -> int:
        return self.k.shape[1]


def init_kv_cache(cfg: ModelConfig, num_blocks: int, block_size: int,
                  dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_layers, num_blocks, cfg.num_kv_heads, block_size,
             cfg.head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(dt) * w


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return ((x - mu) * jax.lax.rsqrt(var + eps)).astype(dt) * w + b


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """HF rotate-half RoPE tables. positions: [...]; returns cos/sin [..., head_dim]."""
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = positions.astype(jnp.float32)[..., None] * freqs  # [..., half]
    ang = jnp.concatenate([ang, ang], axis=-1)  # [..., head_dim]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, T, H, D]; cos/sin: [B, T, D] (HF rotate_half convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[..., None, :].astype(x.dtype)
    s = sin[..., None, :].astype(x.dtype)
    return x * c + rot * s


def slot_ids_from_positions(block_tables: jax.Array, positions: jax.Array,
                            block_size: int) -> jax.Array:
    """Global page-pool slot id for each (seq, position).

    block_tables: [B, MB] int32; positions: [B, T] int32 -> [B, T] int32.
    """
    blk = positions // block_size
    off = positions % block_size
    phys = jnp.take_along_axis(block_tables, blk, axis=1)  # [B, T]
    return phys * block_size + off


def write_kv_layer(k_pages: jax.Array, v_pages: jax.Array,
                   k_new: jax.Array, v_new: jax.Array,
                   slot_ids: jax.Array, write_mask: jax.Array):
    """Scatter new K/V into one layer's page pool.

    k_pages/v_pages: [NB, NKV, BS, D]; k_new/v_new: [B, T, NKV, D];
    slot_ids: [B, T] global slots; write_mask: [B, T] bool (padding-safe).
    Masked writes get an out-of-range block so the scatter drops them.
    """
    nb, nkv, bs, d = k_pages.shape
    slots = slot_ids.reshape(-1)
    blk = slots // bs
    off = slots % bs
    blk = jnp.where(write_mask.reshape(-1), blk, nb)  # oob -> dropped
    kn = k_new.reshape(-1, nkv, d).astype(k_pages.dtype)
    vn = v_new.reshape(-1, nkv, d).astype(v_pages.dtype)
    # advanced indices on dims 0 and 2 -> updates [N, NKV, D]
    k_pages = k_pages.at[blk, :, off].set(kn, mode="drop")
    v_pages = v_pages.at[blk, :, off].set(vn, mode="drop")
    return k_pages, v_pages


def paged_attention_xla(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
                        block_tables: jax.Array, kv_lens: jax.Array,
                        q_positions: jax.Array, scale: float) -> jax.Array:
    """Reference paged attention via gather (exact, XLA-only).

    q: [B, T, NH, D] (already includes RoPE); k_pages/v_pages: [NB, NKV, BS, D];
    block_tables: [B, MB]; kv_lens: [B] (valid cache length incl. new tokens);
    q_positions: [B, T] global positions of the query tokens.
    Returns [B, T, NH, D].
    """
    b, t, nh, d = q.shape
    nb, nkv, bs, _ = k_pages.shape
    mb = block_tables.shape[1]
    ctx = mb * bs
    g = nh // nkv

    # [B, MB, NKV, BS, D] -> [B, NKV, CTX, D]
    k = k_pages[block_tables].transpose(0, 2, 1, 3, 4).reshape(b, nkv, ctx, d)
    v = v_pages[block_tables].transpose(0, 2, 1, 3, 4).reshape(b, nkv, ctx, d)

    qg = q.reshape(b, t, nkv, g, d)
    # scores: [B, NKV, G, T, CTX]
    scores = jnp.einsum("btkgd,bkcd->bkgtc", qg.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    kv_pos = jnp.arange(ctx, dtype=jnp.int32)[None, :]  # [1, CTX]
    valid = kv_pos < kv_lens[:, None]  # [B, CTX]
    causal = kv_pos[:, None, :] <= q_positions[:, :, None]  # [B, T, CTX]
    mask = valid[:, None, :] & causal  # broadcast -> [B, T, CTX]
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # guard fully-masked rows (padding queries): softmax(-inf row) -> nan
    probs = jnp.where(jnp.any(mask[:, None, None, :, :], axis=-1, keepdims=True),
                      probs, 0.0)
    out = jnp.einsum("bkgtc,bkcd->btkgd", probs, v.astype(jnp.float32))
    return out.reshape(b, t, nh, d).astype(q.dtype)


class AttnInputs(NamedTuple):
    """Static-shaped attention metadata for one forward call."""

    block_tables: jax.Array  # [B, MB] int32
    kv_lens: jax.Array       # [B] int32, valid length incl. new tokens
    positions: jax.Array     # [B, T] int32 global positions of new tokens
    write_mask: jax.Array    # [B, T] bool — which new tokens are real


def attention_block(x, layer, cfg: ModelConfig, attn: AttnInputs,
                    k_pages, v_pages, cos, sin, attn_impl="xla",
                    defer_write=False):
    """Full attention sub-block for one layer (proj -> rope -> attn -> proj).

    x: [B, T, H]. Returns (out [B, T, H], k_pages, v_pages, k_new, v_new).

    Two cache disciplines:
    - write-then-gather (default): new K/V are scattered into this layer's
      pages before attention; k_new/v_new return as None.
    - deferred (decode, T==1): pages stay read-only — attention runs over
      the cached prefix plus the new token merged in-register, and the
      layer's k_new/v_new [B, NKV, D] are returned so the caller performs
      ONE scatter for all layers after the scan (a per-layer scatter
      inside lax.scan forces a full cache copy per step).
    """
    b, t, _ = x.shape
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q = matmul(x, layer["wq"])
    k = matmul(x, layer["wk"])
    v = matmul(x, layer["wv"])
    if "bq" in layer:
        q = q + layer["bq"]
        k = k + layer["bk"]
        v = v + layer["bv"]
    q = q.reshape(b, t, nh, d)
    k = k.reshape(b, t, nkv, d)
    v = v.reshape(b, t, nkv, d)

    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    scale = 1.0 / math.sqrt(d)

    if defer_write and t == 1:
        from ..ops.attention import (decode_attention_deferred,
                                     decode_attention_deferred_xla)
        prefix_lens = attn.positions[:, 0]
        q1, k1, v1 = q[:, 0], k[:, 0], v[:, 0]
        use_kernel = (attn_impl == "pallas" and d % 128 == 0
                      and jax.default_backend() == "tpu")
        if use_kernel:
            out = decode_attention_deferred(
                q1, k1, v1, k_pages, v_pages, attn.block_tables,
                prefix_lens, scale)
        else:
            out = decode_attention_deferred_xla(
                q1, k1, v1, k_pages, v_pages, attn.block_tables,
                prefix_lens, scale)
        out = out[:, None]
        out = matmul(out.reshape(b, t, nh * d), layer["wo"])
        if "bo" in layer:
            out = out + layer["bo"]
        return out, k_pages, v_pages, k1, v1

    # per-layer pages are [NB, NKV, BS, D]
    slot_ids = slot_ids_from_positions(attn.block_tables, attn.positions,
                                       k_pages.shape[2])
    k_pages, v_pages = write_kv_layer(k_pages, v_pages, k, v, slot_ids,
                                      attn.write_mask)

    out = paged_attention_xla(q, k_pages, v_pages, attn.block_tables,
                              attn.kv_lens, attn.positions, scale)

    out = matmul(out.reshape(b, t, nh * d), layer["wo"])
    if "bo" in layer:
        out = out + layer["bo"]
    return out, k_pages, v_pages, None, None


def write_kv_all_layers(cache: KVCache, k_news: jax.Array,
                        v_news: jax.Array, attn: AttnInputs) -> KVCache:
    """One scatter for every layer's deferred decode K/V.

    k_news/v_news: [L, B, NKV, D]; writes token positions attn.positions
    [B, 1] through attn.block_tables into a (donated) cache in place.
    """
    L, b, nkv, d = k_news.shape
    nb = cache.num_blocks
    bs = cache.block_size
    slots = slot_ids_from_positions(cache_bt := attn.block_tables,
                                    attn.positions, bs)[:, 0]  # [B]
    blk = slots // bs
    off = slots % bs
    blk = jnp.where(attn.write_mask[:, 0], blk, nb)  # oob -> dropped
    # updates for advanced dims (1: blk, 3: off) with slices (0: L, 2: NKV)
    # -> shape [B, L, NKV, D]
    kn = k_news.swapaxes(0, 1).astype(cache.k.dtype)
    vn = v_news.swapaxes(0, 1).astype(cache.v.dtype)
    new_k = cache.k.at[:, blk, :, off].set(kn, mode="drop")
    new_v = cache.v.at[:, blk, :, off].set(vn, mode="drop")
    return KVCache(k=new_k, v=new_v)
