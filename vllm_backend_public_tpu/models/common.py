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

    One page = [num_kv_heads, block_size, head_dim] is contiguous in HBM
    so the Pallas decode kernel fetches a sequence's page (all kv heads)
    in a single DMA; trailing dims (block_size, head_dim) satisfy TPU
    tiling, and Mosaic's batched dot wants the head (batch) axis leading.
    The deferred scatter must write per-(token, head, layer) POINTS with
    a [head_dim]-only update window (write_kv_all_layers) — slab-style
    scatters with strided windows make XLA's auto-layout relayout the
    ENTIRE pool around every scatter (a pool-sized temp: +3.2 GB and
    ~12 ms/step at an 8B auto-sized pool; the point form measures zero
    temp bytes).
    """

    k: jax.Array
    v: jax.Array
    # per-(block, head, token) dequant scales for int8 KV; None otherwise
    k_scale: Optional[jax.Array] = None  # [L, NB, NKV, BS] f32
    v_scale: Optional[jax.Array] = None

    @property
    def block_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_blocks(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_kv_cache(cfg: ModelConfig, num_blocks: int, block_size: int,
                  dtype=jnp.bfloat16) -> KVCache:
    """dtype int8 allocates a scaled (quantized) cache — the in-repo
    equivalent of vLLM's --kv-cache-dtype (BASELINE config #3)."""
    shape = (cfg.num_layers, num_blocks, cfg.num_kv_heads, block_size,
             cfg.head_dim)
    if dtype == jnp.int8:
        sshape = shape[:-1]
        return KVCache(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.float32),
                       v_scale=jnp.zeros(sshape, jnp.float32))
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def quantize_kv(x: jax.Array):
    """Per-(token, head) symmetric int8. x: [..., D] -> (q int8, s f32 [...])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


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


def write_kv_layer(kv: tuple, k_new: jax.Array, v_new: jax.Array,
                   slot_ids: jax.Array, write_mask: jax.Array) -> tuple:
    """Scatter new K/V into one layer's page pool.

    kv: (k_pages, v_pages) or (k_pages, v_pages, k_scale, v_scale) for an
    int8 cache; pages [NB, NKV, BS, D], scales [NB, NKV, BS].
    k_new/v_new: [B, T, NKV, D]; slot_ids: [B, T]; write_mask: [B, T]
    (padding-safe: masked writes get an out-of-range block and drop).
    """
    k_pages, v_pages = kv[0], kv[1]
    nb, nkv, bs, d = k_pages.shape
    slots = slot_ids.reshape(-1)
    blk = slots // bs
    off = slots % bs
    blk = jnp.where(write_mask.reshape(-1), blk, nb)  # oob -> dropped
    kn = k_new.reshape(-1, nkv, d)
    vn = v_new.reshape(-1, nkv, d)
    if len(kv) == 4:
        kq, ks = quantize_kv(kn)
        vq, vs = quantize_kv(vn)
        k_pages = k_pages.at[blk, :, off].set(kq, mode="drop")
        v_pages = v_pages.at[blk, :, off].set(vq, mode="drop")
        ks_pages = kv[2].at[blk, :, off].set(ks, mode="drop")
        vs_pages = kv[3].at[blk, :, off].set(vs, mode="drop")
        return (k_pages, v_pages, ks_pages, vs_pages)
    k_pages = k_pages.at[blk, :, off].set(kn.astype(k_pages.dtype),
                                          mode="drop")
    v_pages = v_pages.at[blk, :, off].set(vn.astype(v_pages.dtype),
                                          mode="drop")
    return (k_pages, v_pages)


def gather_pages(pages: jax.Array, block_tables: jax.Array,
                 scales: Optional[jax.Array] = None,
                 layer=None) -> jax.Array:
    """[NB, NKV, BS, D] pages -> dequantized [B, NKV, CTX, D].

    layer: traced scalar selecting a layer of STACKED [L, NB, ...] pages.
    The layer axis folds into the gather indices (layer * NB + block) —
    a `pages[layer]` dynamic-slice would materialize the whole layer's
    pool slice per scan step, which scales with POOL SIZE, not with the
    tokens actually read (measured ~29 ms/step of pure copies at a
    4096-block pool on the XLA decode path)."""
    b, mb = block_tables.shape
    if layer is not None:
        L, nb, nkv, bs, d = pages.shape
        bt = layer * nb + block_tables
        out = pages.reshape(L * nb, nkv, bs, d)[bt]    # [B, MB, NKV, BS, D]
        if scales is not None:
            scales = scales.reshape(L * nb, *scales.shape[2:])
            s = scales[bt]                             # [B, MB, NKV, BS]
    else:
        nb, nkv, bs, d = pages.shape
        out = pages[block_tables]
        if scales is not None:
            s = scales[block_tables]
    out = out.transpose(0, 2, 1, 3, 4).reshape(b, nkv, mb * bs, d)
    if scales is not None:
        s = s.transpose(0, 2, 1, 3).reshape(b, nkv, mb * bs)
        out = out.astype(jnp.float32) * s[..., None]
    return out


def paged_attention_xla(q: jax.Array, k_pages: jax.Array, v_pages: jax.Array,
                        block_tables: jax.Array, kv_lens: jax.Array,
                        q_positions: jax.Array, scale: float,
                        k_scale=None, v_scale=None,
                        window: Optional[int] = None) -> jax.Array:
    """Reference paged attention via gather (exact, XLA-only).

    q: [B, T, NH, D] (already includes RoPE); k_pages/v_pages: [NB, NKV, BS, D];
    block_tables: [B, MB]; kv_lens: [B] (valid cache length incl. new tokens);
    q_positions: [B, T] global positions of the query tokens.
    window: sliding-window size (keys at positions (p - window, p]); None
    = full attention. Returns [B, T, NH, D].
    """
    b, t, nh, d = q.shape
    nb, nkv, bs, _ = k_pages.shape
    mb = block_tables.shape[1]
    ctx = mb * bs
    g = nh // nkv

    k = gather_pages(k_pages, block_tables, k_scale)
    v = gather_pages(v_pages, block_tables, v_scale)

    qg = q.reshape(b, t, nkv, g, d)
    # scores: [B, NKV, G, T, CTX]
    scores = jnp.einsum("btkgd,bkcd->bkgtc", qg.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    kv_pos = jnp.arange(ctx, dtype=jnp.int32)[None, :]  # [1, CTX]
    valid = kv_pos < kv_lens[:, None]  # [B, CTX]
    causal = kv_pos[:, None, :] <= q_positions[:, :, None]  # [B, T, CTX]
    mask = valid[:, None, :] & causal  # broadcast -> [B, T, CTX]
    if window is not None:
        mask &= kv_pos[:, None, :] > q_positions[:, :, None] - window
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # guard fully-masked rows (padding queries): softmax(-inf row) -> nan
    probs = jnp.where(jnp.any(mask[:, None, None, :, :], axis=-1, keepdims=True),
                      probs, 0.0)
    out = jnp.einsum("bkgtc,bkcd->btkgd", probs, v.astype(jnp.float32))
    return out.reshape(b, t, nh, d).astype(q.dtype)


# KV deferred-scatter form: "slab" (fast; needs a pool-array-sized HBM
# temp) or "point" (strictly in place; ~1.6 ms/call slower at B=64 K=32).
# The engine picks per-config from its memory budget (write_kv_all_layers).
KV_WRITE_MODE = "slab"


def set_kv_write_mode(mode: str) -> None:
    global KV_WRITE_MODE
    if mode not in ("slab", "point"):
        raise ValueError(mode)
    KV_WRITE_MODE = mode


class AttnInputs(NamedTuple):
    """Static-shaped attention metadata for one forward call."""

    block_tables: jax.Array  # [B, MB] int32
    kv_lens: jax.Array       # [B] int32, valid length incl. new tokens
    positions: jax.Array     # [B, T] int32 global positions of new tokens
    write_mask: jax.Array    # [B, T] bool — which new tokens are real


def attention_block(x, layer, cfg: ModelConfig, attn: AttnInputs,
                    kv: tuple, cos, sin, attn_impl="xla",
                    defer_write=False, layer_idx=None, pending=None):
    """Full attention sub-block for one layer (proj -> rope -> attn -> proj).

    x: [B, T, H]; kv: this layer's cache arrays — (k, v) or
    (k, v, k_scale, v_scale) for an int8 cache. When `layer_idx` is given
    the kv arrays are the FULL stacked [L, ...] pools and the Pallas
    kernel indexes the layer itself (zero-copy; a sliced pool operand to
    an opaque kernel call forces XLA to materialize a per-layer copy).
    Returns (out [B, T, H], kv, k_new, v_new).

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

    if "wqkv" in layer:
        # load-time-merged projection (engine, single-device): ONE
        # weight stream + ONE dynamic activation quant instead of three
        # ops sharing the same input — numerics identical (w8a8's
        # per-row absmax of x is the same scale all three would use)
        qkv = matmul(x, layer["wqkv"])
        if "bqkv" in layer:
            qkv = qkv + layer["bqkv"]
        q = qkv[..., :nh * d]
        k = qkv[..., nh * d:(nh + nkv) * d]
        v = qkv[..., (nh + nkv) * d:]
    else:
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
    ks = kv[2] if len(kv) == 4 else None
    vs = kv[3] if len(kv) == 4 else None
    window = cfg.sliding_window

    from ..ops import attention as attn_ops

    interp = attn_ops.INTERPRET
    use_kernel = (attn_impl == "pallas" and d % 128 == 0
                  and (jax.default_backend() == "tpu" or interp))

    if defer_write and t == 1:
        from ..ops.attention import (decode_attention_deferred,
                                     decode_attention_deferred_xla)
        # pending tokens (multi-step lookahead buffer) are NOT in the
        # cache yet: the in-cache prefix ends `count` positions before
        # this token's position
        prefix_lens = attn.positions[:, 0]
        if pending is not None:
            prefix_lens = prefix_lens - pending[2]
        if (pending is not None and pending[0].ndim == 5
                and not use_kernel):
            # stacked K-major [L, K, B, NKV, D] buffer: the kernel
            # layer-indexes it via scalar prefetch (zero-copy); the XLA
            # fallback needs this layer's slice back in page shape
            assert layer_idx is not None
            sliced = (
                jax.lax.dynamic_index_in_dim(pending[0], layer_idx, 0,
                                             False).transpose(1, 2, 0, 3),
                jax.lax.dynamic_index_in_dim(pending[1], layer_idx, 0,
                                             False).transpose(1, 2, 0, 3),
                pending[2])
            if len(pending) == 5:
                # int8 buffer: slice the per-(step, seq, head) scales to
                # page shape [B, NKV, K] alongside
                sliced = sliced + (
                    jax.lax.dynamic_index_in_dim(
                        pending[3], layer_idx, 0, False).transpose(1, 2, 0),
                    jax.lax.dynamic_index_in_dim(
                        pending[4], layer_idx, 0, False).transpose(1, 2, 0))
            pending = sliced
        q1, k1, v1 = q[:, 0], k[:, 0], v[:, 0]
        if use_kernel:
            out = decode_attention_deferred(
                q1, k1, v1, kv[0], kv[1], attn.block_tables,
                prefix_lens, scale, interpret=interp, k_scale=ks,
                v_scale=vs, window=window, layer=layer_idx,
                pending=pending)
        elif layer_idx is not None:
            # stacked pools: the layer index folds into the page gather
            # (slicing the pool per layer would copy pool-sized data)
            out = decode_attention_deferred_xla(
                q1, k1, v1, kv[0], kv[1], attn.block_tables,
                prefix_lens, scale, k_scale=ks, v_scale=vs,
                window=window, pending=pending, layer=layer_idx)
        else:
            out = decode_attention_deferred_xla(
                q1, k1, v1, kv[0], kv[1], attn.block_tables,
                prefix_lens, scale, k_scale=ks, v_scale=vs, window=window,
                pending=pending)
        out = out[:, None]
        out = matmul(out.reshape(b, t, nh * d), layer["wo"])
        if "bo" in layer:
            out = out + layer["bo"]
        return out, kv, k1, v1

    if defer_write and t > 1:
        # chunked prefill: streamed prefix pages + in-chunk causal, cache
        # write deferred to one post-scan scatter (no page gather at all;
        # int8 KV pages dequantize in-kernel / in-gather)
        from ..ops.attention import chunk_prefill_attention_deferred

        prefix_lens = attn.positions[:, 0]  # chunk starts here
        out = chunk_prefill_attention_deferred(
            q, k, v, kv[0], kv[1], attn.block_tables, prefix_lens,
            attn.write_mask, scale, interpret=interp,
            use_kernel=use_kernel, window=window, layer=layer_idx,
            k_scale=ks, v_scale=vs)
        out = matmul(out.reshape(b, t, nh * d), layer["wo"])
        if "bo" in layer:
            out = out + layer["bo"]
        return out, kv, k, v

    # per-layer pages are [NB, NKV, BS, D]
    slot_ids = slot_ids_from_positions(attn.block_tables, attn.positions,
                                       kv[0].shape[2])
    kv = write_kv_layer(kv, k, v, slot_ids, attn.write_mask)
    ks = kv[2] if len(kv) == 4 else None
    vs = kv[3] if len(kv) == 4 else None

    out = paged_attention_xla(q, kv[0], kv[1], attn.block_tables,
                              attn.kv_lens, attn.positions, scale,
                              k_scale=ks, v_scale=vs, window=window)

    out = matmul(out.reshape(b, t, nh * d), layer["wo"])
    if "bo" in layer:
        out = out + layer["bo"]
    return out, kv, None, None


def write_kv_all_layers(cache: KVCache, k_news: jax.Array,
                        v_news: jax.Array, attn: AttnInputs,
                        kv_scales=None) -> KVCache:
    """One scatter for every layer's deferred K/V.

    k_news/v_news: [L, B, NKV, D] (decode) or [L, B, T, NKV, D] (chunked
    prefill); writes token positions attn.positions [B, T] through
    attn.block_tables into a (donated) cache in place.

    Two scatter forms, chosen by KV_WRITE_MODE (set by the engine from
    its memory budget):

    - "slab" (default, fastest): `.at[:, blk, :, off]` with (L, NKV, D)
      update windows. XLA's auto-layout relayouts the pool around this
      scatter, which costs a POOL-ARRAY-SIZED TEMP buffer — fine when
      HBM has that much headroom, fatal for an auto-sized pool next to
      8B params (the temp breaks donation and OOMs).
    - "point": every (token, layer, head) gets an explicit index with a
      [head_dim]-only window — zero temp bytes (the pool is updated
      strictly in place), measured ~1.6 ms/call slower at B=64 x K=32.

    kv_scales: (k_scales, v_scales) [L, B(, T), NKV] when k_news/v_news
    are ALREADY int8 (the quantized lookahead buffer) — the flush then
    copies values+scales instead of re-quantizing, bit-identical to
    quantizing here.
    """
    if k_news.ndim == 4:
        k_news = k_news[:, :, None]
        v_news = v_news[:, :, None]
        if kv_scales is not None:
            kv_scales = (kv_scales[0][:, :, None], kv_scales[1][:, :, None])
    L, b, t, nkv, d = k_news.shape
    nb = cache.num_blocks
    bs = cache.block_size
    r = b * t
    slots = slot_ids_from_positions(attn.block_tables, attn.positions, bs)
    blk = slots // bs
    off = slots % bs
    blk = jnp.where(attn.write_mask, blk, nb)  # oob -> dropped
    if KV_WRITE_MODE == "slab":
        blkf = blk.reshape(-1)
        offf = off.reshape(-1)
        kn_ = k_news.transpose(1, 2, 0, 3, 4).reshape(r, L, nkv, d)
        vn_ = v_news.transpose(1, 2, 0, 3, 4).reshape(r, L, nkv, d)
        if cache.quantized:
            if kv_scales is not None:
                kq, vq = kn_, vn_
                ksc = kv_scales[0].transpose(1, 2, 0, 3).reshape(r, L, nkv)
                vsc = kv_scales[1].transpose(1, 2, 0, 3).reshape(r, L, nkv)
            else:
                kq, ksc = quantize_kv(kn_)
                vq, vsc = quantize_kv(vn_)
            return KVCache(
                k=cache.k.at[:, blkf, :, offf].set(kq, mode="drop"),
                v=cache.v.at[:, blkf, :, offf].set(vq, mode="drop"),
                k_scale=cache.k_scale.at[:, blkf, :, offf].set(
                    ksc, mode="drop"),
                v_scale=cache.v_scale.at[:, blkf, :, offf].set(
                    vsc, mode="drop"))
        return KVCache(
            k=cache.k.at[:, blkf, :, offf].set(
                kn_.astype(cache.k.dtype), mode="drop"),
            v=cache.v.at[:, blkf, :, offf].set(
                vn_.astype(cache.v.dtype), mode="drop"))
    # point index arrays broadcasting to [R, L, NKV] — same update layout
    # as the (relayout-prone) slab form, so the lookahead-buffer transpose
    # stays a cheap leading-dim swap
    blk3 = blk.reshape(r, 1, 1)
    off3 = off.reshape(r, 1, 1)
    l3 = jnp.arange(L, dtype=jnp.int32).reshape(1, L, 1)
    h3 = jnp.arange(nkv, dtype=jnp.int32).reshape(1, 1, nkv)
    # updates [R, L, NKV, D]
    kn = k_news.reshape(L, r, nkv, d).transpose(1, 0, 2, 3)
    vn = v_news.reshape(L, r, nkv, d).transpose(1, 0, 2, 3)
    if cache.quantized:
        if kv_scales is not None:
            kq, vq = kn, vn
            ksc = kv_scales[0].reshape(L, r, nkv).transpose(1, 0, 2)
            vsc = kv_scales[1].reshape(L, r, nkv).transpose(1, 0, 2)
        else:
            kq, ksc = quantize_kv(kn)
            vq, vsc = quantize_kv(vn)
        return KVCache(
            k=cache.k.at[l3, blk3, h3, off3].set(kq, mode="drop"),
            v=cache.v.at[l3, blk3, h3, off3].set(vq, mode="drop"),
            k_scale=cache.k_scale.at[l3, blk3, h3, off3].set(
                ksc, mode="drop"),
            v_scale=cache.v_scale.at[l3, blk3, h3, off3].set(
                vsc, mode="drop"))
    new_k = cache.k.at[l3, blk3, h3, off3].set(kn.astype(cache.k.dtype),
                                               mode="drop")
    new_v = cache.v.at[l3, blk3, h3, off3].set(vn.astype(cache.v.dtype),
                                               mode="drop")
    return KVCache(k=new_k, v=new_v)
