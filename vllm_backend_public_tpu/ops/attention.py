"""Pallas paged attention for TPU.

Decode path: one grid program per sequence. The sequence's KV pages stream
HBM->VMEM with manually double-buffered async DMA (one contiguous
[NKV, BS, D] page per copy), the page loop has a *dynamic* bound
(ceil(kv_len / BS)) so no bandwidth is spent on empty page slots, and all
kv heads are processed per page with loop-carried flash (online-softmax)
accumulators. This is the TPU-native equivalent of vLLM's CUDA
PagedAttention kernel (reference exposes it only as --block-size,
benchmark-vllm/vllm_templates.py:54); no [B, ctx, ...] gather is ever
materialized in HBM, unlike the XLA reference path in models/common.py.

Prefill (T>1) routes to the XLA write-then-gather path for now.

Layout contract (matches models/common.py):
  q:        [B, T, NH, D]
  k_pages:  [NB, NKV, BS, D]   (one page contiguous)
  block_tables: [B, MB] int32; kv_lens: [B] int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(bt_ref, kl_ref, q_ref, k_hbm, v_hbm, out_ref,
                   kb, vb, sems, *, bs: int, mb: int, scale: float):
    b = pl.program_id(0)
    kv_len = kl_ref[b]
    num_pages = pl.cdiv(kv_len, bs)

    q = q_ref[0].astype(jnp.float32)  # [NKV, G, D]
    nkv, g, d = q.shape

    def start_dma(i, slot):
        page = bt_ref[b * mb + i]
        k_dma = pltpu.make_async_copy(k_hbm.at[page], kb.at[slot],
                                      sems.at[slot, 0])
        v_dma = pltpu.make_async_copy(v_hbm.at[page], vb.at[slot],
                                      sems.at[slot, 1])
        k_dma.start()
        v_dma.start()

    @pl.when(num_pages > 0)
    def _():
        start_dma(0, 0)

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < num_pages)
        def _():
            start_dma(i + 1, jax.lax.rem(i + 1, 2))

        # wait for this page's K and V
        pltpu.make_async_copy(k_hbm.at[0], kb.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(v_hbm.at[0], vb.at[slot],
                              sems.at[slot, 1]).wait()

        k = kb[slot].astype(jnp.float32)  # [NKV, BS, D]
        v = vb[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [NKV, G, BS]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + i * bs
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=2, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [NKV, G, D]
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((nkv, g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((nkv, g, 1), jnp.float32)
    a0 = jnp.zeros((nkv, g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, a0))
    out = acc / jnp.where(l > 0, l, 1.0)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(q, k_pages, v_pages, block_tables, kv_lens,
                           scale: float, interpret: bool = False):
    """q: [B, NH, D] (one new token per sequence) -> [B, NH, D]."""
    b, nh, d = q.shape
    nb_pool, nkv, bs, _ = k_pages.shape
    mb = block_tables.shape[1]
    g = nh // nkv
    qg = q.reshape(b, nkv, g, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_tables (flat), kv_lens
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nkv, g, d), lambda bi, bt, kl: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # k_pages stay in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # v_pages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, nkv, g, d), lambda bi, bt, kl:
                               (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, nkv, bs, d), k_pages.dtype),  # K double buffer
            pltpu.VMEM((2, nkv, bs, d), v_pages.dtype),  # V double buffer
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_decode_kernel, bs=bs, mb=mb, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nkv, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(block_tables.reshape(-1), kv_lens, qg, k_pages, v_pages)
    return out.reshape(b, nh, d)


def paged_attention(q, k_pages, v_pages, block_tables, kv_lens, positions,
                    scale: float):
    """Dispatch: Pallas decode kernel for T==1, XLA path otherwise."""
    from ..models.common import paged_attention_xla

    b, t, nh, d = q.shape
    # Mosaic DMA slices need lane-aligned pages: head_dim % 128. Smaller
    # head dims (e.g. TinyLlama's 64) take the XLA path.
    if t == 1 and d % 128 == 0:
        interpret = jax.default_backend() != "tpu"
        out = paged_decode_attention(
            q[:, 0], k_pages, v_pages, block_tables, kv_lens, scale,
            interpret=interpret)
        return out[:, None]
    return paged_attention_xla(q, k_pages, v_pages, block_tables, kv_lens,
                               positions, scale)
