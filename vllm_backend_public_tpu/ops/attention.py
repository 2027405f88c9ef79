"""Pallas paged attention for TPU.

Decode path ("prefix attention"): one new token per sequence attends over
that sequence's *existing* KV pages (read-only). Grid (B, MB) rides
Mosaic's automatic double-buffered pipeline; the page index for each grid
step comes from a scalar-prefetched block table, and out-of-range steps
re-map to the previous page so the pipeline skips the duplicate fetch (no
HBM traffic for empty page slots). Online-softmax state lives in VMEM
scratch across the page axis; the kernel returns (out, m, l) so the
caller can merge the new token's own KV contribution in-register —
meaning the cache write can happen ONCE per step outside the layer scan
instead of 32 scatter-copies of the whole pool.

This is the TPU-native equivalent of vLLM's CUDA PagedAttention kernel
(reference exposes it only as --block-size,
benchmark-vllm/vllm_templates.py:54).

Layout contract (matches models/common.py):
  q:        [B, NH, D] (decode: the new token's queries)
  k_pages:  [NB, NKV, BS, D]   (one page contiguous)
  block_tables: [B, MB] int32; prefix_lens: [B] int32 (tokens already in
  the cache, NOT counting the new token).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Sequence-interleave width for the decode kernel, read ONCE at import
# (it is baked into the traced program, so changing it later has no
# effect; reading it here makes that explicit and validates the value).
# Unset: chosen per block size (see _paged_prefix_attention). Set: used
# as the exact width (subject to batch divisibility). Values above 8
# with bf16 KV at block_size 128 put the double-buffered K+V page
# blocks near the 16MB VMEM scoped limit — prefer int8 KV or block_size
# 64 before raising this.
import os as _os

try:
    _SEQ_INTERLEAVE = int(_os.environ["VBPT_ATTN_SEQ_INTERLEAVE"])
except (KeyError, ValueError):
    _SEQ_INTERLEAVE = None

# int8 KV pages: run the QK contraction as int8 x int8 on the MXU
# instead of converting the K page to bf16. The page convert is the
# kernel's single biggest non-DMA term (S*NKV*BS*D elements per grid
# step, ~2.1M for k alone at S=8 bs=256 — ~2 us of VPU time vs ~5 us of
# page DMA); quantizing q instead costs only S*NKV*G*D (~32k) elements
# per step. q is quantized per (seq, head, row) at 127 levels, adding
# <0.5% relative error to scores. MEASURED PERF-NEUTRAL on v5e (the
# kernel is bound by cold-page DMA at ~460 GB/s, not VPU converts), so
# it defaults OFF to keep the int8-KV path's scores bit-exact vs the
# XLA reference; "1" enables for experiments.
_QK_INT8 = _os.environ.get("VBPT_ATTN_QK_INT8", "0") == "1"

# Run the Pallas kernels in interpreter mode (pure-JAX emulation) so the
# kernel code paths — including the shard_map TP wrapping — are testable
# on the CPU mesh. Read at trace time via the module attribute.
INTERPRET = _os.environ.get("VBPT_ATTN_INTERPRET", "") == "1"


def set_interpret(flag: bool) -> None:
    global INTERPRET
    INTERPRET = bool(flag)


# Head-concat kernel: per grid step, concatenate the S sequences' page
# blocks along the TOKEN axis per kv head and run ONE batched dot over
# heads — 2*NKV MXU ops per grid step instead of 2*S*NKV. The decode
# kernel is MXU-ISSUE-bound, not FLOP- or DMA-bound: at B=64 S=8 the
# round-4 bisection measured ~60 us/layer of fixed overhead that tracks
# total MXU op count (~58 ns/op at 1024 ops/layer) and is independent
# of batch, S, and KV dtype. Cross-sequence score blocks are masked
# (block-diagonal keep), paying S x the FLOPs — irrelevant, since the
# MXU sits idle on issue latency either way.
_HEADCAT = _os.environ.get("VBPT_ATTN_HEADCAT", "1") != "0"

# Manual-DMA decode kernel (round 5): one grid step, kernel-managed page
# fetch queue (depth VBPT_ATTN_MANUAL_Q slots of S sequences' K+V pages)
# instead of Mosaic's per-grid-step double buffering. Round-5 probes
# (tools/dma_probe_deepq.py) showed cold 256KB page fetches sustain
# ~490 GB/s when enough distinct-page descriptors stay in flight, while
# the auto-pipelined kernel measured 377 GB/s effective with ~36
# us/layer of additionally non-overlapped compute (tools/attn_probe.py).
# The manual kernel overlaps compute of slot t with the DMAs of slots
# t+1..t+Q-1 under its own fori_loop. Decode-only (one query tile).
_MANUAL = _os.environ.get("VBPT_ATTN_MANUAL", "0") == "1"
try:
    _MANUAL_Q = max(2, int(_os.environ.get("VBPT_ATTN_MANUAL_Q", "3")))
except ValueError:
    _MANUAL_Q = 3


def _prefix_kernel_hc(*args, bs: int, scale: float,
                      window=None, quant: bool = False,
                      stacked: bool = False, S: int = 1,
                      pending: bool = False, newkv: bool = False,
                      finalize: bool = False, group: int = 0,
                      rowwise: bool = False, pend_k_major: bool = False,
                      pquant: bool = False):
    """Head-concat variant of _prefix_kernel (same operand contract).

    State lives head-major: scores [NKV, S*QT, S*BS], online-softmax
    state [NKV, S*QT, 1], accumulator [NKV, S*QT, D]. Row r belongs to
    sequence r // QT; column c to sequence c // BS; the keep mask is
    block-diagonal x per-sequence valid length (x window). See
    _prefix_kernel for the pending/newkv/finalize merge semantics —
    identical here, with the same concat layout.
    """
    off = 1 if stacked else 0
    pref = off + 2 + (1 if window is not None else 0) + (1 if pending else 0)
    bt_ref, kl_ref = args[off], args[off + 1]
    qp_ref = args[off + 2] if window is not None else kl_ref
    cnt_ref = args[pref - 1] if pending else None
    refs = list(args[pref:])
    q_ref = refs[0]
    k_refs = refs[1:1 + S]
    v_refs = refs[1 + S:1 + 2 * S]
    idx = 1 + 2 * S
    if quant:
        ks_refs = refs[idx:idx + S]
        vs_refs = refs[idx + S:idx + 2 * S]
        idx += 2 * S
    else:
        ks_refs = vs_refs = [None] * S
    if pending:
        pk_ref, pv_ref = refs[idx:idx + 2]
        idx += 2
        if pquant:
            psk_ref, psv_ref = refs[idx:idx + 2]
            idx += 2
    if newkv:
        kn_ref, vn_ref = refs[idx:idx + 2]
        idx += 2
    o_ref, m_ref, l_ref, acc_ref, m_s, l_s = refs[idx:]

    bi = pl.program_id(0)
    qi = pl.program_id(1)
    i = pl.program_id(2)
    mb = pl.num_programs(2)
    nkv, qt, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    R = S * qt

    @pl.when(i == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    process = None
    for j in range(S):
        ok_j = (kl_ref[bi * S + j] - i * bs) > 0
        if window is not None:
            ok_j &= (i * bs + bs - 1) > (qp_ref[bi * S + j] - window)
        process = ok_j if process is None else (process | ok_j)

    def cat_mask(C_blk, col_valid):
        """Block-diagonal keep over [R, S*C_blk]: row r (seq r // qt)
        may see column c only when c // C_blk == r // qt AND
        col_valid(j, c % C_blk, r % qt) holds for that sequence."""
        C = S * C_blk
        colc = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        rowr = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        cc = colc % C_blk
        keep = None
        for j in range(S):
            blk = ((colc // C_blk) == j) & ((rowr // qt) == j)
            mj = blk & col_valid(j, cc, rowr % qt)
            keep = mj if keep is None else (keep | mj)
        return keep

    if _os.environ.get("VBPT_ATTN_NOCOMPUTE", "") == "1":
        process = process & (i < 0)  # perf-bisect: DMA + harness only

    @pl.when(process)
    def _():
        qv = q_ref[...]                                # [S, NKV, QT, D]
        q_cat = qv.transpose(1, 0, 2, 3).reshape(nkv, R, d)
        k_cat = jnp.concatenate([k_refs[j][0] for j in range(S)],
                                axis=1)                # [NKV, S*BS, D]
        qk_i8 = quant and _QK_INT8 and k_cat.dtype == jnp.int8
        if qk_i8:
            qf = q_cat.astype(jnp.float32)
            aq = jnp.max(jnp.abs(qf), axis=2, keepdims=True)
            sq = jnp.maximum(aq / 127.0, 1e-8)         # [NKV, R, 1]
            lhs = jnp.clip(jnp.round(qf / sq), -127,
                           127).astype(jnp.int8)
        else:
            if k_cat.dtype == jnp.int8:
                k_cat = k_cat.astype(jnp.bfloat16)
            lhs = q_cat.astype(k_cat.dtype)
        s = jax.lax.dot_general(
            lhs, k_cat, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=(jnp.int32 if qk_i8
                                    else jnp.float32))
        s = s.astype(jnp.float32) * scale              # [NKV, R, S*BS]
        if qk_i8:
            s = s * sq
        if quant:
            ks_cat = jnp.concatenate([ks_refs[j][0] for j in range(S)],
                                     axis=1)           # [NKV, S*BS]
            s = s * ks_cat[:, None, :]

        def page_valid(j, cc, rt):
            mj = cc < (kl_ref[bi * S + j] - i * bs)
            if window is not None:
                qpos_j = qp_ref[bi * S + j]
                if rowwise:
                    qrow = qpos_j + (qi * qt + rt) // group
                    mj &= (cc + i * bs) > (qrow - window)
                else:
                    mj &= (cc + i * bs) > (qpos_j - window)
            return mj

        keep = cat_mask(bs, page_valid)                # [R, S*BS]
        s = jnp.where(keep[None], s, NEG_INF)
        m_prev = m_s[...]                              # [NKV, R, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        # universal remask — see _prefix_kernel (also zeroes the
        # cross-sequence blocks exactly)
        p = jnp.where(keep[None], p, 0.0)
        l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=2, keepdims=True)
        if quant:
            vs_cat = jnp.concatenate([vs_refs[j][0] for j in range(S)],
                                     axis=1)
            p = p * vs_cat[:, None, :]
        v_cat = jnp.concatenate([v_refs[j][0] for j in range(S)], axis=1)
        if v_cat.dtype == jnp.int8:
            v_cat = v_cat.astype(jnp.bfloat16)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v_cat.dtype), v_cat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m_s[...] = m_new

    @pl.when(i == mb - 1)
    def _():
        if pending:
            @pl.when(cnt_ref[0] > 0)
            def _():
                cnt = cnt_ref[0]
                qv = q_ref[...].astype(jnp.float32)
                q_cat = qv.transpose(1, 0, 2, 3).reshape(nkv, R, d)
                kp = pk_ref[...]
                vp = pv_ref[...]
                if pquant:
                    # int8 lookahead buffer: dequantize AT WIDTH before
                    # the transpose — unlike the page pool (where the
                    # [*, D]-sized multiply is the kernel's biggest VPU
                    # term), the pending block is tiny, and folding the
                    # scales into sp/p needs an [NKV, S, K]->[NKV, S*K]
                    # reshape Mosaic rejects ("unsupported shape cast").
                    # Scale blocks cover ALL B sequences (fetched once
                    # per layer); slice this group's S here in VMEM.
                    if pend_k_major:                   # [K, B, NKV]
                        ksc = psk_ref[:, pl.ds(bi * S, S)]
                        vsc = psv_ref[:, pl.ds(bi * S, S)]
                    else:                              # [B, NKV, K]
                        ksc = psk_ref[pl.ds(bi * S, S)]
                        vsc = psv_ref[pl.ds(bi * S, S)]
                    kp = kp.astype(jnp.float32) * ksc[..., None]
                    vp = vp.astype(jnp.float32) * vsc[..., None]
                if pend_k_major:                       # [K, S, NKV, D]
                    kp_cat = kp.transpose(2, 1, 0, 3)  # [NKV, S, K, D]
                    vp_cat = vp.transpose(2, 1, 0, 3)
                else:                                  # [S, NKV, K, D]
                    kp_cat = kp.transpose(1, 0, 2, 3)
                    vp_cat = vp.transpose(1, 0, 2, 3)
                kk = kp_cat.shape[2]
                kp_cat = kp_cat.reshape(nkv, S * kk, d).astype(jnp.float32)
                vp_cat = vp_cat.reshape(nkv, S * kk, d).astype(jnp.float32)
                sp = jax.lax.dot_general(
                    q_cat, kp_cat, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale

                def pend_valid(j, cc, rt):
                    mj = cc < cnt
                    if window is not None:
                        mj &= ((cc + kl_ref[bi * S + j])
                               > (qp_ref[bi * S + j] - window))
                    return mj

                keep = cat_mask(kk, pend_valid)        # [R, S*K]
                sp = jnp.where(keep[None], sp, NEG_INF)
                m_prev = m_s[...]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sp, axis=2, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(sp - m_new)
                p = jnp.where(keep[None], p, 0.0)
                l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=2,
                                                      keepdims=True)
                acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
                    p, vp_cat, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m_s[...] = m_new
        if newkv:
            qv = q_ref[...].astype(jnp.float32)        # [S, NKV, QT, D]
            q4 = qv.transpose(1, 0, 2, 3)              # [NKV, S, QT, D]
            kn = kn_ref[...].astype(jnp.float32)       # [S, NKV, D]
            vn = vn_ref[...].astype(jnp.float32)
            kn_t = kn.transpose(1, 0, 2)               # [NKV, S, D]
            vn_t = vn.transpose(1, 0, 2)
            s1 = jnp.sum(q4 * kn_t[:, :, None, :], axis=3,
                         keepdims=True) * scale        # [NKV, S, QT, 1]
            s1 = s1.reshape(nkv, R, 1)
            m_prev = m_s[...]
            m_new = jnp.maximum(m_prev, s1)
            alpha = jnp.exp(m_prev - m_new)
            p1 = jnp.exp(s1 - m_new)
            l_s[...] = l_s[...] * alpha + p1
            upd = (p1.reshape(nkv, S, qt, 1)
                   * vn_t[:, :, None, :]).reshape(nkv, R, d)
            acc_ref[...] = acc_ref[...] * alpha + upd
            m_s[...] = m_new

        def to_out(x):
            # [NKV, S*QT, *] -> [S, NKV, QT, *]
            last = x.shape[-1]
            return x.reshape(nkv, S, qt, last).transpose(1, 0, 2, 3)

        if finalize:
            o_ref[...] = to_out(
                acc_ref[...] / jnp.maximum(l_s[...], 1e-30)
            ).astype(o_ref.dtype)
        else:
            o_ref[...] = to_out(acc_ref[...]).astype(o_ref.dtype)
        m_ref[...] = to_out(m_s[...])
        l_ref[...] = to_out(l_s[...])


def _prefix_kernel(*args, bs: int, scale: float,
                   window=None, quant: bool = False, stacked: bool = False,
                   S: int = 1, pending: bool = False, newkv: bool = False,
                   finalize: bool = False, group: int = 0,
                   rowwise: bool = False, pend_k_major: bool = False,
                   pquant: bool = False):
    """Online-softmax over one page per grid step for S sequences at once.

    S > 1 exists to beat LATENCY, not throughput: one sequence's
    online-softmax update is a ~15-op serial dependency chain on skinny
    [NKV, G, *] vectors, so a single chain leaves the VPU mostly idle
    (measured: full kernel 257us/layer vs 80us DMA floor at S=1,
    batch 64 x 3 pages). Round 3 relied on the compiler interleaving S
    independent per-sequence chains; round 4 VECTORIZES them — the S
    sequences' scores stack into one [S, NKV, QT, BS] tensor and every
    mask / max / exp / accumulate runs ONCE on the stacked tensor, so
    the serial chain length per grid step is that of a single sequence
    regardless of S (only the MXU dots stay per-sequence: each sequence
    reads a different page block). A sequence whose pages are exhausted
    (or fully window-masked) contributes an exact no-op: its scores mask
    to NEG_INF, the running max is unchanged, and the universal
    `p = where(keep, p, 0)` remask kills the exp(0)=1 hazard when the
    running max itself is still NEG_INF.

    pending/newkv/finalize (decode only): the multi-step lookahead
    buffer ([NKV, K, D] per sequence — page-shaped, so the same
    contractions apply), the current token's own K/V, and the final
    softmax normalization all fold into the LAST grid step. Round 2 did
    this merge in XLA after the kernel: ~56 us/layer of skinny
    [B, NKV, G, *] fusions plus seven layout copies that XLA pins around
    the batched einsums (step_bisect.py round 3) — in-kernel the merge
    reuses the page path's dot shapes and the epilogue disappears.
    pend_k_major: the stacked pending buffer is [L, K, B, NKV, D]
    (step-major, so the engine's per-step write is a contiguous
    [B, NKV, D] slab per layer instead of a 256B-strided scatter —
    ~0.45 ms/step at llama8b b64 K32); the kernel transposes its
    [K, S, NKV, D] block to page shape in VMEM (cheap: the block is
    ~0.5 MB and the transpose runs once per kernel call).
    """
    # operands: [li_ref if stacked], bt_ref, kl_ref, [qp_ref if window],
    # [cnt_ref if pending], then tensor refs. qp_ref carries the TRUE
    # query positions: with the multi-step lookahead buffer the query
    # sits `count` tokens past the in-cache prefix, so the window bound
    # can't derive from kv_len.
    off = 1 if stacked else 0
    pref = off + 2 + (1 if window is not None else 0) + (1 if pending else 0)
    bt_ref, kl_ref = args[off], args[off + 1]
    qp_ref = args[off + 2] if window is not None else kl_ref
    cnt_ref = args[pref - 1] if pending else None
    refs = list(args[pref:])
    q_ref = refs[0]
    k_refs = refs[1:1 + S]
    v_refs = refs[1 + S:1 + 2 * S]
    idx = 1 + 2 * S
    if quant:
        ks_refs = refs[idx:idx + S]
        vs_refs = refs[idx + S:idx + 2 * S]
        idx += 2 * S
    else:
        ks_refs = vs_refs = [None] * S
    if pending:
        pk_ref, pv_ref = refs[idx:idx + 2]
        idx += 2
        if pquant:
            psk_ref, psv_ref = refs[idx:idx + 2]
            idx += 2
    if newkv:
        kn_ref, vn_ref = refs[idx:idx + 2]
        idx += 2
    o_ref, m_ref, l_ref, acc_ref, m_s, l_s = refs[idx:]

    bi = pl.program_id(0)
    qi = pl.program_id(1)
    i = pl.program_id(2)
    mb = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # group-level `process` predicate in pure scalar ops (per-sequence
    # bounds stay scalars — Mosaic can't reshape an [S] vector to
    # [S,1,1,1], so the masks below broadcast scalars against 3-D iotas
    # per sequence and stack)
    process = None
    for j in range(S):
        ok_j = (kl_ref[bi * S + j] - i * bs) > 0
        if window is not None:
            # sliding window: cache keys valid iff pos > qpos - window
            # (qpos = the query's true position); skip pages entirely
            # below the window
            ok_j &= (i * bs + bs - 1) > (qp_ref[bi * S + j] - window)
        process = ok_j if process is None else (process | ok_j)

    @pl.when(process)
    def _():
        # stacked pools use a dropped (None) layer dim in the
        # BlockSpec, so page blocks arrive as [1, NKV, BS, D] in both
        # modes — in-kernel rank fix-ups would need memref slices
        # that Mosaic rejects at block_size < 128 lanes
        qv = q_ref[...]                                # [S, NKV, QT, D]
        qk_i8 = quant and _QK_INT8 and k_refs[0].dtype == jnp.int8
        sq = None
        if qk_i8:
            # quantize q (tiny: S*NKV*QT*D elems) so the K page feeds
            # the MXU as stored int8 — skipping the k page's
            # int8->bf16 convert, the kernel's biggest non-DMA term
            # (~half the S*NKV*BS*D*2 converted elements per grid step)
            qf = qv.astype(jnp.float32)
            aq = jnp.max(jnp.abs(qf), axis=3, keepdims=True)
            sq = jnp.maximum(aq / 127.0, 1e-8)         # [S, NKV, QT, 1]
            q8 = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
        s_parts = []
        for j in range(S):
            k = k_refs[j][0]                           # [NKV, BS, D]
            if qk_i8:
                s_parts.append(jax.lax.dot_general(
                    q8[j], k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32))
                continue
            if k.dtype == jnp.int8:
                # bf16 feeds the MXU natively; the [NKV, BS, D]-sized
                # dequant multiplies are NOT done here — the per-(head,
                # token) scales factor out of both contractions and fold
                # into s and p instead ([NKV, G, BS]-sized, a D/G x
                # smaller VPU job; measured ~110 us/layer saved).
                k = k.astype(jnp.bfloat16)
            s_parts.append(jax.lax.dot_general(
                qv[j].astype(k.dtype), k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        if qk_i8:
            s = jnp.stack(s_parts).astype(jnp.float32) * (sq * scale)
        else:
            s = jnp.stack(s_parts) * scale             # [S, NKV, QT, BS]
        if quant:
            ksv = jnp.stack([ks_refs[j][0] for j in range(S)])
            s = s * ksv[:, :, None, :]
        # per-sequence masks: scalar bounds broadcast against 3-D iotas
        # (a 4-D compare against an [S]-vector bound would need a vector
        # reshape Mosaic rejects), stacked to match s
        sh3 = s.shape[1:]
        col3 = jax.lax.broadcasted_iota(jnp.int32, sh3, 2)
        keeps = []
        for j in range(S):
            kj = col3 < (kl_ref[bi * S + j] - i * bs)
            if window is not None:
                qpos_j = qp_ref[bi * S + j]
                if rowwise:
                    # chunked prefill: q row r (within its kv head) sits
                    # at position qpos + r // group, so the window bound
                    # moves per row
                    row = jax.lax.broadcasted_iota(jnp.int32, sh3, 1)
                    qrow = qpos_j + (qi * sh3[1] + row) // group
                    kj &= (col3 + i * bs) > (qrow - window)
                else:
                    kj &= (col3 + i * bs) > (qpos_j - window)
            keeps.append(kj)
        keep = jnp.stack(keeps)                        # [S, NKV, QT, BS]
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_s[...]                              # [S, NKV, QT, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=3, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        # universal remask: a sequence already past its last page (or a
        # page fully masked by the window) has every slot at the finite
        # NEG_INF; if its running max is still NEG_INF, exp(s - m) = 1
        # would inflate l/acc by a whole page. With the remask its
        # update is an exact no-op (alpha = 1, p = 0) — this is what
        # lets ALL S sequences share one vectorized softmax update with
        # no per-sequence guard.
        p = jnp.where(keep, p, 0.0)
        l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=3, keepdims=True)
        if quant:
            vsv = jnp.stack([vs_refs[j][0] for j in range(S)])
            p = p * vsv[:, :, None, :]
        o_parts = []
        for j in range(S):
            v = v_refs[j][0]
            if v.dtype == jnp.int8:
                v = v.astype(jnp.bfloat16)
            o_parts.append(jax.lax.dot_general(
                p[j].astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
        acc_ref[...] = acc_ref[...] * alpha + jnp.stack(o_parts)
        m_s[...] = m_new

    @pl.when(i == mb - 1)
    def _():
        if pending:
            # guarded like the page path's `process`: with cnt == 0
            # every score masks to the FINITE NEG_INF, m would land
            # exactly there and exp(s - m) = 1 for every masked slot
            @pl.when(cnt_ref[0] > 0)
            def _():
                cnt = cnt_ref[0]
                qv = q_ref[...].astype(jnp.float32)    # [S, NKV, G, D]
                kp = pk_ref[...]
                vp = pv_ref[...]
                if pend_k_major:
                    # stacked K-major block [K, S, NKV, D] -> page shape
                    kp = jnp.transpose(kp, (1, 2, 0, 3))
                    vp = jnp.transpose(vp, (1, 2, 0, 3))
                kp = kp.astype(jnp.float32)            # [S, NKV, K, D]
                vp = vp.astype(jnp.float32)
                if pquant:
                    # dequant at width (see _prefix_kernel_hc: the
                    # scale-fold form needs a reshape Mosaic rejects);
                    # scale blocks cover ALL B — slice this group
                    if pend_k_major:                   # [K, B, NKV]
                        ksv = (psk_ref[:, pl.ds(bi * S, S)]
                               .transpose(1, 2, 0))    # [S, NKV, K]
                        vsv = (psv_ref[:, pl.ds(bi * S, S)]
                               .transpose(1, 2, 0))
                    else:                              # [B, NKV, K]
                        ksv = psk_ref[pl.ds(bi * S, S)]
                        vsv = psv_ref[pl.ds(bi * S, S)]
                    kp = kp * ksv[..., None]
                    vp = vp * vsv[..., None]
                sp_parts = [jax.lax.dot_general(
                    qv[j], kp[j], (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                    for j in range(S)]
                sp = jnp.stack(sp_parts) * scale       # [S, NKV, G, K]
                sh3 = sp.shape[1:]
                col3 = jax.lax.broadcasted_iota(jnp.int32, sh3, 2)
                keeps = []
                for j in range(S):
                    kj = col3 < cnt
                    if window is not None:
                        # pending token c sits at position prefix + c;
                        # the query is at qpos = prefix + cnt (always
                        # leaves col = cnt-1 in-window, so the cnt
                        # guard above covers the newest slot)
                        kj &= ((col3 + kl_ref[bi * S + j])
                               > (qp_ref[bi * S + j] - window))
                    keeps.append(kj)
                keep = jnp.stack(keeps)                # [S, NKV, G, K]
                sp = jnp.where(keep, sp, NEG_INF)
                m_prev = m_s[...]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sp, axis=3, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(sp - m_new)
                # same universal remask as the page path (a window can
                # fully mask every pending slot for one sequence)
                p = jnp.where(keep, p, 0.0)
                l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=3,
                                                      keepdims=True)
                o_parts = [jax.lax.dot_general(
                    p[j], vp[j], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                    for j in range(S)]
                acc_ref[...] = acc_ref[...] * alpha + jnp.stack(o_parts)
                m_s[...] = m_new
        if newkv:
            qv = q_ref[...].astype(jnp.float32)        # [S, NKV, G, D]
            kn = kn_ref[...].astype(jnp.float32)       # [S, NKV, D]
            vn = vn_ref[...].astype(jnp.float32)
            s1 = jnp.sum(qv * kn[:, :, None, :], axis=3,
                         keepdims=True) * scale        # [S, NKV, G, 1]
            m_prev = m_s[...]
            m_new = jnp.maximum(m_prev, s1)
            alpha = jnp.exp(m_prev - m_new)
            p1 = jnp.exp(s1 - m_new)
            l_s[...] = l_s[...] * alpha + p1
            acc_ref[...] = acc_ref[...] * alpha + p1 * vn[:, :, None, :]
            m_s[...] = m_new
        if finalize:
            o_ref[:] = (acc_ref[:]
                        / jnp.maximum(l_s[:], 1e-30)).astype(o_ref.dtype)
        else:
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)  # UNnormalized
        m_ref[:] = m_s[:]
        l_ref[:] = l_s[:]


def _prefix_kernel_manual(*args, bs: int, scale: float, window=None,
                          quant: bool = False, stacked: bool = False,
                          S: int = 1, mb: int = 1, n_groups: int = 1,
                          Q: int = 3, nb_pool: int = 0, kk: int = 0,
                          pending: bool = False, newkv: bool = False,
                          finalize: bool = False,
                          pend_k_major: bool = False,
                          pquant: bool = False):
    """Deep-queue manual-DMA decode kernel (head-concat state layout).

    One grid step. The kernel walks items t = g * mb + i (sequence group
    g, page step i) with a Q-slot fetch queue: item t's compute overlaps
    the in-flight DMAs of items t+1..t+Q-1. Per item, up to S K-pages +
    S V-pages (+ scales) are fetched with per-sequence `pl.when` guards,
    so invalid pages (beyond a sequence's prefix, or wholly below the
    sliding window) cost NO HBM traffic — the auto kernel gets the same
    effect from clamped tables, but pays Mosaic's one-step-lookahead
    fetch schedule (~377 GB/s effective vs the part's measured ~490
    cold ceiling, tools/attn_probe.py round 5). The lookahead buffer
    (`pending`) is fetched once per group, double-buffered, at the
    group's first item. Math is identical to _prefix_kernel_hc: scores
    [NKV, S*QT, S*BS] block-diagonal masked, one vectorized
    online-softmax update per item, pending/new-token merge + finalize
    folded into the group's last item.
    """
    off = 1 if stacked else 0
    pref = off + 2 + (1 if window is not None else 0) + (1 if pending else 0)
    bt_ref, kl_ref = args[off], args[off + 1]
    qp_ref = args[off + 2] if window is not None else kl_ref
    cnt_ref = args[pref - 1] if pending else None
    lay_ref = args[0] if stacked else None
    refs = list(args[pref:])
    q_ref, k_any, v_any = refs[0], refs[1], refs[2]
    idx = 3
    if quant:
        ks_any, vs_any = refs[idx], refs[idx + 1]
        idx += 2
    if pending:
        pk_any, pv_any = refs[idx], refs[idx + 1]
        idx += 2
        if pquant:
            psk_any, psv_any = refs[idx], refs[idx + 1]
            idx += 2
    if newkv:
        kn_ref, vn_ref = refs[idx], refs[idx + 1]
        idx += 2
    o_ref, m_ref, l_ref = refs[idx:idx + 3]
    idx += 3
    kbuf, vbuf = refs[idx], refs[idx + 1]
    idx += 2
    if quant:
        ksbuf, vsbuf = refs[idx], refs[idx + 1]
        idx += 2
    if pending:
        pkbuf, pvbuf = refs[idx], refs[idx + 1]
        idx += 2
        if pquant:
            pskbuf, psvbuf = refs[idx], refs[idx + 1]
            idx += 2
    m_s, l_s, acc_ref, sems = refs[idx:idx + 4]
    idx += 4
    psem = refs[idx] if pending else None

    nkv, qt, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    R = S * qt
    n_items = n_groups * mb
    base = lay_ref[0] * nb_pool if stacked else 0

    def seq_ok(seq, i):
        ok = (kl_ref[seq] - i * bs) > 0
        if window is not None:
            ok &= (i * bs + bs - 1) > (qp_ref[seq] - window)
        return ok

    def page_dmas(t, slot, j):
        seq = (t // mb) * S + j
        i = t % mb
        page = base + bt_ref[seq * mb + i]
        out = [pltpu.make_async_copy(k_any.at[page], kbuf.at[slot, j],
                                     sems.at[slot, j]),
               pltpu.make_async_copy(v_any.at[page], vbuf.at[slot, j],
                                     sems.at[slot, S + j])]
        if quant:
            out += [pltpu.make_async_copy(ks_any.at[page],
                                          ksbuf.at[slot, j],
                                          sems.at[slot, 2 * S + j]),
                    pltpu.make_async_copy(vs_any.at[page],
                                          vsbuf.at[slot, j],
                                          sems.at[slot, 3 * S + j])]
        return out

    # lookahead-buffer fetch: per group (K-row x S-sequence strided
    # slice), in CH-row chunks so only ceil(cnt / CH) chunks move —
    # in a fused multi-step call cnt averages K/2, so this halves the
    # buffer traffic (~13 us/layer at b64 K32). Rows >= cnt are masked
    # in the merge; their VMEM slots hold zeros (start-of-kernel
    # zeroing) or stale finite data from an earlier group. A single
    # contiguous layer-wide fetch measured SLOWER end-to-end (+11 us):
    # its 2 x 4MB descriptors serialize against the page stream.
    CH = min(8, kk) if kk else 0
    n_pchunks = -(-kk // CH) if kk else 0

    def pend_dmas(g, c):
        pslot = jax.lax.rem(g, 2)
        r0 = c * CH
        if pend_k_major:
            base_r = lay_ref[0] * kk if stacked else 0
            srck = pk_any.at[pl.ds(base_r + r0, CH), pl.ds(g * S, S)]
            srcv = pv_any.at[pl.ds(base_r + r0, CH), pl.ds(g * S, S)]
            dstk = pkbuf.at[pslot, pl.ds(r0, CH)]
            dstv = pvbuf.at[pslot, pl.ds(r0, CH)]
        else:
            srck = pk_any.at[pl.ds(g * S, S), :, pl.ds(r0, CH)]
            srcv = pv_any.at[pl.ds(g * S, S), :, pl.ds(r0, CH)]
            dstk = pkbuf.at[pslot, :, :, pl.ds(r0, CH)]
            dstv = pvbuf.at[pslot, :, :, pl.ds(r0, CH)]
        out = [pltpu.make_async_copy(srck, dstk, psem.at[pslot, 0, c]),
               pltpu.make_async_copy(srcv, dstv, psem.at[pslot, 1, c])]
        if pquant:
            if pend_k_major:
                base_r = lay_ref[0] * kk if stacked else 0
                sck = psk_any.at[pl.ds(base_r + r0, CH), pl.ds(g * S, S)]
                scv = psv_any.at[pl.ds(base_r + r0, CH), pl.ds(g * S, S)]
                dsk = pskbuf.at[pslot, pl.ds(r0, CH)]
                dsv = psvbuf.at[pslot, pl.ds(r0, CH)]
            else:
                sck = psk_any.at[pl.ds(g * S, S), :, pl.ds(r0, CH)]
                scv = psv_any.at[pl.ds(g * S, S), :, pl.ds(r0, CH)]
                dsk = pskbuf.at[pslot, :, :, pl.ds(r0, CH)]
                dsv = psvbuf.at[pslot, :, :, pl.ds(r0, CH)]
            out += [pltpu.make_async_copy(sck, dsk, psem.at[pslot, 2, c]),
                    pltpu.make_async_copy(scv, dsv, psem.at[pslot, 3, c])]
        return out

    def start_item(t, slot):
        g, i = t // mb, t % mb
        for j in range(S):
            ok = seq_ok(g * S + j, i)

            @pl.when(ok)
            def _():
                for dma in page_dmas(t, slot, j):
                    dma.start()

            # a skipped page's p columns are exact zeros, but
            # 0 * NaN = NaN through the P-V dot if the V-side slot
            # holds uninitialized FLOAT garbage. int8 garbage is always
            # finite, so the quant path only needs its f32 v-scale slot
            # (8KB) zeroed — zeroing the 256KB V page itself measured
            # ~16 MB/layer of pure VPU stores at the flagship shapes.
            # K-side garbage is masked before use (scores -> NEG_INF).
            @pl.when(jnp.logical_not(ok))
            def _():
                if quant:
                    vsbuf[slot, j] = jnp.zeros_like(vsbuf[slot, j])
                elif jnp.issubdtype(vbuf.dtype, jnp.floating):
                    vbuf[slot, j] = jnp.zeros_like(vbuf[slot, j])
        if pending:
            for c in range(n_pchunks):
                @pl.when((i == 0) & (cnt_ref[0] > c * CH))
                def _():
                    for dma in pend_dmas(g, c):
                        dma.start()

    def wait_item(t, slot):
        g, i = t // mb, t % mb
        for j in range(S):
            @pl.when(seq_ok(g * S + j, i))
            def _():
                for dma in page_dmas(t, slot, j):
                    dma.wait()
        if pending:
            for c in range(n_pchunks):
                @pl.when((i == mb - 1) & (cnt_ref[0] > c * CH))
                def _():
                    for dma in pend_dmas(g, c):
                        dma.wait()

    def cat_mask(g, C_blk, col_valid):
        """Block-diagonal keep over [R, S*C_blk] (see _prefix_kernel_hc)."""
        C = S * C_blk
        colc = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        rowr = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
        cc = colc % C_blk
        keep = None
        for j in range(S):
            blk = ((colc // C_blk) == j) & ((rowr // qt) == j)
            mj = blk & col_valid(j, cc)
            keep = mj if keep is None else (keep | mj)
        return keep

    nocompute = _os.environ.get("VBPT_ATTN_NOCOMPUTE", "") == "1"

    def compute_item(t, slot):
        g, i = t // mb, t % mb

        @pl.when(i == 0)
        def _():
            m_s[:] = jnp.full_like(m_s, NEG_INF)
            l_s[:] = jnp.zeros_like(l_s)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        process = None
        for j in range(S):
            ok = seq_ok(g * S + j, i)
            process = ok if process is None else (process | ok)
        if nocompute:
            process = process & (t < 0)

        @pl.when(process)
        def _():
            qv = q_ref[pl.ds(g * S, S)]                # [S, NKV, QT, D]
            q_cat = qv.transpose(1, 0, 2, 3).reshape(nkv, R, d)
            # Mosaic's matmul wants rank-3 operands with leading batch
            # (multi-dim contractions and non-leading rhs batch dims
            # both fail to lower), so the page block pays one VMEM
            # relayout to the concat layout per item
            k_cat = (kbuf[slot].transpose(1, 0, 2, 3)
                     .reshape(nkv, S * bs, d))         # [NKV, S*BS, D]
            if k_cat.dtype == jnp.int8:
                k_cat = k_cat.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q_cat.astype(k_cat.dtype), k_cat,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s.astype(jnp.float32) * scale          # [NKV, R, S*BS]
            if quant:
                ks_cat = (ksbuf[slot].transpose(1, 0, 2)
                          .reshape(nkv, S * bs))
                s = s * ks_cat[:, None, :]

            def page_valid(j, cc):
                mj = cc < (kl_ref[g * S + j] - i * bs)
                if window is not None:
                    mj &= (cc + i * bs) > (qp_ref[g * S + j] - window)
                return mj

            keep = cat_mask(g, bs, page_valid)         # [R, S*BS]
            s = jnp.where(keep[None], s, NEG_INF)
            m_prev = m_s[...]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            # universal remask — see _prefix_kernel (kills exp(0)=1 on
            # fully-masked sequences AND garbage in unfetched slots:
            # a skipped page's buffer holds stale bytes, masked here)
            p = jnp.where(keep[None], p, 0.0)
            l_s[...] = (l_s[...] * alpha
                        + jnp.sum(p, axis=2, keepdims=True))
            if quant:
                vs_cat = (vsbuf[slot].transpose(1, 0, 2)
                          .reshape(nkv, S * bs))
                p = p * vs_cat[:, None, :]
            v_cat = (vbuf[slot].transpose(1, 0, 2, 3)
                     .reshape(nkv, S * bs, d))
            if v_cat.dtype == jnp.int8:
                v_cat = v_cat.astype(jnp.bfloat16)
            acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
                p.astype(v_cat.dtype), v_cat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m_s[...] = m_new

    def tail_item(t):
        g = t // mb
        if pending:
            @pl.when(cnt_ref[0] > 0)
            def _():
                cnt = cnt_ref[0]
                pslot = jax.lax.rem(g, 2)
                qv = q_ref[pl.ds(g * S, S)].astype(jnp.float32)
                q_cat = qv.transpose(1, 0, 2, 3).reshape(nkv, R, d)
                kp = pkbuf[pslot]
                vp = pvbuf[pslot]
                if pquant:
                    # dequant at width (scale-fold needs a reshape
                    # Mosaic rejects; the pending block is tiny)
                    kp = (kp.astype(jnp.float32)
                          * pskbuf[pslot][..., None])
                    vp = (vp.astype(jnp.float32)
                          * psvbuf[pslot][..., None])
                if pend_k_major:                       # [K, S, NKV, D]
                    kp_cat = kp.transpose(2, 1, 0, 3)  # [NKV, S, K, D]
                    vp_cat = vp.transpose(2, 1, 0, 3)
                else:                                  # [S, NKV, K, D]
                    kp_cat = kp.transpose(1, 0, 2, 3)
                    vp_cat = vp.transpose(1, 0, 2, 3)
                kp_cat = kp_cat.reshape(nkv, S * kk, d).astype(jnp.float32)
                vp_cat = vp_cat.reshape(nkv, S * kk, d).astype(jnp.float32)
                sp = jax.lax.dot_general(
                    q_cat, kp_cat, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale

                def pend_valid(j, cc):
                    mj = cc < cnt
                    if window is not None:
                        mj &= ((cc + kl_ref[g * S + j])
                               > (qp_ref[g * S + j] - window))
                    return mj

                keep = cat_mask(g, kk, pend_valid)     # [R, S*K]
                sp = jnp.where(keep[None], sp, NEG_INF)
                m_prev = m_s[...]
                m_new = jnp.maximum(
                    m_prev, jnp.max(sp, axis=2, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(sp - m_new)
                p = jnp.where(keep[None], p, 0.0)
                l_s[...] = (l_s[...] * alpha
                            + jnp.sum(p, axis=2, keepdims=True))
                acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
                    p, vp_cat, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m_s[...] = m_new
        if newkv:
            qv = q_ref[pl.ds(g * S, S)].astype(jnp.float32)
            q_cat = qv.transpose(1, 0, 2, 3)           # [NKV, S, QT, D]
            kn = kn_ref[pl.ds(g * S, S)].astype(jnp.float32)
            vn = vn_ref[pl.ds(g * S, S)].astype(jnp.float32)
            kn_t = kn.transpose(1, 0, 2)               # [NKV, S, D]
            vn_t = vn.transpose(1, 0, 2)
            s1 = jnp.sum(q_cat * kn_t[:, :, None, :], axis=3,
                         keepdims=True) * scale        # [NKV, S, QT, 1]
            s1 = s1.reshape(nkv, R, 1)
            m_prev = m_s[...]
            m_new = jnp.maximum(m_prev, s1)
            alpha = jnp.exp(m_prev - m_new)
            p1 = jnp.exp(s1 - m_new)
            l_s[...] = l_s[...] * alpha + p1
            upd = (p1.reshape(nkv, S, qt, 1)
                   * vn_t[:, :, None, :]).reshape(nkv, R, d)
            acc_ref[...] = acc_ref[...] * alpha + upd
            m_s[...] = m_new

        def to_out(x):
            last = x.shape[-1]
            return x.reshape(nkv, S, qt, last).transpose(1, 0, 2, 3)

        if finalize:
            out = to_out(acc_ref[...] / jnp.maximum(l_s[...], 1e-30))
        else:
            out = to_out(acc_ref[...])
        o_ref[pl.ds(g * S, S)] = out.astype(o_ref.dtype)
        m_ref[pl.ds(g * S, S)] = to_out(m_s[...])
        l_ref[pl.ds(g * S, S)] = to_out(l_s[...])

    if pending:
        # un-fetched chunks must be finite through 0 * x in the PV dot:
        # int8 buffer garbage is finite but FLOAT pending (and the f32
        # v-scales) can hold NaNs in never-written VMEM
        if pquant:
            psvbuf[...] = jnp.zeros_like(psvbuf)
        else:
            pvbuf[...] = jnp.zeros_like(pvbuf)
    for t0 in range(min(Q - 1, n_items)):
        start_item(t0, t0 % Q)

    # issue-BEFORE-compute rotation (the guide's double-buffer order):
    # at body t the DMAs for item t+Q-1 go into slot (t-1) % Q — the
    # buffer whose compute was issued LAST iteration and has had a full
    # DMA-wait to drain. Starting into the just-computed slot after
    # compute (the naive order) serializes the loop on the
    # scalar<->vector hazard sync each item (measured +~25 us/layer).
    def body(t, _):
        nxt = t + Q - 1

        @pl.when(nxt < n_items)
        def _():
            start_item(nxt, jax.lax.rem(nxt, Q))
        slot = jax.lax.rem(t, Q)
        wait_item(t, slot)
        compute_item(t, slot)

        @pl.when(t % mb == mb - 1)
        def _():
            tail_item(t)
        return ()

    jax.lax.fori_loop(0, n_items, body, (), unroll=False)


def _manual_attention_call(qg, k_pages, v_pages, flat_bt, prefix_lens,
                           scale, *, window, qpos_lens, k_scale, v_scale,
                           pk_op, pv_op, count, new_kv, layer, nb_pool,
                           S, bs, mb, kk, p_stacked, finalize, interpret,
                           psk_op=None, psv_op=None):
    """pallas_call plumbing for _prefix_kernel_manual (decode only).

    Pools/scales (and the folded pending buffer) ride in ANY memory
    space — the kernel DMAs pages itself; q / new-kv and the outputs are
    ordinary VMEM blocks on a one-step grid. VMEM budget: Q slots of
    S K+V page blocks dominate (Q*S*2*bs*d*nkv bytes); the scoped limit
    is raised to fit — v5e has 128MB physical VMEM, the default 16MB
    scoped cap exists for Mosaic's auto-pipelining headroom the manual
    kernel doesn't need.
    """
    b, nkv, g, d = qg.shape
    stacked = layer is not None
    quant = k_scale is not None
    pending = pk_op is not None
    newkv = new_kv is not None
    n_groups = b // S
    Q = min(_MANUAL_Q, max(2, n_groups * mb))

    prefetch = [flat_bt, jnp.asarray(prefix_lens, jnp.int32)]
    if window is not None:
        prefetch.append(jnp.asarray(qpos_lens, jnp.int32))
    if pending:
        prefetch.append(jnp.asarray(count, jnp.int32).reshape(1))
    if stacked:
        prefetch.insert(0, jnp.asarray(layer, jnp.int32).reshape(1))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def whole(shape):
        return pl.BlockSpec(shape, lambda *a: (0,) * len(shape))

    in_specs = [whole((b, nkv, g, d)), any_spec, any_spec]
    operands = [qg, k_pages, v_pages]
    if quant:
        in_specs += [any_spec, any_spec]
        operands += [k_scale, v_scale]
    if pending:
        in_specs += [any_spec, any_spec]
        operands += [pk_op, pv_op]
        if psk_op is not None:
            in_specs += [any_spec, any_spec]
            operands += [psk_op, psv_op]
    if newkv:
        in_specs += [whole((b, nkv, d))] * 2
        operands += [new_kv[0], new_kv[1]]

    kv_dt = k_pages.dtype
    scratch = [pltpu.VMEM((Q, S, nkv, bs, d), kv_dt),
               pltpu.VMEM((Q, S, nkv, bs, d), kv_dt)]
    if quant:
        scratch += [pltpu.VMEM((Q, S, nkv, bs), jnp.float32)] * 2
    if pending:
        pshape = ((2, kk, S, nkv, d) if p_stacked
                  else (2, S, nkv, kk, d))
        scratch += [pltpu.VMEM(pshape, pk_op.dtype)] * 2
        if psk_op is not None:
            scshape = ((2, kk, S, nkv) if p_stacked
                       else (2, S, nkv, kk))
            scratch += [pltpu.VMEM(scshape, jnp.float32)] * 2
    scratch += [pltpu.VMEM((nkv, S * g, 1), jnp.float32),
                pltpu.VMEM((nkv, S * g, 1), jnp.float32),
                pltpu.VMEM((nkv, S * g, d), jnp.float32),
                pltpu.SemaphoreType.DMA((Q, 4 * S if quant else 2 * S))]
    if pending:
        scratch.append(pltpu.SemaphoreType.DMA(
            (2, 4 if psk_op is not None else 2, -(-kk // min(8, kk)))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(1,),
        in_specs=in_specs,
        out_specs=(whole((b, nkv, g, d)),
                   whole((b, nkv, g, 1)),
                   whole((b, nkv, g, 1))),
        scratch_shapes=scratch,
    )
    # scoped-VMEM cap: page slots + q/out/state + compute temporaries
    slot_bytes = (2 * S * nkv * bs * d * kv_dt.itemsize
                  + (2 * S * nkv * bs * 4 if quant else 0))
    vmem_bytes = min(100 * 1024 * 1024,
                     Q * slot_bytes + 24 * 1024 * 1024)

    acc, m, l = pl.pallas_call(
        functools.partial(_prefix_kernel_manual,
                          bs=bs, scale=scale, window=window, quant=quant,
                          stacked=stacked, S=S, mb=mb, n_groups=n_groups,
                          Q=Q, nb_pool=nb_pool, kk=kk, pending=pending,
                          newkv=newkv, finalize=finalize,
                          pend_k_major=p_stacked,
                          pquant=psk_op is not None),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nkv, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, g, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, g, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(*prefetch, *operands)
    r = nkv * g
    return (acc.reshape(b, r, d), m.reshape(b, r, 1), l.reshape(b, r, 1))


def _pick_qtile(rows: int) -> int:
    # 128 rows keeps the f32 accumulator + double-buffered out blocks well
    # under the 16MB VMEM scoped limit (512 rows measured 16.47MB — OOM)
    for cand in (128, 64, 32, 16, 8):
        if rows % cand == 0:
            return cand
    return rows


def paged_prefix_attention(q, k_pages, v_pages, block_tables, prefix_lens,
                           scale: float, interpret: bool = False,
                           window=None, k_scale=None, v_scale=None,
                           layer=None, qpos_lens=None, pending_kv=None,
                           count=None, new_kv=None, finalize=False,
                           qpos_group=None, manual=None,
                           pending_scales=None):
    """Unnormalized flash attention over cached prefix pages (mesh-aware).

    Under an active mesh (parallel/mesh.py:set_active_mesh) the kernel
    wraps itself in a jax.shard_map: q rows and KV pages both shard over
    "model" on the kv-head axis, so each TP shard runs the SAME Pallas
    program on its heads — no collectives inside attention (heads are
    independent); the surrounding projections' all-reduces stay XLA's
    business. This is what keeps multi-chip serving on the kernel fast
    path instead of silently reverting to XLA gather attention.
    See _paged_prefix_attention for the kernel contract.
    """
    from ..parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is not None:
        return _paged_prefix_attention_sharded(
            q, k_pages, v_pages, block_tables, prefix_lens, scale, mesh,
            interpret=interpret, window=window, k_scale=k_scale,
            v_scale=v_scale, layer=layer, qpos_lens=qpos_lens,
            pending_kv=pending_kv, count=count, new_kv=new_kv,
            finalize=finalize, qpos_group=qpos_group, manual=manual,
            pending_scales=pending_scales)
    return _paged_prefix_attention(
        q, k_pages, v_pages, block_tables, prefix_lens, scale,
        interpret=interpret, window=window, k_scale=k_scale,
        v_scale=v_scale, layer=layer, qpos_lens=qpos_lens,
        pending_kv=pending_kv, count=count, new_kv=new_kv,
        finalize=finalize, qpos_group=qpos_group, manual=manual,
        pending_scales=pending_scales)


def _paged_prefix_attention_sharded(q, k_pages, v_pages, block_tables,
                                    prefix_lens, scale: float, mesh,
                                    interpret: bool = False, window=None,
                                    k_scale=None, v_scale=None, layer=None,
                                    qpos_lens=None, pending_kv=None,
                                    count=None, new_kv=None,
                                    finalize=False, qpos_group=None,
                                    manual=None, pending_scales=None):
    """shard_map TP/EP wrapping of the local kernel.

    Specs: q [B, R, D] rows are kv-head-major, so P(.., "model", ..)
    splits them into contiguous whole-head groups matching the page
    pool's kv-head sharding (parallel/sharding.py:kv_cache_spec). The
    "data" axis must be size 1 (the engine enforces dp-as-replicas when
    kernels are on): block ids index the whole pool. "expert"/"pipe"
    stay replicated.
    """
    from jax.sharding import PartitionSpec as P

    stacked = layer is not None
    qs = P("data", "model", None)
    pg = (P(None, None, "model", None, None) if stacked
          else P(None, "model", None, None))
    ps = (P(None, None, "model", None) if stacked
          else P(None, "model", None))
    quant = k_scale is not None

    windowed = window is not None
    if windowed and qpos_lens is None:
        qpos_lens = prefix_lens

    pending = pending_kv is not None
    newkv = new_kv is not None
    args = [q, k_pages, v_pages, block_tables, prefix_lens]
    specs = [qs, pg, pg, P("data", None), P("data")]
    if windowed:
        args.append(qpos_lens)
        specs.append(P("data"))
    if quant:
        args += [k_scale, v_scale]
        specs += [ps, ps]
    if pending:
        # lookahead buffer — [B, NKV, K, D] page-shaped, or stacked
        # K-major [L, K, B, NKV, D]: rows over "data", kv heads over
        # "model" like the page pool
        pspec = (P(None, None, "data", "model", None)
                 if pending_kv[0].ndim == 5
                 else P("data", "model", None, None))
        args += [pending_kv[0], pending_kv[1],
                 jnp.asarray(count, jnp.int32)]
        specs += [pspec] * 2 + [P()]
        if pending_scales is not None:
            psc_spec = (P(None, None, "data", "model")
                        if pending_kv[0].ndim == 5
                        else P("data", "model", None))
            args += [pending_scales[0], pending_scales[1]]
            specs += [psc_spec] * 2
    if newkv:
        args += [new_kv[0], new_kv[1]]
        specs += [P("data", "model", None)] * 2
    if stacked:
        args.append(jnp.asarray(layer, jnp.int32))
        specs.append(P())

    def inner(*a):
        q_, kp, vp, bt, ln = a[:5]
        i = 5
        qp = None
        if windowed:
            qp = a[i]
            i += 1
        ks = vs = None
        if quant:
            ks, vs = a[i], a[i + 1]
            i += 2
        pkv = cnt = nkv_ = psc = None
        if pending:
            pkv = (a[i], a[i + 1])
            cnt = a[i + 2]
            i += 3
            if pending_scales is not None:
                psc = (a[i], a[i + 1])
                i += 2
        if newkv:
            nkv_ = (a[i], a[i + 1])
            i += 2
        ly = a[i] if stacked else None
        return _paged_prefix_attention(
            q_, kp, vp, bt, ln, scale, interpret=interpret, window=window,
            k_scale=ks, v_scale=vs, layer=ly, qpos_lens=qp,
            pending_kv=pkv, count=cnt, new_kv=nkv_, finalize=finalize,
            qpos_group=qpos_group, manual=manual, pending_scales=psc)

    # nested inside another shard_map (pipeline parallelism's pipe-manual
    # region): the inner wrap must be built against the CONTEXT abstract
    # mesh, whose "pipe" axis is already Manual — passing the concrete
    # all-Auto mesh raises a mesh-mismatch error
    mesh_arg = mesh
    try:
        ctx = jax.sharding.get_abstract_mesh()
        if (ctx is not None and not ctx.empty
                and any(t == jax.sharding.AxisType.Manual
                        for t in ctx.axis_types)):
            mesh_arg = ctx
    except Exception:
        pass
    return jax.shard_map(inner, mesh=mesh_arg, in_specs=tuple(specs),
                         out_specs=(qs, qs, qs), check_vma=False)(*args)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "window",
                                             "finalize", "qpos_group",
                                             "manual"))
def _paged_prefix_attention(q, k_pages, v_pages, block_tables, prefix_lens,
                            scale: float, interpret: bool = False,
                            window=None, k_scale=None, v_scale=None,
                            layer=None, qpos_lens=None, pending_kv=None,
                            count=None, new_kv=None, finalize=False,
                            qpos_group=None, manual=None,
                            pending_scales=None):
    """Single-device kernel invocation.

    qpos_lens: true query positions for the sliding-window bound (the
    lookahead buffer puts the query `count` tokens past the in-cache
    prefix); defaults to prefix_lens.

    q: [B, R, D] where R = NH for decode or T*G row-flattened queries for
    chunked prefill (every row attends the whole prefix — valid because
    all prefix positions precede the chunk). Returns
    (acc [B, R, D] f32, m [B, R, 1], l [B, R, 1]): softmax·V = acc/l at
    running max m. Rows with prefix_len == 0 return (0, -inf, 0).

    window: Mistral-style sliding window: keys valid iff
    pos > qpos - window. Pages fully below the window are skipped
    (remapped => no DMA). qpos_group (static) sets how many q rows share
    one query position: decode's g rows all sit at prefix_len
    (row // group == 0); chunked prefill passes its heads-per-kv-head
    group so the T*G flattened rows advance one position per group —
    the kernel then applies PER-ROW window bounds (and re-masks p,
    since the row-0-conservative page-skip can leave pages fully
    masked for early rows).

    Large R is tiled on a third grid axis (VMEM-bounded); pages are
    re-streamed per query tile.

    layer: traced int32 scalar selecting a layer of STACKED pages
    [L, NB, NKV, BS, D] (and scales [L, NB, NKV, BS]) — the kernel DMAs
    layer pages directly out of the stacked pool via scalar-prefetch
    indexing, so a lax.scan over layers never materializes a per-layer
    copy of the pool.
    """
    b, r, d = q.shape
    stacked = layer is not None
    nb_pool, nkv, bs, _ = k_pages.shape[1:] if stacked else k_pages.shape
    mb = block_tables.shape[1]
    g = r // nkv
    qg = q.reshape(b, nkv, g, d)
    qt = _pick_qtile(g)
    nqt = g // qt
    # S sequences per grid step: their independent online-softmax chains
    # interleave (see _prefix_kernel), and the per-grid-step fixed cost
    # amortizes over S pages' worth of work. Decode only (nqt == 1;
    # chunked prefill's wide q tiles keep the VPU busy by themselves).
    # Target ~2048 KV tokens per grid step with int8 pages (1024 bf16 —
    # VMEM: S*bs*4KB of double-buffered K+V blocks must stay well under
    # the 16MB scoped limit; S16 x bs256 int8 OOMs). Measured on v5e
    # (llama8b w8a8 b64, full step): bs256 S8 16.98 ms, S4 17.15, S2
    # 17.39; bs128 S16 17.67, S8 17.85. Wide interleave matters most for
    # the in-kernel pending/new-token merges (serial per-sequence dot
    # chains at the last grid step interleave across S sequences).
    S = 1
    if nqt == 1:
        kv_bytes = 1 if k_pages.dtype == jnp.int8 else 2
        if _SEQ_INTERLEAVE is not None:
            want = _SEQ_INTERLEAVE
        else:
            want = max(1, 2048 // (bs * kv_bytes))
            # VMEM guard: per-sequence block bytes — q (2B) + out + f32
            # accumulator (4B each) on the qt rows, plus double-buffered
            # K+V page blocks — against a ~10MB scoped budget (the 16MB
            # limit minus scale/pending blocks and headroom)
            per_seq = (10 * nkv * qt * d
                       + 4 * nkv * bs * d * kv_bytes)
            want = min(want, max(1, 10_000_000 // per_seq))
        # S caps at 8: wider interleave never measured faster (S16/bs128
        # = S8/bs256 in tokens-per-step, 15.77 vs 15.45 ms at b64), and
        # the head-concat kernel's concat temporaries put S16 x bs128
        # over the 16MB scoped-VMEM limit (19.5MB compile OOM at b128)
        for cand in (8, 4, 2):
            if cand <= want and b % cand == 0:
                S = cand
                break

    if window is not None and qpos_lens is None:
        qpos_lens = prefix_lens

    # Pre-clamp the block table in XLA (vectorized, ~free): OOB steps
    # point at the last valid page so Mosaic's pipeline skips the
    # duplicate fetch; with a sliding window, below-window steps clamp
    # to the first in-window page. Doing this HERE keeps the kernel's
    # per-operand index maps to a single SMEM load — the round-4
    # bisection measured ~52 us/layer of harness overhead at B=64 S=8
    # that scales with (grid steps x operands x index-map length): the
    # scalar core runs every operand's map at every grid step, so a
    # 10-op clamp chain across 32 page/scale operands dominated the
    # kernel's non-DMA time (NOCOMPUTE experiment, this file's log in
    # ARCHITECTURE.md round 4).
    steps_ar = jnp.arange(mb, dtype=jnp.int32)[None, :]
    last_pg = jnp.maximum((prefix_lens + bs - 1) // bs - 1, 0)
    iic = jnp.minimum(steps_ar, last_pg[:, None])
    if window is not None:
        first_pg = jnp.maximum(
            (jnp.asarray(qpos_lens, jnp.int32) - window + 1) // bs, 0)
        iic = jnp.maximum(iic, first_pg[:, None])
    flat_bt = jnp.take_along_axis(block_tables, iic, axis=1).reshape(-1)

    # Fold stacked pools to 4-D: a 5-D operand with a dropped layer dim
    # fetches page blocks at ~310 GB/s on v5e where the IDENTICAL 4-D
    # fetch runs at full ~820 GB/s (measured round 4: 103 vs 22 us for
    # 32 MB of pages through a trivial kernel — the whole ~52 us/layer
    # "fixed" kernel overhead was this). The reshape of a contiguous
    # row-major pool is metadata-only; pages index as layer*NB + block.
    if stacked:
        k_pages = k_pages.reshape((-1,) + k_pages.shape[2:])
        v_pages = v_pages.reshape((-1,) + v_pages.shape[2:])
        if k_scale is not None:
            k_scale = k_scale.reshape((-1,) + k_scale.shape[2:])
            v_scale = v_scale.reshape((-1,) + v_scale.shape[2:])

    # Deep-queue manual-DMA decode path (see _prefix_kernel_manual).
    # Decode semantics only (no per-row window bounds — chunked-prefill
    # tiles with a sliding window stay on the auto kernel); the QK-int8
    # experiment stays on the auto kernel too.
    use_manual = _MANUAL if manual is None else manual
    rowwise_window = (window is not None and qpos_group is not None
                      and qpos_group != g)
    if (use_manual and nqt == 1 and not rowwise_window
            and not (k_scale is not None and _QK_INT8)):
        # the manual kernel raises the scoped-VMEM cap, so it can run
        # WIDER sequence groups than the auto kernel's S<=8: fewer,
        # longer items amortize the per-item scalar work (predicates,
        # DMA starts/waits) and feed the MXU bigger dots. Budget: Q
        # double-sided page slots within ~48MB.
        kv_b = 1 if k_pages.dtype == jnp.int8 else 2
        if _SEQ_INTERLEAVE is not None:
            want_m = _SEQ_INTERLEAVE
        else:
            want_m = 48_000_000 // (_MANUAL_Q * 2 * nkv * bs * d * kv_b)
        for cand in (16, 8, 4, 2, 1):
            if cand <= want_m and b % cand == 0:
                S = cand
                break
        pk_op = pv_op = None
        kk_m = 0
        pstk = False
        if pending_kv is not None:
            pstk = pending_kv[0].ndim == 5
            if pstk and not stacked:
                raise ValueError("stacked pending buffer needs `layer`")
            pk_op, pv_op = pending_kv[0], pending_kv[1]
            kk_m = pk_op.shape[1] if pstk else pk_op.shape[2]
            if pstk:
                pk_op = pk_op.reshape((-1,) + pk_op.shape[2:])
                pv_op = pv_op.reshape((-1,) + pv_op.shape[2:])
        psk_op = psv_op = None
        if pending_kv is not None and pending_scales is not None:
            psk_op, psv_op = pending_scales
            if pstk:
                psk_op = psk_op.reshape((-1,) + psk_op.shape[2:])
                psv_op = psv_op.reshape((-1,) + psv_op.shape[2:])
        return _manual_attention_call(
            qg, k_pages, v_pages, flat_bt, prefix_lens, scale,
            window=window, qpos_lens=qpos_lens, k_scale=k_scale,
            v_scale=v_scale, pk_op=pk_op, pv_op=pv_op, count=count,
            new_kv=new_kv, layer=layer, nb_pool=nb_pool, S=S, bs=bs,
            mb=mb, kk=kk_m, p_stacked=pstk, finalize=finalize,
            interpret=interpret, psk_op=psk_op, psv_op=psv_op)

    def page_index_j(j):
        def index(bi, qi, ii, *pref):
            o = 1 if stacked else 0
            page = pref[o][(bi * S + j) * mb + ii]
            if stacked:
                page = pref[0][0] * nb_pool + page
            return (page, 0, 0, 0)
        return index

    def page_index_js(j):
        def index(bi, qi, ii, *pref):
            return page_index_j(j)(bi, qi, ii, *pref)[:-1]
        return index

    def q_index(bi, qi, ii, *pref):
        return (bi, 0, qi, 0)

    quant = k_scale is not None
    # pools are 4-D here in both modes (stacked ones were folded above),
    # so the kernel always sees [1, NKV, BS, D] page blocks
    pg_block = (1, nkv, bs, d)
    ps_block = (1, nkv, bs)
    in_specs = [pl.BlockSpec((S, nkv, qt, d), q_index)]
    operands = [qg]
    in_specs += [pl.BlockSpec(pg_block, page_index_j(j)) for j in range(S)]
    operands += [k_pages] * S
    in_specs += [pl.BlockSpec(pg_block, page_index_j(j)) for j in range(S)]
    operands += [v_pages] * S
    if quant:
        in_specs += [pl.BlockSpec(ps_block, page_index_js(j))
                     for j in range(S)]
        operands += [k_scale] * S
        in_specs += [pl.BlockSpec(ps_block, page_index_js(j))
                     for j in range(S)]
        operands += [v_scale] * S
    pending = pending_kv is not None
    newkv = new_kv is not None
    if (pending or newkv or finalize) and nqt != 1:
        raise ValueError("pending/new-token merge is decode-only (one "
                         "query tile per sequence)")

    def batch_index(bi, qi, ii, *pref):
        return (bi, 0, 0, 0)

    def batch_index3(bi, qi, ii, *pref):
        return (bi, 0, 0)

    p_stacked = False
    if pending:
        # lookahead buffer — page-shaped per sequence, so the last grid
        # step merges it with the page path's contractions. A stacked
        # buffer is layer-indexed by the kernel like the stacked page
        # pool (a per-layer dynamic_index_in_dim in the scan costs a 4MB
        # materialized copy per buffer per layer — ~0.43 ms/step at
        # llama8b b64, step_bisect.py round 3). Stacked buffers are
        # K-MAJOR [L, K, B, NKV, D]: the engine's per-step write is then
        # a contiguous [B, NKV, D] slab per layer (the page-shaped
        # layout's write scattered 256B chunks at ~18 GB/s, ~0.45
        # ms/step); the kernel transposes its block back to page shape.
        p_stacked = pending_kv[0].ndim == 5
        if p_stacked and not stacked:
            raise ValueError("stacked pending buffer needs `layer`")
        pk_op, pv_op = pending_kv[0], pending_kv[1]
        kk = pk_op.shape[1]
        if p_stacked:
            # fold to 4-D like the pools (5-D dropped-dim fetches run at
            # ~1/3 bandwidth); block index `lay` covers rows lay*K..+K
            pk_op = pk_op.reshape((-1,) + pk_op.shape[2:])
            pv_op = pv_op.reshape((-1,) + pv_op.shape[2:])

        def pend_index(bi, qi, ii, *pref):
            if p_stacked:
                return (pref[0][0], bi, 0, 0)
            return (bi, 0, 0, 0)

        pend_block = ((kk, S, nkv, d) if p_stacked
                      else (S,) + pending_kv[0].shape[1:])
        in_specs += [pl.BlockSpec(pend_block, pend_index)] * 2
        operands += [pk_op, pv_op]
        if pending_scales is not None:
            # the scale tables ride as ONE whole-batch block per layer
            # (index constant across grid steps -> fetched once): a
            # per-group (kk, S, nkv) slice would fetch kk rows of
            # S*NKV*4 = 256 B each — the ~18 GB/s strided-chunk
            # pathology — at EVERY grid step (measured +1.6 ms/step at
            # b128 bs128, where the grid has 3x the steps). The kernel
            # slices its group's S sequences in VMEM instead.
            psk_op, psv_op = pending_scales
            if p_stacked:
                # stacked K-major scales [L, K, B, NKV] folded like the
                # buffer; block rows lay*K..+K x ALL B sequences
                psk_op = psk_op.reshape((-1,) + psk_op.shape[2:])
                psv_op = psv_op.reshape((-1,) + psv_op.shape[2:])

                def pend_sc_index(bi, qi, ii, *pref):
                    return (pref[0][0], 0, 0)

                psc_block = (kk, b, nkv)
            else:
                def pend_sc_index(bi, qi, ii, *pref):
                    return (0, 0, 0)

                psc_block = pending_scales[0].shape
            in_specs += [pl.BlockSpec(psc_block, pend_sc_index)] * 2
            operands += [psk_op, psv_op]
    if newkv:
        in_specs += [pl.BlockSpec((S, nkv, d), batch_index3)] * 2
        operands += [new_kv[0], new_kv[1]]

    prefetch = [flat_bt, prefix_lens]
    if window is not None:
        prefetch.append(jnp.asarray(qpos_lens, jnp.int32))
    if pending:
        prefetch.append(jnp.asarray(count, jnp.int32).reshape(1))
    if stacked:
        prefetch.insert(0, jnp.asarray(layer, jnp.int32).reshape(1))

    # head-concat kernel keeps state head-major ([NKV, S*QT, *]) so each
    # grid step issues 2*NKV MXU ops instead of 2*S*NKV (see _HEADCAT)
    hc = _HEADCAT
    scratch = ([pltpu.VMEM((nkv, S * qt, d), jnp.float32),
                pltpu.VMEM((nkv, S * qt, 1), jnp.float32),
                pltpu.VMEM((nkv, S * qt, 1), jnp.float32)]
               if hc else
               [pltpu.VMEM((S, nkv, qt, d), jnp.float32),
                pltpu.VMEM((S, nkv, qt, 1), jnp.float32),
                pltpu.VMEM((S, nkv, qt, 1), jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),  # [layer,] block_tables, lens
        grid=(b // S, nqt, mb),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((S, nkv, qt, d), q_index),
            pl.BlockSpec((S, nkv, qt, 1), q_index),
            pl.BlockSpec((S, nkv, qt, 1), q_index),
        ),
        scratch_shapes=scratch,
    )

    # q rows per query position: decode's g rows all share one position
    # (row // group == 0); a chunked-prefill tile's T*G rows advance one
    # position every `group` rows — the window bound is per-row there
    group = qpos_group if qpos_group is not None else g
    rowwise = window is not None and group != g

    acc, m, l = pl.pallas_call(
        functools.partial(_prefix_kernel_hc if hc else _prefix_kernel,
                          bs=bs, scale=scale, window=window,
                          quant=quant, stacked=stacked, S=S,
                          pending=pending, newkv=newkv, finalize=finalize,
                          group=group, rowwise=rowwise,
                          pend_k_major=p_stacked,
                          pquant=pending_scales is not None),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, nkv, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, g, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, nkv, g, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # bi/qi revisit no state (scratch resets at ii == 0, outputs
            # write at ii == mb-1); only the page axis carries the
            # online-softmax dependency — parallel semantics on the
            # first two axes lets Mosaic pipeline DMA across sequence
            # groups
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*prefetch, *operands)
    return (acc.reshape(b, r, d), m.reshape(b, r, 1), l.reshape(b, r, 1))


def decode_attention_deferred(q, k_new, v_new, k_pages, v_pages,
                              block_tables, prefix_lens, scale: float,
                              interpret: bool = False,
                              k_scale=None, v_scale=None, window=None,
                              layer=None, pending=None, manual=None):
    """Full decode attention WITHOUT writing the cache: prefix pages,
    the lookahead buffer, the new token's own KV, and the softmax
    normalization all inside ONE Pallas kernel call.

    q, k_new, v_new: [B, NH|NKV, D]. Returns [B, NH, D]. int8 KV pages
    dequantize inside the kernel (per-(page, head, token) scales).
    layer: index into STACKED pages (see paged_prefix_attention).
    pending: (k_buf [B, NKV, K, D], v_buf, count) — lookahead-buffer
    tokens from earlier steps of a fused multi-step call, page-shaped
    per sequence so the kernel merges them with the page path's own
    contractions. With a sliding window the query's TRUE position
    (prefix + count) drives the window bound, and pending tokens below
    the window are masked like any other key. Round 2 ran this merge in
    XLA after the kernel — ~56 us/layer of skinny batched einsums and
    layout copies per decode step (step_bisect.py round 3).
    """
    b, nh, d = q.shape
    qpos = None
    if window is not None and pending is not None:
        qpos = prefix_lens + pending[2]
    pkv = cnt = pscales = None
    if pending is not None:
        pkv = (pending[0], pending[1])
        cnt = pending[2]
        if len(pending) == 5:
            # int8-quantized lookahead buffer + per-(step, seq, head)
            # scales — same dequant discipline as the int8 page pool
            pscales = (pending[3], pending[4])
    out, _, _ = paged_prefix_attention(
        q, k_pages, v_pages, block_tables, prefix_lens, scale,
        interpret=interpret, window=window, k_scale=k_scale,
        v_scale=v_scale, layer=layer, qpos_lens=qpos,
        pending_kv=pkv, count=cnt, new_kv=(k_new, v_new), finalize=True,
        manual=manual, pending_scales=pscales)
    return out.reshape(b, nh, d).astype(q.dtype)


def chunk_prefill_attention_deferred(q, k_chunk, v_chunk, k_pages, v_pages,
                                     block_tables, prefix_lens, write_mask,
                                     scale: float, interpret: bool = False,
                                     use_kernel: bool = True, window=None,
                                     layer=None, k_scale=None, v_scale=None):
    """Chunked-prefill attention WITHOUT writing the cache.

    q, k_chunk, v_chunk: [B, T, NH|NKV, D] — the current chunk (global
    positions prefix_lens[b] .. prefix_lens[b]+T). Attention = streamed
    prefix pages (Pallas kernel, no gather) merged with in-chunk causal
    attention (XLA; T x T fits VMEM/MXU comfortably).
    write_mask: [B, T] — padding rows produce garbage but are masked as
    keys. window: sliding-window size — the kernel applies per-row lower
    bounds via qpos_group (row r's query sits at prefix + r//G), so
    windowed prefill stays on the Pallas path; only use_kernel=False
    drops to the XLA gather. k_scale/v_scale: int8 KV page scales
    (dequant inside the kernel / fused into the gather), so quantized-KV
    prefill can defer its cache write like decode does — a lax.scan
    carrying the quantized pool double-buffers it (pool-sized temp) and
    costs per-layer copies. Returns [B, T, NH, D].
    """
    b, t, nh, d = q.shape
    nkv = k_chunk.shape[2]
    g = nh // nkv

    # ---- prefix part: flatten (T, G) query rows per kv head ------------
    # [B, T, NKV, G, D] -> [B, NKV, T*G, D]
    qr = q.reshape(b, t, nkv, g, d).transpose(0, 2, 1, 3, 4) \
        .reshape(b, nkv * t * g, d)
    if use_kernel:
        acc1, m1, l1 = paged_prefix_attention(
            qr, k_pages, v_pages, block_tables, prefix_lens, scale,
            interpret=interpret, layer=layer, k_scale=k_scale,
            v_scale=v_scale, window=window, qpos_group=g)
    else:
        from ..models.common import gather_pages

        kp = gather_pages(k_pages, block_tables, k_scale,
                          layer=layer)  # [B, NKV, CTX, D]
        vp = gather_pages(v_pages, block_tables, v_scale, layer=layer)
        qg = qr.reshape(b, nkv, t * g, d).astype(jnp.float32)
        s = jnp.einsum("bkrd,bkcd->bkrc", qg, kp.astype(jnp.float32)) * scale
        ctx = kp.shape[2]
        cpos = jnp.arange(ctx)[None, :]                  # [1, CTX]
        keep = cpos < prefix_lens[:, None]               # [B, CTX]
        if window is not None:
            # row r's query position = prefix_lens + r//G
            qpos = (prefix_lens[:, None]
                    + (jnp.arange(t * g) // g)[None, :])  # [B, T*G]
            keep = (keep[:, None, :]
                    & (cpos[:, None, :] > qpos[:, :, None] - window))
            keep = keep[:, None, :, :]                   # [B, 1, R, CTX]
        else:
            keep = keep[:, None, None, :]                # [B, 1, 1, CTX]
        s = jnp.where(keep, s, NEG_INF)
        m1 = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m1)
        l1 = jnp.sum(p, axis=-1, keepdims=True)
        acc1 = jnp.einsum("bkrc,bkcd->bkrd", p, vp.astype(jnp.float32))
        acc1 = acc1.reshape(b, nkv * t * g, d)
        m1 = m1.reshape(b, nkv * t * g, 1)
        l1 = l1.reshape(b, nkv * t * g, 1)
    # back to [B, NKV, T, G, D]-aligned layout
    acc1 = acc1.reshape(b, nkv, t, g, d)
    m1 = m1.reshape(b, nkv, t, g, 1)
    l1 = l1.reshape(b, nkv, t, g, 1)

    # ---- in-chunk causal part (XLA) ------------------------------------
    qg = q.reshape(b, t, nkv, g, d).astype(jnp.float32)
    kc = k_chunk.astype(jnp.float32)
    vc = v_chunk.astype(jnp.float32)
    s2 = jnp.einsum("btkgd,bukd->bktgu", qg, kc) * scale  # [B,NKV,T,G,T]
    row = jnp.arange(t, dtype=jnp.int32)
    causal = row[None, :, None] >= row[None, None, :]      # [1, T, T] q>=k
    if window is not None:
        # same-position offsets: q at row r, key at row u — in-window iff
        # u > r - window (positions share the prefix offset)
        causal = causal & (row[None, None, :] > row[None, :, None] - window)
    keymask = write_mask[:, None, :]                       # [B, 1, T]
    mask = causal & keymask                                # [B, T, T]
    s2 = jnp.where(mask[:, None, :, None, :], s2, NEG_INF)
    m2 = jnp.max(s2, axis=-1, keepdims=True)               # [B,NKV,T,G,1]
    p2 = jnp.exp(s2 - m2)
    l2 = jnp.sum(p2, axis=-1, keepdims=True)
    acc2 = jnp.einsum("bktgu,bukd->bktgd", p2, vc)

    # ---- merge ----------------------------------------------------------
    m_tot = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m_tot)
    a2 = jnp.exp(m2 - m_tot)
    l_tot = l1 * a1 + l2 * a2
    out = (acc1 * a1 + acc2 * a2) / jnp.maximum(l_tot, 1e-30)
    # [B, NKV, T, G, D] -> [B, T, NH, D]
    out = out.transpose(0, 2, 1, 3, 4).reshape(b, t, nh, d)
    return out.astype(q.dtype)


def decode_attention_deferred_xla(q, k_new, v_new, k_pages, v_pages,
                                  block_tables, prefix_lens, scale: float,
                                  k_scale=None, v_scale=None, window=None,
                                  pending=None, layer=None):
    """XLA reference for the deferred decode path (gather-based).

    Supports int8 KV pages via per-(block, head, token) scales, the
    multi-step lookahead buffer (`pending`, page-shaped [B, NKV, J, D]
    per layer), and
    stacked [L, ...] pools via `layer` (fused into the gather indices —
    never a materialized per-layer pool slice)."""
    from ..models.common import gather_pages

    b, nh, d = q.shape
    nb, nkv, bs, _ = k_pages.shape[1:] if layer is not None \
        else k_pages.shape
    mb = block_tables.shape[1]
    ctx = mb * bs
    g = nh // nkv
    k = gather_pages(k_pages, block_tables, k_scale, layer=layer)
    v = gather_pages(v_pages, block_tables, v_scale, layer=layer)
    extra = 1
    if pending is not None:
        k_buf, v_buf, count = pending[0], pending[1], pending[2]
        if len(pending) == 5:
            # int8 lookahead buffer: dequantize with the per-(step,
            # seq, head) scales before joining the context
            k_buf = (k_buf.astype(jnp.float32)
                     * pending[3][..., None]).astype(k.dtype)
            v_buf = (v_buf.astype(jnp.float32)
                     * pending[4][..., None]).astype(v.dtype)
        j = k_buf.shape[2]                                 # [B, NKV, J, D]
        extra += j
        k = jnp.concatenate([k, k_buf.astype(k.dtype)], axis=2)
        v = jnp.concatenate([v, v_buf.astype(v.dtype)], axis=2)
    k = jnp.concatenate([k, k_new[:, :, None, :].astype(k.dtype)], axis=2)
    v = jnp.concatenate([v, v_new[:, :, None, :].astype(v.dtype)], axis=2)
    qg = q.reshape(b, nkv, g, d)
    s = jnp.einsum("bkgd,bkcd->bkgc", qg.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    pos = jnp.arange(ctx + extra, dtype=jnp.int32)[None, :]
    self_col = ctx + extra - 1
    valid = (pos < prefix_lens[:, None]) | (pos == self_col)
    if pending is not None:
        # buffer rows j < count are earlier tokens of this fused call
        valid |= (pos >= ctx) & (pos < ctx + count)
    if window is not None:
        # the query's TRUE position is prefix + count (the lookahead
        # buffer). Every key is window-tested at its true position:
        # cache col c sits at c, pending col c at prefix + (c - ctx),
        # and the self key at qpos (always in-window).
        qpos = prefix_lens
        if pending is not None:
            qpos = prefix_lens + pending[2]
        true_pos = jnp.where(pos < ctx, pos,
                             prefix_lens[:, None] + (pos - ctx))
        true_pos = jnp.where(pos == self_col, qpos[:, None], true_pos)
        valid &= true_pos > qpos[:, None] - window
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgc,bkcd->bkgd", p, v.astype(jnp.float32))
    return out.reshape(b, nh, d).astype(q.dtype)
