"""Pallas prefix-attention kernel + deferred decode merge vs XLA reference
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_backend_public_tpu.models.common import paged_attention_xla
from vllm_backend_public_tpu.ops.attention import (
    decode_attention_deferred, decode_attention_deferred_xla,
    paged_prefix_attention)


def make_case(B, MB, BS, NB, nh, nkv, d, prefix_lens, seed=0,
              dtype=jnp.float32):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    q = jax.random.normal(k1, (B, nh, d), dtype=dtype)
    k_new = jax.random.normal(k5, (B, nkv, d), dtype=dtype)
    v_new = jax.random.normal(k6, (B, nkv, d), dtype=dtype)
    k_pages = jax.random.normal(k2, (NB, nkv, BS, d), dtype=dtype)
    v_pages = jax.random.normal(k3, (NB, nkv, BS, d), dtype=dtype)
    bt = jax.random.permutation(k4, jnp.arange(1, NB))[:B * MB]
    bt = bt.reshape(B, MB).astype(jnp.int32)
    pl_ = jnp.asarray(prefix_lens, dtype=jnp.int32)
    return q, k_new, v_new, k_pages, v_pages, bt, pl_


@pytest.mark.parametrize("nh,nkv,d", [(8, 8, 64), (8, 2, 64), (4, 4, 128)])
def test_deferred_decode_matches_write_then_gather(nh, nkv, d):
    """Pallas deferred (interpret) == XLA deferred == old write-then-gather."""
    B, MB, BS, NB = 4, 4, 16, 32
    prefix = [7, BS * 2, BS * MB - 1, 0]
    q, k_new, v_new, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, prefix)
    scale = 1.0 / np.sqrt(d)

    ref = decode_attention_deferred_xla(q, k_new, v_new, k_pages, v_pages,
                                        bt, pl_, scale)

    # write-then-gather cross-check: manually write the new token and run
    # the classic gather attention (needs a free slot -> prefix < MB*BS)
    from vllm_backend_public_tpu.models.common import (
        slot_ids_from_positions, write_kv_layer)
    positions = pl_[:, None]
    slot_ids = slot_ids_from_positions(bt, positions, BS)
    wk, wv = write_kv_layer((k_pages, v_pages), k_new[:, None],
                            v_new[:, None], slot_ids,
                            jnp.ones((B, 1), bool))
    old = paged_attention_xla(q[:, None], wk, wv, bt, pl_ + 1, positions,
                              scale)[:, 0]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(old),
                               rtol=2e-5, atol=2e-5)

    out = decode_attention_deferred(q, k_new, v_new, k_pages, v_pages, bt,
                                    pl_, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_deferred_decode_int8_kv_in_kernel():
    """int8-KV dequant inside the Pallas kernel == XLA dequant-gather."""
    from vllm_backend_public_tpu.models.common import quantize_kv

    B, MB, BS, NB, nh, nkv, d = 4, 4, 16, 32, 8, 2, 64
    prefix = [7, BS * 2, BS * MB - 1, 0]
    q, k_new, v_new, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, prefix, seed=3)
    scale = 1.0 / np.sqrt(d)
    # quantize pages per-(page, head, token): [NB, NKV, BS, D] -> int8+scales
    kq, ks = quantize_kv(k_pages)
    vq, vs = quantize_kv(v_pages)

    ref = decode_attention_deferred_xla(q, k_new, v_new, kq, vq, bt, pl_,
                                        scale, k_scale=ks, v_scale=vs)
    out = decode_attention_deferred(q, k_new, v_new, kq, vq, bt, pl_,
                                    scale, interpret=True,
                                    k_scale=ks, v_scale=vs)
    # the kernel runs the int8 path's matmuls in bf16 (q and softmax
    # weights rounded; the XLA reference stays f32) — tolerance is bf16
    # epsilon, while end-to-end accuracy is governed by the ppl harness
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_prefix_kernel_unnormalized_state():
    """acc/l at running max m reconstructs softmax attention over prefix."""
    B, MB, BS, NB, nh, nkv, d = 2, 2, 16, 8, 4, 2, 64
    q, _, _, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, [20, 31], seed=1)
    scale = 1.0 / np.sqrt(d)
    acc, m, l = paged_prefix_attention(q, k_pages, v_pages, bt, pl_, scale,
                                       interpret=True)
    out = np.asarray(acc / l)
    # reference: plain softmax over the gathered prefix
    B_, nh_, d_ = out.shape
    g = nh // nkv
    ctx = MB * BS
    k = np.asarray(k_pages)[np.asarray(bt)].transpose(0, 2, 1, 3, 4)
    k = k.reshape(B, nkv, ctx, d)
    v = np.asarray(v_pages)[np.asarray(bt)].transpose(0, 2, 1, 3, 4)
    v = v.reshape(B, nkv, ctx, d)
    qg = np.asarray(q).reshape(B, nkv, g, d)
    s = np.einsum("bkgd,bkcd->bkgc", qg, k) * scale
    mask = np.arange(ctx)[None, :] < np.asarray(pl_)[:, None]
    s = np.where(mask[:, None, None, :], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bkgc,bkcd->bkgd", p, v).reshape(B, nh, d)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_deferred_bf16():
    B, MB, BS, NB, nh, nkv, d = 2, 2, 16, 8, 4, 2, 128
    q, k_new, v_new, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, [20, 31], seed=2, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)
    ref = decode_attention_deferred_xla(q, k_new, v_new, k_pages, v_pages,
                                        bt, pl_, scale)
    out = decode_attention_deferred(q, k_new, v_new, k_pages, v_pages, bt,
                                    pl_, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_chunk_prefill_deferred_matches_write_then_gather():
    """Deferred chunked-prefill (prefix kernel + in-chunk causal + merge)
    == classic write-then-gather attention."""
    from vllm_backend_public_tpu.ops.attention import (
        chunk_prefill_attention_deferred)
    from vllm_backend_public_tpu.models.common import (
        slot_ids_from_positions, write_kv_layer)

    B, T, MB, BS, NB, nh, nkv, d = 2, 8, 4, 16, 32, 8, 2, 64
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, T, nh, d), dtype=jnp.float32)
    kc = jax.random.normal(ks[1], (B, T, nkv, d), dtype=jnp.float32)
    vc = jax.random.normal(ks[2], (B, T, nkv, d), dtype=jnp.float32)
    k_pages = jax.random.normal(ks[3], (NB, nkv, BS, d), dtype=jnp.float32)
    v_pages = jax.random.normal(ks[4], (NB, nkv, BS, d), dtype=jnp.float32)
    bt = jax.random.permutation(ks[5], jnp.arange(1, NB))[:B * MB]
    bt = bt.reshape(B, MB).astype(jnp.int32)
    prefix = jnp.array([13, 0], dtype=jnp.int32)  # incl. empty prefix
    # second seq has only 5 real tokens in the chunk
    wmask = jnp.array([[True] * T, [True] * 5 + [False] * 3])
    positions = prefix[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    scale = 1.0 / np.sqrt(d)

    # reference: write chunk into pages, classic gather attention
    slots = slot_ids_from_positions(bt, positions, BS)
    wk, wv = write_kv_layer((k_pages, v_pages), kc, vc, slots, wmask)
    kv_lens = prefix + jnp.sum(wmask, axis=1)
    ref = paged_attention_xla(q, wk, wv, bt, kv_lens, positions, scale)

    for use_kernel in (False, True):
        out = chunk_prefill_attention_deferred(
            q, kc, vc, k_pages, v_pages, bt, prefix, wmask, scale,
            interpret=True, use_kernel=use_kernel)
        # compare only real (unmasked) rows
        for b in range(B):
            n = int(jnp.sum(wmask[b]))
            np.testing.assert_allclose(
                np.asarray(out)[b, :n], np.asarray(ref)[b, :n],
                rtol=3e-5, atol=3e-5,
                err_msg=f"use_kernel={use_kernel} b={b}")


def test_stacked_layer_prefix_attention_matches_flat():
    """paged_prefix_attention(layer=li) over stacked [L, ...] pages ==
    the flat call on that layer's pages (zero-copy decode path)."""
    B, MB, BS, NB, L = 4, 4, 16, 32, 3
    nh, nkv, d = 8, 2, 64
    prefix = [7, BS * 2, BS * MB - 1, 5]
    key = jax.random.PRNGKey(9)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, nh, d), dtype=jnp.float32)
    Ks = jax.random.normal(k2, (L, NB, nkv, BS, d), dtype=jnp.float32)
    Vs = jax.random.normal(k3, (L, NB, nkv, BS, d), dtype=jnp.float32)
    bt = jax.random.permutation(k4, jnp.arange(1, NB))[:B * MB]
    bt = bt.reshape(B, MB).astype(jnp.int32)
    pl_ = jnp.asarray(prefix, dtype=jnp.int32)
    scale = 1.0 / np.sqrt(d)

    for li in (0, L - 1):
        ref = paged_prefix_attention(q, Ks[li], Vs[li], bt, pl_, scale,
                                     interpret=True)
        out = paged_prefix_attention(q, Ks, Vs, bt, pl_, scale,
                                     interpret=True, layer=jnp.int32(li))
        for r, o in zip(ref, out):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-5, atol=1e-5)


def test_stacked_layer_prefix_attention_int8_kv():
    """Stacked + quantized pages: in-kernel dequant with layer indexing."""
    from vllm_backend_public_tpu.models.common import quantize_kv
    B, MB, BS, NB, L = 2, 2, 16, 16, 2
    nh, nkv, d = 4, 2, 64
    key = jax.random.PRNGKey(10)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, nh, d), dtype=jnp.float32)
    Kf = jax.random.normal(k2, (L, NB, nkv, BS, d), dtype=jnp.float32)
    Vf = jax.random.normal(k3, (L, NB, nkv, BS, d), dtype=jnp.float32)
    Kq, Ks = quantize_kv(Kf)
    Vq, Vs = quantize_kv(Vf)
    bt = jax.random.permutation(k4, jnp.arange(1, NB))[:B * MB]
    bt = bt.reshape(B, MB).astype(jnp.int32)
    pl_ = jnp.asarray([7, BS + 3], dtype=jnp.int32)
    scale = 1.0 / np.sqrt(d)

    li = 1
    ref = paged_prefix_attention(q, Kq[li], Vq[li], bt, pl_, scale,
                                 interpret=True, k_scale=Ks[li],
                                 v_scale=Vs[li])
    out = paged_prefix_attention(q, Kq, Vq, bt, pl_, scale,
                                 interpret=True, k_scale=Ks, v_scale=Vs,
                                 layer=jnp.int32(li))
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("count", [0, 1, 3])
@pytest.mark.parametrize("quant", [False, True])
def test_deferred_decode_pending_in_kernel(count, quant):
    """Lookahead-buffer merge INSIDE the Pallas kernel (pending_kv +
    finalize) == XLA reference. Covers count=0 (first fused step: every
    pending slot masked — the kernel must guard against the finite
    NEG_INF mask value becoming the running max)."""
    from vllm_backend_public_tpu.models.common import quantize_kv

    B, MB, BS, NB, nh, nkv, d, K = 4, 4, 16, 32, 8, 2, 64, 4
    prefix = [7, BS * 2, BS * MB - 1 - K, 0]
    q, k_new, v_new, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, prefix, seed=11)
    key = jax.random.PRNGKey(42)
    kb = jax.random.normal(key, (B, nkv, K, d), dtype=jnp.float32)
    vb = jax.random.normal(jax.random.split(key)[0], (B, nkv, K, d),
                           dtype=jnp.float32)
    scale = 1.0 / np.sqrt(d)
    ks = vs = None
    if quant:
        k_pages, ks = quantize_kv(k_pages)
        v_pages, vs = quantize_kv(v_pages)
    pending = (kb, vb, jnp.int32(count))

    ref = decode_attention_deferred_xla(
        q, k_new, v_new, k_pages, v_pages, bt, pl_, scale,
        k_scale=ks, v_scale=vs, pending=pending)
    out = decode_attention_deferred(
        q, k_new, v_new, k_pages, v_pages, bt, pl_, scale,
        interpret=True, k_scale=ks, v_scale=vs, pending=pending)
    tol = 2e-2 if quant else 2e-5
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("count", [0, 2, 6])
def test_deferred_decode_pending_window_in_kernel(count):
    """Pending merge + sliding window: pending tokens below the window
    are masked by their TRUE position (prefix + slot), in both the
    kernel and the XLA reference."""
    B, MB, BS, NB, nh, nkv, d, K = 2, 4, 16, 16, 4, 2, 64, 8
    window = 5  # < count at count=6: some pending slots fall out
    prefix = [20, 37]
    q, k_new, v_new, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, prefix, seed=12)
    key = jax.random.PRNGKey(7)
    kb = jax.random.normal(key, (B, nkv, K, d), dtype=jnp.float32)
    vb = jax.random.normal(jax.random.split(key)[0], (B, nkv, K, d),
                           dtype=jnp.float32)
    scale = 1.0 / np.sqrt(d)
    pending = (kb, vb, jnp.int32(count))

    ref = decode_attention_deferred_xla(
        q, k_new, v_new, k_pages, v_pages, bt, pl_, scale,
        window=window, pending=pending)
    out = decode_attention_deferred(
        q, k_new, v_new, k_pages, v_pages, bt, pl_, scale,
        interpret=True, window=window, pending=pending)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# round 5: deep-queue manual-DMA decode kernel (ops/attention.py
# _prefix_kernel_manual). The contract is bit-equality with the auto
# (Mosaic-pipelined) kernel on every decode feature combination — the two
# kernels share the head-concat math but schedule page fetches themselves.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", ["basic", "int8", "pending", "window",
                                  "stacked_int8_pending"])
def test_manual_dma_kernel_matches_auto(case):
    from vllm_backend_public_tpu.models.common import quantize_kv

    B, MB, BS, NB, nh, nkv, d = 4, 4, 16, 32, 8, 8, 64
    # edge prefixes: sub-page, page-aligned, full table, EMPTY (0)
    prefix = [7, BS * 2, BS * MB - 1, 0]
    q, k_new, v_new, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, prefix, seed=11)
    scale = 1.0 / np.sqrt(d)
    kw = {}
    if case == "int8":
        (k_pages, kw["k_scale"]), (v_pages, kw["v_scale"]) = (
            quantize_kv(k_pages), quantize_kv(v_pages))
    elif case == "pending":
        key = jax.random.PRNGKey(12)
        K = 8
        kb = jax.random.normal(key, (B, nkv, K, d), jnp.float32)
        vb = jax.random.normal(jax.random.fold_in(key, 1),
                               (B, nkv, K, d), jnp.float32)
        kw["pending"] = (kb, vb, jnp.int32(5))
    elif case == "window":
        kw["window"] = BS + 3
    elif case == "stacked_int8_pending":
        L, K = 3, 8
        key = jax.random.PRNGKey(13)
        kq = jax.random.randint(key, (L, NB, nkv, BS, d), -90, 90, jnp.int8)
        vq = jax.random.randint(jax.random.fold_in(key, 1),
                                (L, NB, nkv, BS, d), -90, 90, jnp.int8)
        kw["k_scale"] = jax.random.uniform(
            jax.random.fold_in(key, 2), (L, NB, nkv, BS), jnp.float32,
            0.01, 0.03)
        kw["v_scale"] = jax.random.uniform(
            jax.random.fold_in(key, 3), (L, NB, nkv, BS), jnp.float32,
            0.01, 0.03)
        k_pages, v_pages = kq, vq
        pkb = jax.random.normal(jax.random.fold_in(key, 4),
                                (L, K, B, nkv, d), jnp.float32)
        pvb = jax.random.normal(jax.random.fold_in(key, 5),
                                (L, K, B, nkv, d), jnp.float32)
        kw["pending"] = (pkb, pvb, jnp.int32(6))
        kw["layer"] = jnp.int32(1)

    auto = decode_attention_deferred(q, k_new, v_new, k_pages, v_pages,
                                     bt, pl_, scale, interpret=True,
                                     manual=False, **kw)
    man = decode_attention_deferred(q, k_new, v_new, k_pages, v_pages,
                                    bt, pl_, scale, interpret=True,
                                    manual=True, **kw)
    np.testing.assert_allclose(np.asarray(man, np.float32),
                               np.asarray(auto, np.float32),
                               rtol=1e-6, atol=1e-6)


def test_manual_dma_kernel_unnormalized_state_matches_auto():
    """(acc, m, l) triple equality, including rows with prefix 0."""
    B, MB, BS, NB, nh, nkv, d = 4, 2, 16, 16, 4, 4, 64
    q, _, _, k_pages, v_pages, bt, pl_ = make_case(
        B, MB, BS, NB, nh, nkv, d, [20, 31, 0, BS * 2], seed=14)
    scale = 1.0 / np.sqrt(d)
    a0 = paged_prefix_attention(q, k_pages, v_pages, bt, pl_, scale,
                                interpret=True, manual=False)
    a1 = paged_prefix_attention(q, k_pages, v_pages, bt, pl_, scale,
                                interpret=True, manual=True)
    for x, y, name in zip(a0, a1, ("acc", "m", "l")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6, err_msg=name)
