"""Activation-aware INT4 group quantization (AWQ-style calibration).

BASELINE config #4 names "INT4 AWQ-style" quantization; the reference
only passes `--quantization` through to vLLM (reference:
benchmark-vllm/vllm_templates.py:75-76), whose AWQ path consumes
checkpoints calibrated by the method of arXiv:2306.00978. Round 2
measured plain round-to-nearest int4 g128 at +14.2% relative ppl on the
toy protocol — two orders outside the <=0.1 budget. This module adds the
two activation-aware pieces that close that gap, reimplemented for the
stacked-layer JAX layout (public method, no reference code involved):

1. **Per-channel scale search**: weight rows whose input channels see
   large activations are scaled UP before quantization (finer effective
   grid where it matters), compensated EXACTLY by folding the inverse
   scale into the producer op — the preceding RMSNorm weight for
   wq/wk/wv, wg/wu and lm_head; the previous projection's output
   channels for wo (folded into wv) and wd (folded into wu). Zero
   runtime cost and bit-exact in fp: the fold is a linear identity.
2. **Per-(group, out-channel) clip search**: each group's scale is
   shrunk to minimize the activation-weighted reconstruction error
   sum_i E[x_i^2] * (W - Q(W))_i^2 (diagonal approximation of
   E||x(W - Q(W))||^2) instead of covering the worst-case |w|.

GQA note: wo's input channels are attention outputs; scaling them means
scaling wv's OUTPUT channels, which are shared by the whole query-head
group — the searched scale is therefore tied per (kv_head, head_dim)
position (geometric mean over the group's heads).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..loader.hf import ModelConfig
from .linear import QuantizedWeight
from .quant import pack_int4


# ------------------------------------------------------------- calibration

def collect_calibration(params, cfg: ModelConfig, tokens: Sequence[int],
                        seq_len: int = 128, n_rows: int = 256) -> Dict:
    """Run the fp llama-family forward over calibration sequences and
    sample input-activation rows for every quantized projection.

    Returns {"attn_in": [L, N, H], "attn_out": [L, N, nh*d],
             "mlp_in": [L, N, H], "mlp_mid": [L, N, I], "final": [N, H]}
    (numpy float32). The forward here is a plain full-attention
    re-implementation (no paging) — calibration runs once, offline.
    """
    from ..models.common import apply_rope, rms_norm, rope_cos_sin

    toks = np.asarray(tokens, dtype=np.int32)
    n_seq = max(len(toks) // seq_len, 1)
    toks = toks[:n_seq * seq_len].reshape(n_seq, -1)
    S, T = toks.shape
    rows = S * T
    sel = np.linspace(0, rows - 1, min(n_rows, rows)).astype(np.int32)

    L = cfg.num_layers
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = nh // nkv
    lay = params["layers"]

    def lw(name, li):
        return jnp.asarray(lay[name][li], jnp.float32)

    x = jnp.asarray(params["embed"], jnp.float32)[toks]      # [S, T, H]
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (S, T))
    cos, sin = rope_cos_sin(positions, d, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((T, T), bool))
    if cfg.sliding_window is not None:
        r = jnp.arange(T)
        causal &= r[None, :] > r[:, None] - cfg.sliding_window

    def sample(a):
        return np.asarray(a.reshape(rows, -1)[sel], np.float32)

    stats = {"attn_in": [], "attn_out": [], "mlp_in": [], "mlp_mid": []}
    scale = 1.0 / math.sqrt(d)
    for li in range(L):
        h1 = rms_norm(x, lw("attn_norm", li), cfg.rms_norm_eps)
        stats["attn_in"].append(sample(h1))
        q = (h1 @ lw("wq", li)).reshape(S, T, nh, d)
        k = (h1 @ lw("wk", li)).reshape(S, T, nkv, d)
        v = (h1 @ lw("wv", li)).reshape(S, T, nkv, d)
        if "bq" in lay:
            q = q + lw("bq", li).reshape(nh, d)
            k = k + lw("bk", li).reshape(nkv, d)
            v = v + lw("bv", li).reshape(nkv, d)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        qg = q.reshape(S, T, nkv, g, d)
        s = jnp.einsum("stkgd,sukd->skgtu", qg, k) * scale
        s = jnp.where(causal[None, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        ao = jnp.einsum("skgtu,sukd->stkgd", p, v).reshape(S, T, nh * d)
        stats["attn_out"].append(sample(ao))
        x = x + ao @ lw("wo", li)
        h2 = rms_norm(x, lw("mlp_norm", li), cfg.rms_norm_eps)
        stats["mlp_in"].append(sample(h2))
        mid = (jax.nn.silu(h2 @ lw("wg", li)) * (h2 @ lw("wu", li)))
        stats["mlp_mid"].append(sample(mid))
        x = x + mid @ lw("wd", li)
    final = rms_norm(x, jnp.asarray(params["final_norm"], jnp.float32),
                     cfg.rms_norm_eps)
    return {**{k: np.stack(v) for k, v in stats.items()},
            "final": sample(final)}


# ----------------------------------------------------- quantization pieces

def _quantize_group_clipped(w: jnp.ndarray, g: int, ex2: jnp.ndarray,
                            clip_grid: Sequence[float]):
    """Int4 group quantization with activation-weighted clip search.

    w: [in, out]; ex2: [in] per-input-channel E[x^2]. For each
    (group, out) pair pick the clip factor minimizing
    sum_i ex2[i] * (w - deq(q))^2. Returns (q int8 [-8, 7], scales
    [ng, out]).
    """
    in_dim, out = w.shape
    ng = in_dim // g
    wg = w.reshape(ng, g, out)
    e = ex2.reshape(ng, g, 1)
    amax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)        # [ng, 1, out]
    best_err = None
    best_s = None
    for c in clip_grid:
        s = jnp.maximum(amax * (c / 7.0), 1e-8)
        q = jnp.clip(jnp.round(wg / s), -8, 7)
        err = jnp.sum(e * (wg - q * s) ** 2, axis=1)          # [ng, out]
        if best_err is None:
            best_err, best_s = err, s[:, 0, :]
        else:
            pick = err < best_err
            best_err = jnp.where(pick, err, best_err)
            best_s = jnp.where(pick, s[:, 0, :], best_s)
    s = best_s[:, None, :]                                    # [ng, 1, out]
    q = jnp.clip(jnp.round(wg / s), -8, 7).astype(jnp.int8)
    return q.reshape(in_dim, out), best_s


def _search_awq_scale(X: jnp.ndarray, ws: List[jnp.ndarray], g: int,
                      n_grid: int = 11,
                      tie: Optional[tuple] = None) -> jnp.ndarray:
    """AWQ per-input-channel scale search for a producer/consumer set.

    X: [N, in] calibration rows; ws: consumer weights [in, out_k] sharing
    that input. Grid over alpha in [0, 1]: s = (mean|x|)^alpha,
    normalized to geomean 1; pick the alpha minimizing the summed true
    reconstruction error ||X W - (X/s) Q(W*s)||^2 across consumers.
    tie=(groups, per): constrain s to be constant within tied channel
    blocks (GQA head groups), by geometric mean.
    """
    sx = jnp.mean(jnp.abs(X), axis=0) + 1e-8                  # [in]
    ex2 = jnp.mean(X * X, axis=0) + 1e-12
    best_err, best_s = None, None
    for a in np.linspace(0.0, 1.0, n_grid):
        s = sx ** float(a)
        if tie is not None:
            nkv, gh, d = tie
            s = jnp.exp(jnp.mean(jnp.log(s.reshape(nkv, gh, d)),
                                 axis=1, keepdims=True))
            s = jnp.broadcast_to(s, (nkv, gh, d)).reshape(-1)
        s = s / jnp.exp(jnp.mean(jnp.log(s)))                 # geomean 1
        err = 0.0
        for w in ws:
            ws_scaled = w * s[:, None]
            q, sc = _quantize_group_clipped(ws_scaled, g, ex2 / (s * s),
                                            (1.0,))
            deq = (q.astype(jnp.float32).reshape(-1, g, w.shape[1])
                   * sc[:, None, :]).reshape(w.shape) / s[:, None]
            err += jnp.sum((X @ (w - deq)) ** 2)
        err = float(err)
        if best_err is None or err < best_err:
            best_err, best_s = err, s
    return best_s


CLIP_GRID = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7)


def _gptq_round(W, X, g: int, ex2, clip_grid=CLIP_GRID,
                act_order: bool = True):
    """Error-compensated sequential rounding (GPTQ, arXiv:2210.17323).

    Quantize input-dim rows of W [in, out]; after rounding a row, the
    not-yet-quantized rows absorb the rounding error weighted by the
    inverse-Hessian column (H = X^T X from calibration rows) — the
    off-diagonal compensation a per-row RTN can't do.

    act_order=True (round-4 default) processes rows in DESCENDING
    diag(H) order — the published desc_act fix for exactly the
    high-curvature-rows-rounded-late failure mode — using GPTQ's
    "static groups" form: group scales are precomputed on the ORIGINAL
    contiguous groups (activation-weighted clip search on the
    uncompensated weights), so storage and the inference kernels keep
    the plain [in/g, out] contiguous-group layout (no g_idx indirection
    at runtime); only the rounding/compensation ORDER is permuted.
    Returns (q int8 [-8, 7] [in, out], scales [in/g, out] f32).
    """
    W = np.array(W, np.float64)
    X = np.asarray(X, np.float64)
    in_dim, out = W.shape
    H = X.T @ X
    damp = 0.01 * float(np.mean(np.diag(H))) + 1e-8
    H[np.diag_indices(in_dim)] += damp

    # static group scales on the original contiguous groups
    S = np.zeros((in_dim // g, out), np.float64)
    for gi in range(in_dim // g):
        _, sg = _quantize_group_clipped(
            jnp.asarray(W[gi * g:(gi + 1) * g], jnp.float32), g,
            jnp.asarray(ex2[gi * g:(gi + 1) * g], jnp.float32), clip_grid)
        S[gi] = np.asarray(sg, np.float64)[0]

    if act_order:
        perm = np.argsort(-np.diag(H), kind="stable")
    else:
        perm = np.arange(in_dim)
    Wp = W[perm]
    Hp = H[np.ix_(perm, perm)]
    Hinv = np.linalg.inv(Hp)
    U = np.linalg.cholesky(Hinv).T          # upper: Hinv = U^T U
    Q = np.zeros((in_dim, out), np.int8)
    for i in range(in_dim):
        row = perm[i]
        s = S[row // g]
        q = np.clip(np.round(Wp[i] / s), -8, 7)
        Q[row] = q.astype(np.int8)
        err = (Wp[i] - q * s) / U[i, i]
        if i + 1 < in_dim:
            Wp[i + 1:] -= np.outer(U[i, i + 1:], err)
    return Q, S.astype(np.float32)


def awq_quantize_llama(params, cfg: ModelConfig, tokens: Sequence[int],
                       group_size: int = 128, seq_len: int = 128,
                       n_rows: int = 1024, n_grid: int = 11,
                       quantize: bool = True, gptq: bool = True,
                       quantize_lm_head: bool = False):
    """Activation-aware int4 quantization of a llama-family param pytree.

    Pipeline: AWQ per-channel scale search (folded into producers,
    exact) -> per-group activation-weighted clip search -> GPTQ
    error-compensated rounding (gptq=True). lm_head stays unquantized by
    default, matching published AWQ checkpoints (vLLM's AWQ loader
    quantizes only the decoder-layer projections). With quantize=False
    returns the scale-folded FP params unquantized — they must produce
    bit-identical logits (the fold-exactness test).
    """
    if cfg.arch not in ("llama", "qwen2"):
        raise ValueError(f"AWQ calibration implemented for llama-family, "
                         f"got {cfg.arch}")
    stats = collect_calibration(params, cfg, tokens, seq_len=seq_len,
                                n_rows=n_rows)
    lay = {k: np.asarray(v, np.float32) if not hasattr(v, "kind") else v
           for k, v in params["layers"].items()}
    L = cfg.num_layers
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    gq = group_size

    new_lay = {k: np.array(v, np.float32) for k, v in lay.items()}
    out_q = {k: [] for k in ("wq", "wk", "wv", "wo", "wg", "wu", "wd")}
    out_s = {k: [] for k in out_q}

    def q_append(name, w, ex2, X):
        if not quantize:
            new_lay[name][li] = np.asarray(w, np.float32)
            return
        g = min(gq, w.shape[0])
        if gptq:
            q, sc = _gptq_round(np.asarray(w, np.float64), X, g,
                                np.asarray(ex2))
        else:
            q, sc = _quantize_group_clipped(
                jnp.asarray(w), g, jnp.asarray(ex2), CLIP_GRID)
        out_q[name].append(np.asarray(q))
        out_s[name].append(np.asarray(sc))

    for li in range(L):
        Xa = jnp.asarray(stats["attn_in"][li])
        Xo = jnp.asarray(stats["attn_out"][li])
        Xm = jnp.asarray(stats["mlp_in"][li])
        Xd = jnp.asarray(stats["mlp_mid"][li])
        wq, wk, wv, wo = (jnp.asarray(lay[n][li])
                          for n in ("wq", "wk", "wv", "wo"))
        wg, wu, wd = (jnp.asarray(lay[n][li]) for n in ("wg", "wu", "wd"))

        # qkv: fold into attn_norm
        s_qkv = _search_awq_scale(Xa, [wq, wk, wv], gq, n_grid)
        new_lay["attn_norm"][li] = np.asarray(
            lay["attn_norm"][li] / np.asarray(s_qkv), np.float32)
        # wo: scale tied per (kv_head, dim) position, folded into wv's
        # output channels (v passes linearly through attention)
        s_o = _search_awq_scale(Xo, [wo], gq, n_grid, tie=(nkv, nh // nkv, d))
        s_o_v = np.asarray(s_o).reshape(nkv, nh // nkv, d)[:, 0].reshape(-1)
        # wd: folded into wu's output channels (silu(g) * (u/s) = mid/s)
        s_d = _search_awq_scale(Xd, [wd], gq, n_grid)
        # gate/up: fold into mlp_norm
        s_gu = _search_awq_scale(Xm, [wg, wu], gq, n_grid)
        new_lay["mlp_norm"][li] = np.asarray(
            lay["mlp_norm"][li] / np.asarray(s_gu), np.float32)

        ex2_a = np.asarray(jnp.mean(Xa * Xa, axis=0) / (s_qkv * s_qkv))
        ex2_o = np.asarray(jnp.mean(Xo * Xo, axis=0) / (s_o * s_o))
        ex2_m = np.asarray(jnp.mean(Xm * Xm, axis=0) / (s_gu * s_gu))
        ex2_d = np.asarray(jnp.mean(Xd * Xd, axis=0) / (s_d * s_d))
        Xa_s = np.asarray(Xa / s_qkv[None, :])
        Xo_s = np.asarray(Xo / s_o[None, :])
        Xm_s = np.asarray(Xm / s_gu[None, :])
        Xd_s = np.asarray(Xd / s_d[None, :])

        q_append("wq", wq * s_qkv[:, None], ex2_a, Xa_s)
        q_append("wk", wk * s_qkv[:, None], ex2_a, Xa_s)
        q_append("wv", (wv * s_qkv[:, None]) / jnp.asarray(s_o_v)[None, :],
                 ex2_a, Xa_s)
        if "bv" in lay:
            new_lay["bv"][li] = np.asarray(
                lay["bv"][li] / s_o_v, np.float32)
        q_append("wo", wo * s_o[:, None], ex2_o, Xo_s)
        q_append("wg", wg * s_gu[:, None], ex2_m, Xm_s)
        q_append("wu", (wu * s_gu[:, None]) / s_d[None, :], ex2_m, Xm_s)
        q_append("wd", wd * s_d[:, None], ex2_d, Xd_s)

    out = {"embed": params["embed"],
           "final_norm": jnp.asarray(params["final_norm"]),
           "lm_head": params["lm_head"]}
    lm = jnp.asarray(np.asarray(params["lm_head"], np.float32))
    if quantize_lm_head:
        Xf = jnp.asarray(stats["final"])
        s_f = _search_awq_scale(Xf, [lm], gq, n_grid)
        out["final_norm"] = jnp.asarray(np.asarray(
            np.asarray(params["final_norm"], np.float32)
            / np.asarray(s_f), np.float32))
        ex2_f = np.asarray(jnp.mean(Xf * Xf, axis=0) / (s_f * s_f))
        if not quantize:
            out["layers"] = {k: jnp.asarray(v) for k, v in new_lay.items()}
            out["lm_head"] = jnp.asarray(np.asarray(lm * s_f[:, None]))
            return out
        glm = min(gq, lm.shape[0])
        if gptq:
            lmq, lms = _gptq_round(
                np.asarray(lm * s_f[:, None], np.float64),
                np.asarray(Xf / s_f[None, :]), glm, ex2_f)
        else:
            lmq, lms = _quantize_group_clipped(
                lm * s_f[:, None], glm, jnp.asarray(ex2_f), CLIP_GRID)
        out["lm_head"] = QuantizedWeight(
            "int4", jnp.asarray(pack_int4(np.asarray(lmq))),
            jnp.asarray(lms), glm)
    elif not quantize:
        out["layers"] = {k: jnp.asarray(v) for k, v in new_lay.items()}
        return out
    layers = {}
    for k, v in new_lay.items():
        if k in out_q and out_q[k]:
            qs = np.stack(out_q[k])                   # [L, in, out]
            ss = np.stack(out_s[k])                   # [L, ng, out]
            layers[k] = QuantizedWeight(
                "int4", jnp.asarray(pack_int4(qs)), jnp.asarray(ss),
                min(gq, qs.shape[1]))
        else:
            layers[k] = jnp.asarray(v, dtype=np.asarray(lay[k]).dtype)
    out["layers"] = layers
    return out
