"""Batched on-device sampler (greedy / temperature / top-k / top-p / min-p,
presence / frequency / repetition penalties).

The reference delegates sampling entirely to vLLM's CUDA sampler; here it is
a single vectorized JAX function fused into the decode step. Per-slot
sampling parameters ride as [B] arrays so one compiled program serves any
mix of greedy and stochastic requests.

Determinism: token i of slot s is drawn from fold_in(fold_in(key(seed_s),
s_counter), so replays are reproducible per request regardless of batch
composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    presence: jax.Array, frequency: jax.Array,
                    repetition: jax.Array) -> jax.Array:
    """logits [B,V] fp32; counts [B,V] int32 (output-token occurrence counts);
    presence/frequency/repetition: [B]."""
    seen = counts > 0
    logits = logits - presence[:, None] * seen
    logits = logits - frequency[:, None] * counts
    rep = repetition[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, penalized, logits)
    return logits


TRUNC_WIDTH = 64  # candidate set for top-k/top-p truncation


def sample(logits: jax.Array, *, seeds: jax.Array, steps: jax.Array,
           temperature: jax.Array, top_k: jax.Array, top_p: jax.Array,
           min_p: jax.Array) -> jax.Array:
    """Sample one token per row.

    logits: [B, V] float32 (penalties already applied).
    seeds, steps: [B] int32 — per-slot PRNG derivation.
    temperature: [B] float32; 0.0 => greedy.
    top_k: [B] int32; 0 => disabled. top_p: [B] in (0,1]; min_p: [B] in [0,1).
    Returns [B] int32 token ids.

    Never sorts the vocab: greedy is argmax, pure temperature sampling is
    Gumbel-argmax over the full distribution (exact), top-k/top-p/min-p
    run inside a lax.top_k(TRUNC_WIDTH) candidate set using GLOBAL
    probabilities (exact whenever the candidate set covers the nucleus /
    k / min-p set — the overwhelmingly common case), and rows whose
    filter provably extends past the candidate set fall back to a
    full-vocab threshold binary search (lax.cond'd: no cost when no row
    needs it). Exact for every parameter combination.
    """
    b, v = logits.shape
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    def one_key(seed, step):
        return jax.random.fold_in(jax.random.PRNGKey(seed), step)

    keys = jax.vmap(one_key)(seeds, steps)
    gumbel = jax.vmap(
        lambda key: jax.random.gumbel(key, (v,), dtype=jnp.float32))(keys)

    # exact full-vocab temperature sampling (no truncation requested)
    full_tok = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    # truncated sampling within the top-W candidates, global normalizer
    w = min(TRUNC_WIDTH, v)
    logp = jax.nn.log_softmax(scaled, axis=-1)  # [B, V] global
    cand_logp, cand_idx = jax.lax.top_k(logp, w)  # descending
    ranks = jnp.arange(w, dtype=jnp.int32)[None, :]
    k = jnp.where(top_k <= 0, v, top_k)[:, None]
    mask = ranks < k
    probs = jnp.exp(cand_logp)  # global probabilities of the candidates
    cum = jnp.cumsum(probs, axis=-1)
    mask &= (cum - probs) < top_p[:, None]
    mask &= probs >= (min_p[:, None] * probs[:, 0:1])
    mask = mask.at[:, 0].set(True)  # always keep the argmax
    filtered = jnp.where(mask, cand_logp, NEG_INF)
    cand_gumbel = jnp.take_along_axis(gumbel, cand_idx, axis=-1)
    choice = jnp.argmax(filtered + cand_gumbel, axis=-1)
    trunc_tok = jnp.take_along_axis(
        cand_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

    truncated = (top_k > 0) | (top_p < 1.0) | (min_p > 0.0)

    # rows whose filter set provably extends past the W candidates:
    # nucleus mass not yet reached, k > W, or the last candidate still
    # passes min-p (so vocab tail might too)
    need_full = truncated & (temperature > 0.0) & (
        ((top_p < 1.0) & (cum[:, -1] < top_p))
        | (top_k > w)
        | ((min_p > 0.0) & (probs[:, -1] >= min_p * probs[:, 0])))

    def full_filtered(_):
        tok, _ = sample_full_filtered(logp, gumbel, top_k, top_p, min_p)
        return tok

    full_filtered_tok = jax.lax.cond(
        jnp.any(need_full), full_filtered,
        lambda _: trunc_tok, operand=None)

    sampled_tok = jnp.where(truncated,
                            jnp.where(need_full, full_filtered_tok,
                                      trunc_tok),
                            full_tok)
    return jnp.where(temperature <= 0.0, greedy_tok, sampled_tok)


def sample_full_filtered(logp: jax.Array, gumbel: jax.Array,
                         top_k: jax.Array, top_p: jax.Array,
                         min_p: jax.Array, iters: int = 24):
    """Exact sort-free top-k/top-p/min-p over the FULL vocab.

    Thresholds found by binary search on the log-probability axis:
    nucleus mass(t) = sum(p * [logp > t]) and count(t) = #[logp > t] are
    monotone in t, so ~24 halvings pin the boundary to float precision —
    the TPU answer to a 128k-entry sort. Returns (tokens [B], keep mask).
    """
    b, v = logp.shape
    lo0 = jnp.full((b,), -80.0, jnp.float32)
    hi0 = jnp.zeros((b,), jnp.float32)
    p = jnp.exp(logp)

    def body(_, carry):
        plo, phi, klo, khi = carry
        pmid = 0.5 * (plo + phi)
        kmid = 0.5 * (klo + khi)
        mass = jnp.sum(jnp.where(logp > pmid[:, None], p, 0.0), axis=-1)
        count = jnp.sum(logp > kmid[:, None], axis=-1)
        pok = mass >= top_p
        kok = count >= jnp.where(top_k <= 0, 1, top_k)
        plo = jnp.where(pok, pmid, plo)
        phi = jnp.where(pok, phi, pmid)
        klo = jnp.where(kok, kmid, klo)
        khi = jnp.where(kok, khi, kmid)
        return plo, phi, klo, khi

    plo, _, klo, _ = jax.lax.fori_loop(0, iters, body,
                                       (lo0, hi0, lo0, hi0))
    keep = jnp.ones_like(logp, bool)
    keep &= jnp.where((top_p < 1.0)[:, None], logp > plo[:, None], True)
    keep &= jnp.where((top_k > 0)[:, None], logp > klo[:, None], True)
    maxlp = jnp.max(logp, axis=-1, keepdims=True)
    keep &= jnp.where((min_p > 0.0)[:, None],
                      logp >= jnp.log(jnp.maximum(min_p, 1e-30))[:, None]
                      + maxlp, True)
    keep |= logp == maxlp  # always keep the argmax
    tok = jnp.argmax(jnp.where(keep, logp, NEG_INF) + gumbel,
                     axis=-1).astype(jnp.int32)
    return tok, keep


def speculative_verify(logits: jax.Array, drafts: jax.Array, *,
                       seeds: jax.Array, steps: jax.Array,
                       temperature: jax.Array, greedy_row: jax.Array,
                       spec_ok: jax.Array):
    """Per-row draft verification for speculative decoding.

    logits: [W, T, V] f32 (T = K+1 verify positions); drafts: [W, K].
    greedy_row [W] bool: argmax-match verification (bit-identical to
    plain greedy decode). Sampled rows (temperature > 0, no truncation
    filters): rejection sampling against the point-mass draft — accept
    d_i iff u_i < p_i(d_i) under the temperature-scaled target; on the
    first rejection the bonus distribution is the residual, which for a
    point-mass proposal is exactly the target with d_i's mass removed.
    The emitted marginal at every position equals plain temperature
    sampling EXACTLY (speculative-sampling correctness for degenerate
    proposals); see tests/test_spec_decode.py for the empirical check.
    spec_ok [W] False pins acc = 0 (row runs as plain decode).

    Acceptance uniforms derive from a salted fold of the per-request
    (seed, step) stream so they are independent of the sampler's Gumbel
    draw at the same step index.

    Returns (acc [W] int32, bonus_logits [W, V] — position-acc logits
    with the rejected draft masked for sampled rows).
    """
    K = drafts.shape[1]
    match_g = jnp.argmax(logits[:, :-1], axis=-1).astype(
        jnp.int32) == drafts
    temp = jnp.maximum(temperature, 1e-6)[:, None, None]
    scaled = logits[:, :-1] / temp                        # [W, K, V]
    lse = jax.scipy.special.logsumexp(scaled, axis=-1)
    d_logit = jnp.take_along_axis(scaled, drafts[..., None],
                                  axis=-1)[..., 0]
    p_draft = jnp.exp(d_logit - lse)                      # [W, K]

    def u_key(seed, step):
        return jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), step), 0x5bec)

    step_mat = steps[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    seeds_mat = jnp.broadcast_to(seeds[:, None], step_mat.shape)
    u = jax.vmap(jax.vmap(
        lambda s, t: jax.random.uniform(u_key(s, t))))(seeds_mat,
                                                       step_mat)
    match = jnp.where(greedy_row[:, None], match_g, u < p_draft)
    match &= spec_ok[:, None]
    acc = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)

    logits_acc = jnp.take_along_axis(
        logits, acc[:, None, None], axis=1)[:, 0]         # [W, V]
    rej_tok = jnp.take_along_axis(
        drafts, jnp.clip(acc, 0, K - 1)[:, None], axis=1)[:, 0]
    mask_rej = spec_ok & (~greedy_row) & (acc < K)
    vocab_ar = jnp.arange(logits.shape[-1], dtype=jnp.int32)[None, :]
    bonus_logits = jnp.where(
        mask_rej[:, None] & (vocab_ar == rej_tok[:, None]),
        NEG_INF, logits_acc)
    return acc, bonus_logits


def top_logprobs(logits: jax.Array, sampled: jax.Array, k: int):
    """Log-softmax + top-k for logprob reporting.

    Returns (sampled_logprob [B], topk_vals [B,k], topk_ids [B,k]).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    samp = jnp.take_along_axis(logp, sampled[:, None], axis=-1)[:, 0]
    vals, ids = jax.lax.top_k(logp, k)
    return samp, vals, ids.astype(jnp.int32)
