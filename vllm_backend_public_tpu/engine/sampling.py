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


def top_logprobs(logits: jax.Array, sampled: jax.Array, k: int):
    """Log-softmax + top-k for logprob reporting.

    Returns (sampled_logprob [B], topk_vals [B,k], topk_ids [B,k]).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    samp = jnp.take_along_axis(logp, sampled[:, None], axis=-1)[:, 0]
    vals, ids = jax.lax.top_k(logp, k)
    return samp, vals, ids.astype(jnp.int32)
