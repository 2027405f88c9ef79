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
    Gumbel-argmax over the full distribution (exact), and top-k/top-p/min-p
    truncation runs inside a lax.top_k(TRUNC_WIDTH) candidate set — exact
    for top_k <= 64; top_p tails beyond 64 candidates are clipped (the
    standard TPU-sampler tradeoff).
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

    # truncated sampling within the top-W candidates
    w = min(TRUNC_WIDTH, v)
    cand_logits, cand_idx = jax.lax.top_k(scaled, w)  # descending
    ranks = jnp.arange(w, dtype=jnp.int32)[None, :]
    k = jnp.where(top_k <= 0, v, jnp.minimum(top_k, w))[:, None]
    mask = ranks < k
    probs = jax.nn.softmax(cand_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    mask &= (cum - probs) < top_p[:, None]
    mask &= probs >= (min_p[:, None] * probs[:, 0:1])
    mask = mask.at[:, 0].set(True)  # always keep the argmax
    filtered = jnp.where(mask, cand_logits, NEG_INF)
    cand_gumbel = jnp.take_along_axis(gumbel, cand_idx, axis=-1)
    choice = jnp.argmax(filtered + cand_gumbel, axis=-1)
    trunc_tok = jnp.take_along_axis(
        cand_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

    truncated = (top_k > 0) | (top_p < 1.0) | (min_p > 0.0)
    sampled_tok = jnp.where(truncated, trunc_tok, full_tok)
    return jnp.where(temperature <= 0.0, greedy_tok, sampled_tok)


def top_logprobs(logits: jax.Array, sampled: jax.Array, k: int):
    """Log-softmax + top-k for logprob reporting.

    Returns (sampled_logprob [B], topk_vals [B,k], topk_ids [B,k]).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    samp = jnp.take_along_axis(logp, sampled[:, None], axis=-1)[:, 0]
    vals, ids = jax.lax.top_k(logp, k)
    return samp, vals, ids.astype(jnp.int32)
