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


def sample(logits: jax.Array, *, seeds: jax.Array, steps: jax.Array,
           temperature: jax.Array, top_k: jax.Array, top_p: jax.Array,
           min_p: jax.Array) -> jax.Array:
    """Sample one token per row.

    logits: [B, V] float32 (penalties already applied).
    seeds, steps: [B] int32 — per-slot PRNG derivation.
    temperature: [B] float32; 0.0 => greedy.
    top_k: [B] int32; 0 => disabled. top_p: [B] in (0,1]; min_p: [B] in [0,1).
    Returns [B] int32 token ids.
    """
    b, v = logits.shape
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    # sort descending once; build top-k / top-p / min-p masks in sorted order
    sort_idx = jnp.argsort(-scaled, axis=-1)
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    ranks = jnp.arange(v, dtype=jnp.int32)[None, :]

    k = jnp.where(top_k <= 0, v, top_k)[:, None]
    mask = ranks < k

    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose cumulative mass *before* them is < top_p
    mask &= (cum - probs) < top_p[:, None]

    # min-p: drop tokens below min_p * max_prob
    mask &= probs >= (min_p[:, None] * probs[:, 0:1])
    mask = mask.at[:, 0].set(True)  # always keep the argmax

    filtered = jnp.where(mask, sorted_logits, NEG_INF)

    def one_key(seed, step):
        return jax.random.fold_in(jax.random.PRNGKey(seed), step)

    keys = jax.vmap(one_key)(seeds, steps)
    gumbel = jax.vmap(
        lambda key: jax.random.gumbel(key, (v,), dtype=jnp.float32))(keys)
    choice_sorted = jnp.argmax(filtered + gumbel, axis=-1)
    sampled_tok = jnp.take_along_axis(
        sort_idx, choice_sorted[:, None], axis=-1)[:, 0].astype(jnp.int32)

    return jnp.where(temperature <= 0.0, greedy_tok, sampled_tok)


def top_logprobs(logits: jax.Array, sampled: jax.Array, k: int):
    """Log-softmax + top-k for logprob reporting.

    Returns (sampled_logprob [B], topk_vals [B,k], topk_ids [B,k]).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    samp = jnp.take_along_axis(logp, sampled[:, None], axis=-1)[:, 0]
    vals, ids = jax.lax.top_k(logp, k)
    return samp, vals, ids.astype(jnp.int32)
