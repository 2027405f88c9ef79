"""Pipeline-parallel decoder execution over the mesh's "pipe" axis.

TPU-native pipeline parallelism for serving (the reference only passes
`--pipeline-parallel-size` through to vLLM's Ray/NCCL stage workers,
benchmark-vllm/vllm_templates.py:56, models.py:12 — here it is a
first-class execution mode):

- The stacked [L, ...] layer parameters and the [L, ...] paged KV cache
  are sharded across S pipeline stages on the leading layer axis
  (parallel/sharding.py `pipelined=True` specs), so each stage holds
  L/S layers and their pages. "pipe" is the OUTERMOST mesh axis: stage
  hops are the only cross-stage traffic and ride DCN between hosts,
  while each stage's tensor-parallel collectives stay on ICI.
- Execution is SPMD via `jax.shard_map` manual over "pipe" only;
  tensor/expert/data sharding inside each stage is still GSPMD-compiled
  (auto axes), so pipeline composes with TP/EP/DP without hand-written
  collectives.
- The batch is split into M microbatches and moves through the stages
  as a classic fill/drain schedule: tick t runs microbatch (t - stage)
  on every stage in parallel and `ppermute`s activations to the next
  stage. One forward costs M + S - 1 ticks; per-step utilization is
  M/(M+S-1), so throughput favors M >= S. Each stage writes its own
  layers' KV pages with the microbatch's own block tables; invalid
  (fill/drain) ticks are masked writes that XLA scatters out of range
  (dropped), so no real page traffic happens on bubbles.
- The finished last-stage activations are broadcast with a masked psum
  ([B, T, H] — small next to the per-layer weight streaming), and the
  final norm + lm_head run replicated so sampling can stay fused in the
  engine's decode program.

NB: call `pipelined_forward_hidden` under `jax.jit` (the engine always
does) — eager shard_map compiles per-primitive, which is slow and can
abort the CPU backend on the manual-axis scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..loader.hf import ModelConfig
from ..models.common import AttnInputs, KVCache, rope_cos_sin


def num_stages(mesh) -> int:
    return mesh.shape["pipe"]


def pipelined_forward_hidden(params, cfg: ModelConfig, tokens: jax.Array,
                             attn: AttnInputs, cache: KVCache, mesh,
                             family, num_microbatches: int = 0,
                             attn_impl: str = "xla"):
    """Drop-in for family.forward_hidden under a pipe-sharded mesh.

    tokens: [B, T]; attn fields [B, ...]; cache leaves [L, ...] sharded
    P("pipe", ...). Requires B % num_microbatches == 0 and
    L % num_stages == 0. Returns (hidden [B, T, H] replicated over pipe,
    updated cache).
    """
    S = num_stages(mesh)
    B, T = tokens.shape
    M = num_microbatches or S
    M = min(M, B)
    while B % M:
        M -= 1
    Bm = B // M
    if cfg.num_layers % S:
        raise ValueError(f"num_layers {cfg.num_layers} not divisible by "
                         f"pipeline stages {S}")
    if S > 1 and mesh.shape.get("data", 1) > 1:
        # XLA's SPMD partitioner (v0.9) hits a device-group check failure
        # (spmd_partitioner_util.cc ExpandDeviceGroupsWithIota) when the
        # paged-pool gather is partitioned over BOTH an auto "data" axis
        # and an auto "model" axis under a manual "pipe" axis. PP composes
        # with TP/EP; scale-out replicas use separate engine processes.
        raise ValueError("pipeline_parallel > 1 requires data_parallel == 1")

    def split(a, trailing_dims):
        a = a.reshape(M, Bm, *a.shape[1:])
        spec = P(None, "data", *([None] * trailing_dims))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    tokens_mb = split(tokens, 1)
    bt_mb = split(attn.block_tables, 1)
    kl_mb = split(attn.kv_lens, 0)
    pos_mb = split(attn.positions, 1)
    wm_mb = split(attn.write_mask, 1)

    layers = params["layers"]
    rest = {k: v for k, v in params.items() if k != "layers"}
    ring = [(i, (i + 1) % S) for i in range(S)]

    def spmd(layers, cache, rest, tokens, bt, kl, pos, wm):
        stage = jax.lax.axis_index("pipe")
        hdim = cfg.hidden_size
        dtype = rest["embed"].dtype
        buf = jnp.zeros((Bm, T, hdim), dtype)
        out = jnp.zeros((M, Bm, T, hdim), dtype)

        def pick(a, m):
            return jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False)

        for t in range(M + S - 1):
            m = t - stage
            valid = (m >= 0) & (m < M)
            mv = jnp.clip(m, 0, M - 1)
            # stage 0 feeds itself from the embedding at static index t
            feed = family.embed_tokens(rest, cfg, tokens[min(t, M - 1)],
                                       pos[min(t, M - 1)])
            x = jnp.where(stage == 0, feed.astype(dtype), buf)
            # this stage's current microbatch's attention metadata
            attn_m = AttnInputs(
                block_tables=pick(bt, mv), kv_lens=pick(kl, mv),
                positions=pick(pos, mv),
                write_mask=pick(wm, mv) & valid)
            if getattr(family, "USES_ROPE", True):
                cos, sin = rope_cos_sin(attn_m.positions, cfg.head_dim,
                                        cfg.rope_theta)
            else:
                cos = sin = None
            cache_arrays = tuple(a for a in cache if a is not None)
            x, ys = family.scan_layers(layers, cfg, x, attn_m, cache_arrays,
                                       cos, sin, attn_impl, defer=True)
            from ..models.common import write_kv_all_layers
            cache = write_kv_all_layers(cache, ys[0], ys[1], attn_m)
            done = valid & (stage == S - 1)
            prev = pick(out, mv)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(done, x, prev), mv, 0)
            buf = jax.lax.ppermute(x, "pipe", ring)

        hidden = jax.lax.psum(
            jnp.where(stage == S - 1, out, jnp.zeros_like(out)), "pipe")
        return hidden, cache

    hidden_mb, cache = jax.shard_map(
        spmd, mesh=mesh,
        in_specs=(P("pipe"), P("pipe"), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P("pipe")),
        axis_names={"pipe"}, check_vma=False,
    )(layers, cache, rest, tokens_mb, bt_mb, kl_mb, pos_mb, wm_mb)

    hidden = hidden_mb.reshape(B, T, -1)
    hidden = family.finalize_hidden(rest, cfg, hidden)
    return hidden, cache


def pipelined_decode(params, cfg: ModelConfig, cache: KVCache,
                     tokens: jax.Array, kv_lens: jax.Array,
                     block_tables: jax.Array, active: jax.Array,
                     mesh, family, k_steps: int,
                     num_microbatches: int = 0,
                     attn_impl: str = "xla",
                     samp=None, counts=None):
    """STEADY-STATE pipelined decode: K fused steps with the ring kept
    full ACROSS steps.

    The per-step fill/drain schedule (pipelined_forward_hidden) caps
    stage utilization at M/(M+S-1) because the ring drains between
    decode steps. Decode steps are data-dependent only WITHIN a
    microbatch (token k+1 of microbatch m needs token k of m), so the
    (step, microbatch) stream (0,0)(0,1)..(0,M-1)(1,0).. can flow
    continuously: microbatch m of step k+1 enters stage 0 exactly M
    ticks after m of step k did, and its sampled token ppermutes back
    from the last stage in S-1 < M ticks — so for M >= S the ring never
    drains and utilization approaches K*M/(K*M + S - 1).

    samp/counts carry the full sampling state through the ring (round-2
    gap: sampled requests used to drop PP to per-step fill/drain):
    samp = dict of [B] arrays (seeds, steps, temperature, top_k, top_p,
    min_p, presence, frequency, repetition), counts = [B, V] output-token
    counts for penalties; each microbatch's counts copy advances on the
    last stage between its own steps. None => greedy argmax. Logprobs
    still use the fill/drain path. Returns (toks [K, B], cache,
    new_kv_lens).
    """
    S = num_stages(mesh)
    B = tokens.shape[0]
    M = num_microbatches or S
    M = max(min(M, B), S)  # ring stays full only for M >= S
    while B % M:
        M -= 1
    if M < S:
        raise ValueError(f"batch {B} cannot fill {S} stages")
    Bm = B // M
    K = k_steps
    total = K * M + S - 1

    def split(a, trailing):
        a = a.reshape(M, Bm, *a.shape[1:])
        spec = P(None, "data", *([None] * trailing))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    tok_mb = split(tokens, 0)          # [M, Bm]
    kv_mb = split(kv_lens, 0)
    bt_mb = split(block_tables, 1)
    act_mb = split(active, 0)
    sampled = samp is not None
    if sampled:
        samp_mb = {k: split(v, 0) for k, v in samp.items()}
        cnt_mb = split(counts, 1)      # [M, Bm, V]
    else:
        samp_mb = {}
        cnt_mb = jnp.zeros((M, Bm, 1), jnp.int32)

    layers = params["layers"]
    rest = {k: v for k, v in params.items() if k != "layers"}
    ring = [(i, (i + 1) % S) for i in range(S)]
    back = [(S - 1, 0)]

    def spmd(layers, cache, rest, tok_mb, kv_mb, bt_mb, act_mb, samp_mb,
             cnt_mb):
        stage = jax.lax.axis_index("pipe")
        hdim = cfg.hidden_size
        dtype = rest["embed"].dtype

        def pick(a, m):
            return jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False)

        def body(t, carry):
            tok_cur, buf, out, cache, cnt = carry
            g = t - stage
            valid = (g >= 0) & (g < K * M)
            gc = jnp.clip(g, 0, K * M - 1)
            k_idx = gc // M
            m_idx = gc % M

            tok_m = pick(tok_cur, m_idx)               # [Bm]
            feed = family.embed_tokens(
                rest, cfg, tok_m[:, None],
                (pick(kv_mb, m_idx) + k_idx)[:, None])
            x = jnp.where(stage == 0, feed.astype(dtype), buf)

            kvl = pick(kv_mb, m_idx) + k_idx
            act = pick(act_mb, m_idx) & valid
            attn_m = AttnInputs(
                block_tables=pick(bt_mb, m_idx),
                kv_lens=kvl + act.astype(jnp.int32),
                positions=kvl[:, None],
                write_mask=act[:, None])
            if getattr(family, "USES_ROPE", True):
                cos, sin = rope_cos_sin(attn_m.positions, cfg.head_dim,
                                        cfg.rope_theta)
            else:
                cos = sin = None
            cache_arrays = tuple(a for a in cache if a is not None)
            x, ys = family.scan_layers(layers, cfg, x, attn_m,
                                       cache_arrays, cos, sin, attn_impl,
                                       defer=True)
            from ..models.common import write_kv_all_layers
            cache = write_kv_all_layers(cache, ys[0], ys[1], attn_m)

            # last stage: next token (lm_head runs on every stage —
            # SPMD can't branch per stage; S-1 wasted [Bm, V] matmuls)
            h = family.finalize_hidden(rest, cfg, x)
            logits = family.logits_from_hidden(rest, h[:, 0])
            if sampled:
                from ..engine.sampling import apply_penalties, sample
                sm = {k: pick(v, m_idx) for k, v in samp_mb.items()}
                cm = pick(cnt, m_idx)                  # [Bm, V]
                lg = apply_penalties(logits, cm, sm["presence"],
                                     sm["frequency"], sm["repetition"])
                tok_next = sample(
                    lg, seeds=sm["seeds"], steps=sm["steps"] + k_idx,
                    temperature=sm["temperature"], top_k=sm["top_k"],
                    top_p=sm["top_p"], min_p=sm["min_p"])
                # this microbatch's counts advance before its next step
                # reaches the sampler (M ticks later, same stage)
                cm = cm.at[jnp.arange(Bm), tok_next].add(
                    act.astype(cm.dtype))
                cnt = jax.lax.dynamic_update_index_in_dim(
                    cnt, cm, m_idx, 0)
            else:
                tok_next = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tok_next = jnp.where(act, tok_next, 0)

            # token rides back to stage 0; activation rides forward
            tok_in = jax.lax.ppermute(tok_next, "pipe", back)
            buf = jax.lax.ppermute(x, "pipe", ring)

            # the arriving token was sampled at tick t for g = t-(S-1):
            # stage 0 consumes it as microbatch m' step k'+1's input and
            # records it as step k' output
            gp = t - (S - 1)
            validp = (gp >= 0) & (gp < K * M) & (stage == 0)
            gpc = jnp.clip(gp, 0, K * M - 1)
            kp = gpc // M
            mp = gpc % M
            new_tok = jnp.where(validp, tok_in, pick(tok_cur, mp))
            tok_cur = jax.lax.dynamic_update_index_in_dim(
                tok_cur, new_tok, mp, 0)
            prev_out = out[kp, mp]
            out = out.at[kp, mp].set(jnp.where(validp, tok_in, prev_out))
            return (tok_cur, buf, out, cache, cnt)

        out0 = jnp.zeros((K, M, Bm), jnp.int32)
        buf0 = jnp.zeros((Bm, 1, hdim), dtype)
        # the loop body makes these carries vary across stages (each
        # stage sees different values) — mark the replicated initials as
        # varying over "pipe" so the scan carry types match
        tok0, buf0, out0, cnt0 = jax.lax.pcast(
            (tok_mb, buf0, out0, cnt_mb), ("pipe",), to="varying")
        tok_cur, buf, out, cache, cnt = jax.lax.fori_loop(
            0, total, body, (tok0, buf0, out0, cache, cnt0))
        # outputs live on stage 0 only
        out = jax.lax.psum(
            jnp.where(stage == 0, out, jnp.zeros_like(out)), "pipe")
        return out, cache

    out_mb, cache = jax.shard_map(
        spmd, mesh=mesh,
        in_specs=(P("pipe"), P("pipe"), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P("pipe")),
        axis_names={"pipe"}, check_vma=False,
    )(layers, cache, rest, tok_mb, kv_mb, bt_mb, act_mb, samp_mb, cnt_mb)

    toks = out_mb.reshape(K, B)
    new_kv_lens = kv_lens + active.astype(jnp.int32) * K
    return toks, cache, new_kv_lens


# round-2 name: greedy-only entry point, kept for callers/tests
def pipelined_decode_greedy(params, cfg, cache, tokens, kv_lens,
                            block_tables, active, mesh, family, k_steps,
                            num_microbatches=0, attn_impl="xla"):
    return pipelined_decode(params, cfg, cache, tokens, kv_lens,
                            block_tables, active, mesh, family, k_steps,
                            num_microbatches, attn_impl)


def make_forward_hidden(mesh, family, num_microbatches: int = 0):
    """Bind a forward_hidden-signature callable for the engine: the engine
    swaps this in for the family's forward when pipeline_parallel > 1."""

    def fwd(params, cfg, tokens, attn, cache, attn_impl="xla"):
        return pipelined_forward_hidden(
            params, cfg, tokens, attn, cache, mesh, family,
            num_microbatches=num_microbatches, attn_impl=attn_impl)

    return fwd
