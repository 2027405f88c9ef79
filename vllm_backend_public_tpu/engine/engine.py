"""LLMEngine: the continuous-batching execution loop.

TPU-native replacement for the vLLM AsyncLLMEngine the reference deploys as
an external image (reference contract: launch args assembled at
benchmark-vllm/vllm_templates.py:50-87; probed over /health, /v1/models,
/v1/completions). Responsibilities:

  host (Python, this file):  admission, paged-block bookkeeping, stop
    conditions, detokenization hooks, metrics.
  device (jit, static shapes): prefill chunk forward, fused decode
    step = forward + penalties + sampling + count update, with the KV cache
    and sampler-count buffers donated so XLA updates them in place.

Two compiled programs cover steady state: one decode step (fixed
max_num_seqs width) and one prefill program per power-of-two length bucket.
That is the XLA analog of vLLM's CUDA-graph capture.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..loader.hf import ModelConfig
from ..models import get_model
from ..models.common import AttnInputs, KVCache, init_kv_cache
from .block_allocator import BlockAllocator
from .config import EngineConfig
from .outputs import RequestOutput
from .request import Request, RequestStatus, SamplingParams
from .sampling import apply_penalties, sample, speculative_verify
from .scheduler import Scheduler

logger = logging.getLogger(__name__)


def _merge_projections(params, model_cfg):
    """Concatenate q|k|v -> wqkv and gate|up -> wgu on the output axis.

    Same-input matmuls merged into one halve the per-op overhead (XLA
    runs each weight-streaming fusion with its own ramp; w8a8 also
    re-quantizes the shared input per op). Numerics are identical: the
    dynamic activation scale is a function of the input only, and
    per-output-channel weight scales concatenate losslessly. Applied
    ONLY when unsharded — under TP the merged output dim would
    interleave column groups that shard differently.
    """
    from ..ops.linear import QuantizedWeight, is_quantized

    if not isinstance(params, dict) or "layers" not in params:
        return params
    layers = dict(params["layers"])

    def cat(keys):
        ws = [layers[k] for k in keys]
        if all(is_quantized(w) for w in ws):
            if len({w.kind for w in ws}) != 1:
                return None
            if len({w.g for w in ws}) != 1:
                return None
            # concat-on-axis-(-1) of scales is only lossless when the
            # last scale axis IS the output-channel axis (per-channel
            # [out] or per-group [k//g, out]); a future per-tensor or
            # transposed layout must not merge silently
            if len({w.s.ndim for w in ws}) != 1:
                return None
            if any(w.s.shape[-1] != w.q.shape[-1] for w in ws):
                return None
            return QuantizedWeight(
                ws[0].kind,
                jnp.concatenate([w.q for w in ws], axis=-1),
                jnp.concatenate([w.s for w in ws], axis=-1), ws[0].g)
        if any(is_quantized(w) for w in ws):
            return None
        if len({w.dtype for w in ws}) != 1:
            return None
        return jnp.concatenate(ws, axis=-1)

    if all(k in layers for k in ("wq", "wk", "wv")):
        merged = cat(("wq", "wk", "wv"))
        if merged is not None:
            layers["wqkv"] = merged
            for k in ("wq", "wk", "wv"):
                del layers[k]
            if all(k in layers for k in ("bq", "bk", "bv")):
                layers["bqkv"] = jnp.concatenate(
                    [layers.pop("bq"), layers.pop("bk"),
                     layers.pop("bv")], axis=-1)
    if all(k in layers for k in ("wg", "wu")):
        merged = cat(("wg", "wu"))
        if merged is not None:
            layers["wgu"] = merged
            del layers["wg"], layers["wu"]
    return {**params, "layers": layers}


class LLMEngine:
    def __init__(self, econfig: EngineConfig, *,
                 model_cfg: Optional[ModelConfig] = None,
                 params=None, tokenizer=None):
        self.econfig = econfig
        if params is None:
            from ..loader.safetensors import load_model
            model_cfg, params = load_model(econfig.model,
                                           dtype=econfig.jnp_dtype())
            if econfig.quantization:
                from ..ops.quant import quantize_params
                if econfig.quantization == "int4":
                    logger.warning(
                        "int4 with round-to-nearest calibration only: "
                        "expect a large ppl hit. Pre-calibrate the "
                        "checkpoint with ops/awq.py:awq_quantize_llama "
                        "(activation-aware scales + weighted clip) to "
                        "stay near the accuracy budget.")
                params = quantize_params(params, econfig.quantization)
        assert model_cfg is not None
        self.model_cfg = model_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.family = get_model(model_cfg.arch)

        self.attn_impl = econfig.attn_impl
        if self.attn_impl == "auto":
            self.attn_impl = ("pallas" if jax.default_backend() == "tpu"
                              else "xla")

        # GSPMD mesh: shard params + cache when tp/dp/ep/pp > 1 (XLA
        # inserts the collectives; the reference's --tensor-parallel-size /
        # --pipeline-parallel-size analog)
        self.mesh = None
        pp = econfig.pipeline_parallel_size
        world = (econfig.tensor_parallel_size * econfig.data_parallel_size
                 * econfig.expert_parallel_size * pp)
        if world == 1:
            # clear ambient state a previous (mesh) engine in this
            # process may have left behind (tests build engines serially)
            from ..parallel.mesh import set_active_mesh
            set_active_mesh(None)
            if model_cfg.arch == "mixtral":
                from ..models import mixtral
                mixtral.set_moe_impl(mixtral.MOE_IMPL_DEFAULT)
            # merge q|k|v and gate|up into single weights: one weight
            # stream + one dynamic activation quant per pair instead of
            # 2-3 ops sharing the same input (identical numerics; ~9 us
            # of per-op overhead per layer each on v5e). Single-device
            # only: under TP the merged out-dim would interleave
            # differently-sharded column groups.
            self.params = _merge_projections(self.params, model_cfg)
        if world > 1:
            from ..parallel.mesh import make_mesh
            from ..parallel.sharding import shard_params
            if pp > 1 and econfig.data_parallel_size > 1:
                raise ValueError("pipeline_parallel composes with tp/ep; "
                                 "run data-parallel replicas as separate "
                                 "engine processes (parallel/pipeline.py)")
            if pp > 1 and model_cfg.num_layers % pp:
                raise ValueError(
                    f"num_layers {model_cfg.num_layers} not divisible by "
                    f"pipeline_parallel_size {pp}")
            self.mesh = make_mesh(
                tensor_parallel=econfig.tensor_parallel_size,
                data_parallel=econfig.data_parallel_size,
                expert_parallel=econfig.expert_parallel_size,
                pipeline_parallel=pp)
            if model_cfg.num_kv_heads % econfig.tensor_parallel_size:
                raise ValueError(
                    f"num_kv_heads {model_cfg.num_kv_heads} not divisible "
                    f"by tensor_parallel_size "
                    f"{econfig.tensor_parallel_size}")
            self.params = shard_params(self.params, self.mesh, model_cfg,
                                       pipelined=pp > 1)
            # 8-bit matmuls: XLA's fused convert+dot partitions under
            # GSPMD and measured faster than the Pallas kernels anyway
            # (ops/linear.py MATMUL_IMPL); Pallas attention stays ON for
            # TP/EP meshes via a shard_map self-wrap (each shard runs the
            # kernel on its kv heads — ops/attention.py), and under PP
            # too: each stage's pool slice is layer-local, so the kernel
            # runs per stage (the TP self-wrap nests inside the
            # pipe-manual region; equivalence tests cover pp2, pp2xtp2).
            # Only in-program DP truly breaks the kernel's locality
            # assumption: the pool shards over "data" on the block axis
            # while block ids are global, so a sequence's pages can live
            # on another data shard — that mode falls back to XLA gather
            # attention, LOUDLY. Production DP is DP-as-replicas behind
            # server/router.py; the in-program axis exists for mesh
            # composition validation (dryrun) and small-scale tests.
            from ..ops.linear import set_kernels_enabled
            from ..parallel.mesh import set_active_mesh
            set_kernels_enabled(False)
            if econfig.data_parallel_size == 1:
                set_active_mesh(
                    self.mesh if econfig.tensor_parallel_size > 1 else None)
            else:
                set_active_mesh(None)
                self.attn_impl = "xla"
                logger.warning(
                    "in-program data_parallel_size=%d: paged-attention "
                    "falls back to the XLA gather path (block-table "
                    "locality is per-replica). Use DP-as-replicas "
                    "(server/router.py) for production data parallelism.",
                    econfig.data_parallel_size)
            if model_cfg.arch == "mixtral":
                from ..models.mixtral import set_moe_impl
                if pp == 1:
                    # expert-parallel grouped dispatch: shard_map over
                    # ("expert", "model"). ep > 2 routes tokens with a
                    # ragged all-to-all (bytes scale with routed rows,
                    # ops/moe.py:moe_mlp_a2a_sharded); at ep <= 2 the
                    # replicated-activation psum exchange moves fewer
                    # bytes (see the a2a docstring's per-shard math), so
                    # it stays the default there. VBPT_MOE_EP_EXCHANGE
                    # ∈ {a2a, psum} overrides.
                    ep_size = self.mesh.shape.get("expert", 1)
                    pref = os.environ.get("VBPT_MOE_EP_EXCHANGE", "")
                    use_a2a = (pref == "a2a"
                               or (pref != "psum" and ep_size > 2))
                    set_moe_impl("grouped_ep_a2a" if use_a2a
                                 else "grouped_ep", self.mesh)
                elif self.mesh.shape.get("expert", 1) > 1:
                    # the pipelined forward already shard_maps over
                    # "pipe"; nesting the MoE EP shard_map inside it is
                    # not supported — dense + GSPMD psum is the PP x EP
                    # fallback
                    logger.warning(
                        "pipeline x expert parallelism: MoE falls back "
                        "to dense expert compute (all experts per token)")
                    set_moe_impl("dense")
                elif econfig.tensor_parallel_size > 1:
                    # PP x TP without an expert axis: the grouped-prefill
                    # Pallas kernel would run OUTSIDE any shard_map over
                    # "model" (the pipelined forward is manual over
                    # "pipe" only) while the expert weights are
                    # model-sharded under GSPMD — an opaque pallas_call
                    # there risks a partitioning compile failure or a
                    # silent full weight replication. Dense einsums are
                    # GSPMD-safe; gate grouped on tp == 1 until PP x TP
                    # quantized MoE is exercised on hardware.
                    logger.warning(
                        "pipeline x tensor parallelism without an expert "
                        "axis: MoE falls back to dense expert compute")
                    set_moe_impl("dense")
                else:
                    # PP (tp == 1) without an expert axis: every stage
                    # holds its layers' experts fully, so the LOCAL auto
                    # path needs no shard_map — dense at decode token
                    # counts (expert weights stream once per step either
                    # way; grouped dispatch measured 7x slower there),
                    # the grouped top-k/E FLOP saving at prefill (>= 512
                    # tokens). Round-3 forced dense for ALL of PP, which
                    # paid all-E FLOPs on prefill too.
                    set_moe_impl("auto")

        num_blocks = econfig.num_kv_blocks or self._auto_num_blocks()
        if self.mesh is not None:
            # page pool must split evenly over the "data" axis
            dp = econfig.data_parallel_size
            num_blocks = max((num_blocks // dp) * dp, 2 * dp)
        self.cache: KVCache = init_kv_cache(
            model_cfg, num_blocks, econfig.block_size,
            dtype=econfig.kv_jnp_dtype())
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from ..parallel.sharding import kv_cache_spec, kv_scale_spec
            sh5 = NamedSharding(self.mesh, kv_cache_spec(pipelined=pp > 1))
            sh4 = NamedSharding(self.mesh, kv_scale_spec(pipelined=pp > 1))
            self.cache = KVCache(
                k=jax.device_put(self.cache.k, sh5),
                v=jax.device_put(self.cache.v, sh5),
                k_scale=(None if self.cache.k_scale is None
                         else jax.device_put(self.cache.k_scale, sh4)),
                v_scale=(None if self.cache.v_scale is None
                         else jax.device_put(self.cache.v_scale, sh4)))
        # KV deferred-scatter form: the fast "slab" scatter makes XLA
        # allocate a pool-array-sized HBM temp; fall back to the strictly
        # in-place "point" form when that temp doesn't fit next to the
        # params + pool (models/common.py:write_kv_all_layers)
        from ..models.common import set_kv_write_mode
        pool_bytes = sum(
            x.size * x.dtype.itemsize
            for x in (self.cache.k, self.cache.v, self.cache.k_scale,
                      self.cache.v_scale) if x is not None)
        temp_bytes = self.cache.k.size * self.cache.k.dtype.itemsize
        param_bytes = sum(x.size * x.dtype.itemsize
                          for x in jax.tree.leaves(self.params))
        capacity = self._hbm_capacity()
        # the multi-step lookahead buffers are long-lived per decode call
        # and must fit alongside the slab temp (0.54 GB at B=128 K=32 —
        # omitting them OOM'd b128 x bs256 in round 4)
        lookahead_bytes = (2 * model_cfg.num_layers
                           * econfig.decode_steps_per_call
                           * econfig.max_num_seqs * model_cfg.num_kv_heads
                           * model_cfg.head_dim
                           * jnp.dtype(econfig.jnp_dtype()).itemsize)
        headroom = capacity - param_bytes - pool_bytes - lookahead_bytes
        # 1 GB margin: logits/sampler-count buffers and fusion workspace
        # at max_num_seqs=128 measured ~0.7 GB (b128 x bs256 OOM'd with
        # a 0.5 GB margin in round 4)
        set_kv_write_mode(
            "slab" if headroom > temp_bytes + (1 << 30) else "point")

        from .block_allocator import make_allocator
        self.allocator = make_allocator(
            num_blocks, econfig.block_size,
            prefer_native=econfig.enable_prefix_caching)
        self.scheduler = Scheduler(econfig, self.allocator,
                                   sliding_window=model_cfg.sliding_window)

        B = econfig.max_num_seqs
        MB = econfig.max_blocks_per_seq
        self._B, self._MB = B, MB
        # host-side per-slot state
        self._bt = np.zeros((B, MB), dtype=np.int32)
        self._kv_lens = np.zeros((B,), dtype=np.int32)
        self._last = np.zeros((B,), dtype=np.int32)
        self._active = np.zeros((B,), dtype=bool)
        self._slot_req: List[Optional[Request]] = [None] * B
        self._samp = {
            "seeds": np.zeros((B,), dtype=np.int32),
            "steps": np.zeros((B,), dtype=np.int32),
            "temperature": np.ones((B,), dtype=np.float32),
            "top_k": np.zeros((B,), dtype=np.int32),
            "top_p": np.ones((B,), dtype=np.float32),
            "min_p": np.zeros((B,), dtype=np.float32),
            "presence": np.zeros((B,), dtype=np.float32),
            "frequency": np.zeros((B,), dtype=np.float32),
            "repetition": np.ones((B,), dtype=np.float32),
        }
        # on-device output-token counts for penalties
        self._counts = jnp.zeros((B, model_cfg.vocab_size), dtype=jnp.int32)
        # device-resident decode state (tokens/kv_lens/bt/active/samp);
        # re-uploaded from the host mirrors only when invalidated
        self._dev = None
        self._bt_len = np.zeros((B,), dtype=np.int64)

        self._requests: Dict[str, Request] = {}
        self._score_fns: Dict[int, object] = {}
        self._build_device_fns()
        # metrics (tokens/s, step latencies — the engine-side observability
        # the reference disables in vLLM via disable-log-stats,
        # reference models.py:24; here first-class)
        self.metrics = {"num_steps": 0, "num_prefill_steps": 0,
                        "num_decode_steps": 0, "generated_tokens": 0,
                        "preemptions": 0, "waiting_evictions": 0,
                        "decode_step_ms_ema": 0.0,
                        "prefill_step_ms_ema": 0.0,
                        # spec_rounds: engine rounds; spec_seq_rounds: sum
                        # of SPECULATING rows over rounds; spec_emitted:
                        # all tokens emitted in spec rounds (incl. plain
                        # riders); spec_row_emitted: tokens emitted by
                        # speculating rows — per-sequence acceptance =
                        # spec_row_emitted / spec_seq_rounds
                        "spec_rounds": 0, "spec_emitted": 0,
                        "spec_seq_rounds": 0, "spec_row_emitted": 0,
                        "spec_gate_phase": "spec_probe"}

    # ------------------------------------------------------------------ setup

    def _hbm_capacity(self) -> int:
        try:
            stats = jax.local_devices()[0].memory_stats()
            return stats["bytes_limit"]
        except Exception:
            # v5e exposes 15.75 GiB usable of its 16 GiB HBM (and this
            # backend's memory_stats() returns None)
            return int(15.75 * 1024**3)

    def _auto_num_blocks(self) -> int:
        """Size the KV pool from device memory, like gpu_memory_utilization
        (reference: benchmark-vllm/models.py:8)."""
        cfg, e = self.model_cfg, self.econfig
        bytes_per_tok = (cfg.num_layers * 2 * cfg.num_kv_heads * cfg.head_dim
                         * jnp.dtype(e.kv_jnp_dtype()).itemsize)
        param_bytes = sum(x.size * x.dtype.itemsize
                          for x in jax.tree.leaves(self.params))
        budget = int(self._hbm_capacity() * e.hbm_utilization) - param_bytes
        # floor: enough for one full-length sequence per slot if possible
        num = max(budget // (bytes_per_tok * e.block_size), 0)
        need_min = e.max_num_seqs * 2 + 2
        num = max(min(num, e.max_num_seqs * e.max_blocks_per_seq + 1), need_min)
        return int(num)

    def _build_device_fns(self):
        cfg = self.model_cfg
        fwd = self.family.forward_hidden
        if self.econfig.pipeline_parallel_size > 1:
            from ..parallel.pipeline import make_forward_hidden
            fwd = make_forward_hidden(
                self.mesh, self.family,
                self.econfig.pipeline_microbatches)
        self._fwd = fwd
        logits_fn = self.family.logits_from_hidden
        impl = self.attn_impl
        B = self._B

        # Lookahead-buffer multi-step decode: the paged cache stays OUT of
        # the step loop's carry (a carried multi-GB cache buffer costs a
        # full device copy per iteration — measured 4.8 ms/step on
        # Llama-3-8B int8 KV). New K/V go to a small [L, B, NKV, K, D]
        # side buffer that attention folds in (`pending`); ONE scatter
        # writes all K steps after the loop. Sliding-window models ride
        # this path too — the attention kernel takes the TRUE query
        # position (prefix + lookahead count) for its window bound.
        # Pipeline parallelism keeps the legacy carried-cache path (the
        # pipelined forward doesn't thread kv_pending).
        use_pending = self.econfig.pipeline_parallel_size == 1
        nkv, hd, L = cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
        buf_dtype = self.econfig.jnp_dtype()
        # int8 lookahead buffer (round 5): with an int8 KV cache the
        # pending tokens get quantized at flush anyway — quantizing at
        # WRITE time makes the flushed cache bit-identical while halving
        # the buffer the attention kernel re-reads every layer
        # (8.4 -> 4.2 MB/layer + 0.3 MB scales at llama8b b64 K32).
        # VBPT_PENDING_INT8=0 is the A/B kill-switch.
        quant_pending = (use_pending and self.cache.quantized
                         and os.environ.get("VBPT_PENDING_INT8",
                                            "1") != "0")

        def one_decode(params, cache, counts, tokens, kv_lens,
                       block_tables, active, samp, steps, rows,
                       greedy_only, pending=None):
            # positions of the new tokens == current kv_lens; attention sees
            # the cached prefix (+ the pending lookahead buffer) + the new
            # token (deferred write)
            positions = kv_lens
            attn_lens = kv_lens + active.astype(jnp.int32)
            attn = AttnInputs(
                block_tables=block_tables, kv_lens=attn_lens,
                positions=positions[:, None], write_mask=active[:, None])
            if pending is not None:
                hidden, kv_news = fwd(params, cfg, tokens[:, None], attn,
                                      cache, attn_impl=impl,
                                      kv_pending=pending, defer_out=True)
            else:
                kv_news = None
                hidden, cache = fwd(params, cfg, tokens[:, None], attn,
                                    cache, attn_impl=impl)
            logits = logits_fn(params, hidden[:, 0])  # [W, V] fp32
            if greedy_only:
                toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                # counts stays slot-indexed [max_num_seqs, V]; gather the
                # compacted rows for penalties
                logits = apply_penalties(logits, counts[rows],
                                         samp["presence"],
                                         samp["frequency"],
                                         samp["repetition"])
                toks = sample(logits, seeds=samp["seeds"], steps=steps,
                              temperature=samp["temperature"],
                              top_k=samp["top_k"], top_p=samp["top_p"],
                              min_p=samp["min_p"])
            toks = jnp.where(active, toks, 0)
            counts = counts.at[rows, toks].add(active.astype(jnp.int32))
            inc = active.astype(jnp.int32)
            return (toks, cache, counts, kv_lens + inc, steps + inc,
                    logits, kv_news)

        TOPLP = 5  # OpenAI-style top-logprobs width

        def decode_multi(params, cache, counts, tokens, kv_lens,
                         block_tables, active, samp, rows, greedy_only,
                         k_steps, want_logprobs, mb_bucket=None):
            # rows [W]: slot index of each compacted batch row (decode
            # width bucketing — W = pow2 >= active count, so one active
            # request doesn't pay max_num_seqs-wide attention+sampling).
            # counts stays [max_num_seqs, V] (device-resident, donated);
            # the program gathers/scatters it by rows.
            W = tokens.shape[0]
            # k_steps fused decode iterations per dispatch: one host
            # round-trip streams k_steps tokens per sequence.
            # mb_bucket: static context bucket — the attention kernel's
            # grid spans the block-table width, so slicing it to the
            # batch's actual max context (pow2-bucketed to bound
            # recompiles) removes the per-grid-step issue overhead of
            # OOB-clamped pages (~10 ms/step at max_model_len 2048 with
            # short contexts)
            if mb_bucket is not None and mb_bucket < block_tables.shape[1]:
                block_tables = block_tables[:, :mb_bucket]
            pp_n = self.econfig.pipeline_parallel_size
            if pp_n > 1 and not want_logprobs and W >= pp_n:
                # steady-state pipelined decode: the (step, microbatch)
                # stream keeps the stage ring full across all K steps
                # (utilization ~K*M/(K*M+S-1) instead of M/(M+S-1) per
                # step). Sampling state (seeds/steps/penalty counts)
                # rides the ring too — only logprobs requests fall back
                # to the per-step fill/drain path below.
                from ..parallel.pipeline import pipelined_decode
                toks_buf, cache, kv_lens = pipelined_decode(
                    params, cfg, cache, tokens, kv_lens, block_tables,
                    active, self.mesh, self.family, k_steps,
                    self.econfig.pipeline_microbatches, attn_impl=impl,
                    samp=None if greedy_only else samp,
                    counts=None if greedy_only else counts[rows])
                toks_buf = jnp.where(active[None, :], toks_buf, 0)
                rws = jnp.tile(rows, k_steps)
                counts = counts.at[rws, toks_buf.reshape(-1)].add(
                    jnp.tile(active.astype(jnp.int32), k_steps))
                steps = samp["steps"] + k_steps * active.astype(jnp.int32)
                return (toks_buf, cache, counts, kv_lens, steps, None)
            toks_buf = jnp.zeros((k_steps, W), jnp.int32)
            lp_buf = jnp.zeros((k_steps, W), jnp.float32)
            tv_buf = jnp.zeros((k_steps, W, TOPLP), jnp.float32)
            ti_buf = jnp.zeros((k_steps, W, TOPLP), jnp.int32)
            steps = samp["steps"]
            kv_lens0 = kv_lens
            if use_pending:
                # [L, K, W, NKV, D] K-MAJOR: step i's write is then L
                # contiguous [W, NKV, D] slabs (the round-3 page-shaped
                # layout scattered 256B chunks at ~18 GB/s, ~0.45
                # ms/step at llama8b b64 K32). The kernel — which now
                # owns the merge — transposes its [K, S, NKV, D] block
                # back to page shape in VMEM, where the relayout is
                # ~free; round 3 couldn't use K-major because the merge
                # ran in XLA, whose einsums forced K-second-minor.
                pdt = jnp.int8 if quant_pending else buf_dtype
                k_bufs = jnp.zeros((L, k_steps, W, nkv, hd), pdt)
                v_bufs = jnp.zeros((L, k_steps, W, nkv, hd), pdt)
            else:
                k_bufs = v_bufs = jnp.zeros((), buf_dtype)
            if use_pending and quant_pending:
                ksc_bufs = jnp.zeros((L, k_steps, W, nkv), jnp.float32)
                vsc_bufs = jnp.zeros((L, k_steps, W, nkv), jnp.float32)
            else:
                ksc_bufs = vsc_bufs = jnp.zeros((), jnp.float32)

            def body(i, carry):
                # in pending mode the cache is NOT in the carry: the loop
                # reads it as an invariant (closure) — a carried multi-GB
                # buffer would be copied every iteration
                (toks_buf, lp_buf, tv_buf, ti_buf, tokens, cache_c, counts,
                 kv_lens, steps, k_bufs, v_bufs, ksc_bufs,
                 vsc_bufs) = carry
                if use_pending:
                    pending = ((k_bufs, v_bufs, i, ksc_bufs, vsc_bufs)
                               if quant_pending else (k_bufs, v_bufs, i))
                else:
                    pending = None
                (toks, new_cache, counts, kv_lens, steps, logits,
                 kv_news) = one_decode(
                    params, cache if use_pending else cache_c, counts,
                    tokens, kv_lens, block_tables,
                    active, samp, steps, rows, greedy_only, pending)
                if not use_pending:
                    cache_c = new_cache
                if use_pending and quant_pending:
                    from ..models.common import quantize_kv
                    kq_, ks_ = quantize_kv(kv_news[0])
                    vq_, vs_ = quantize_kv(kv_news[1])
                    k_bufs = jax.lax.dynamic_update_index_in_dim(
                        k_bufs, kq_, i, axis=1)
                    v_bufs = jax.lax.dynamic_update_index_in_dim(
                        v_bufs, vq_, i, axis=1)
                    ksc_bufs = jax.lax.dynamic_update_index_in_dim(
                        ksc_bufs, ks_, i, axis=1)
                    vsc_bufs = jax.lax.dynamic_update_index_in_dim(
                        vsc_bufs, vs_, i, axis=1)
                elif use_pending:
                    k_bufs = jax.lax.dynamic_update_index_in_dim(
                        k_bufs, kv_news[0].astype(buf_dtype), i, axis=1)
                    v_bufs = jax.lax.dynamic_update_index_in_dim(
                        v_bufs, kv_news[1].astype(buf_dtype), i, axis=1)
                toks_buf = jax.lax.dynamic_update_index_in_dim(
                    toks_buf, toks, i, axis=0)
                if want_logprobs:
                    from .sampling import top_logprobs
                    lp, tv, ti = top_logprobs(logits, toks, TOPLP)
                    lp_buf = jax.lax.dynamic_update_index_in_dim(
                        lp_buf, lp, i, axis=0)
                    tv_buf = jax.lax.dynamic_update_index_in_dim(
                        tv_buf, tv, i, axis=0)
                    ti_buf = jax.lax.dynamic_update_index_in_dim(
                        ti_buf, ti, i, axis=0)
                return (toks_buf, lp_buf, tv_buf, ti_buf, toks, cache_c,
                        counts, kv_lens, steps, k_bufs, v_bufs,
                        ksc_bufs, vsc_bufs)

            carry_cache = (jnp.zeros((), buf_dtype) if use_pending
                           else cache)
            (toks_buf, lp_buf, tv_buf, ti_buf, _, carry_cache, counts,
             kv_lens, steps, k_bufs, v_bufs, ksc_bufs,
             vsc_bufs) = jax.lax.fori_loop(
                0, k_steps, body,
                (toks_buf, lp_buf, tv_buf, ti_buf, tokens, carry_cache,
                 counts, kv_lens, steps, k_bufs, v_bufs, ksc_bufs,
                 vsc_bufs))
            if not use_pending:
                cache = carry_cache
            if use_pending:
                # one scatter for all K steps x all layers
                from ..models.common import write_kv_all_layers
                wpos = (kv_lens0[:, None]
                        + jnp.arange(k_steps, dtype=jnp.int32)[None, :])
                wattn = AttnInputs(
                    block_tables=block_tables, kv_lens=kv_lens,
                    positions=wpos,
                    write_mask=jnp.broadcast_to(active[:, None],
                                                (W, k_steps)))
                # K-major [L, K, W, NKV, D] -> per-token [L, W, K, NKV, D]
                cache = write_kv_all_layers(
                    cache, k_bufs.transpose(0, 2, 1, 3, 4),
                    v_bufs.transpose(0, 2, 1, 3, 4), wattn,
                    kv_scales=((ksc_bufs.transpose(0, 2, 1, 3),
                                vsc_bufs.transpose(0, 2, 1, 3))
                               if quant_pending else None))
            return (toks_buf, cache, counts, kv_lens, steps,
                    (lp_buf, tv_buf, ti_buf) if want_logprobs else None)

        # Pin the cache's boundary layout to row-major default on every
        # program that returns it. XLA's auto-layout otherwise picks a
        # different layout for the donated cache output than the input
        # arrived with, which (a) silently breaks donation — a full
        # pool-sized temp copy per call, enough to OOM an auto-sized pool
        # next to 8B params — and (b) inserts pool-sized relayout copies
        # between the prefill and decode programs (measured 18 ms/call at
        # a 4096-block pool).
        from jax.experimental.layout import Format, Layout

        def _dfmt(x):
            if x is None:
                return None
            return Format(Layout(tuple(range(x.ndim))), x.sharding)

        cache_fmt = KVCache(*[_dfmt(a) for a in self.cache])

        # the cache's layout must be pinned on BOTH sides of every
        # program boundary: out_shardings alone still lets XLA pick a
        # different INPUT layout for the next program's cache parameter,
        # and the runtime then inserts pool-sized relayout copies
        # between programs (round-4 prefill trace: 3 x ~3.3 ms copies
        # per prefill call at a 2.1 GB b64 pool, ~0.4 ms/step at
        # decode)
        # statics must pass POSITIONALLY: pjit rejects kwargs once
        # in_shardings is specified
        self._decode_fn = jax.jit(
            decode_multi, donate_argnums=(1, 2),
            static_argnums=(9, 10, 11, 12),
            in_shardings=(None, cache_fmt, None, None, None, None, None,
                          None, None),
            out_shardings=(None, cache_fmt, None, None, None, None))

        def prefill_step(params, cache, tokens, positions, block_tables,
                         kv_len, write_mask, last_idx):
            # tokens/positions/write_mask: [NP, bucket] — NP prompt chunks
            # share one program (and one weight read); last_idx [NP] picks
            # each row's final real token for its logits
            attn = AttnInputs(
                block_tables=block_tables, kv_lens=kv_len,
                positions=positions, write_mask=write_mask)
            hidden, cache = fwd(params, cfg, tokens, attn, cache,
                                attn_impl=impl)
            last_h = jnp.take_along_axis(
                hidden, last_idx[:, None, None], axis=1)[:, 0]  # [NP, H]
            return logits_fn(params, last_h), cache

        self._prefill_fn = jax.jit(
            prefill_step, donate_argnums=(1,),
            in_shardings=(None, cache_fmt, None, None, None, None, None,
                          None),
            out_shardings=(None, cache_fmt))

        def first_tokens(counts, logits, slots, samp_rows, mask):
            # logits [NP, V]; mask [NP] — rows whose prompt completed this
            # chunk (mid-prompt/padding rows sample nothing). Masked rows
            # index slot B => dropped scatter.
            slots_eff = jnp.where(mask, slots, counts.shape[0])
            counts = counts.at[slots_eff].set(0, mode="drop")
            toks = sample(
                logits, seeds=samp_rows["seeds"], steps=samp_rows["steps"],
                temperature=samp_rows["temperature"],
                top_k=samp_rows["top_k"], top_p=samp_rows["top_p"],
                min_p=samp_rows["min_p"])
            toks = jnp.where(mask, toks, 0)
            counts = counts.at[slots_eff, toks].add(1, mode="drop")
            return toks, counts

        self._first_tokens_fn = jax.jit(first_tokens, donate_argnums=(0,))

        # snapshot: positions/draft widths are baked into the traced
        # program at build time; econfig.num_speculative_tokens > 0 is
        # treated purely as the runtime on/off switch (bench toggles it),
        # and _run_spec_decode validates any nonzero runtime value
        # against this snapshot instead of re-reading it per step.
        K_spec = self._K_spec_built = self.econfig.num_speculative_tokens
        # engine-level speculative THROUGHPUT gate (round 5): acceptance
        # cooldowns can't catch the regime where the spec round itself is
        # slower than fused plain decode — a spec round is one dispatch
        # per ~acc+1 tokens/row while plain fuses K steps per dispatch,
        # so high per-dispatch overhead (e.g. a remote tunnel) can make
        # 4+-token acceptance STILL lose (measured 0.64x at b8 greedy on
        # the tunneled bench chip). The engine probes both modes by wall
        # clock and runs the faster, re-probing periodically.
        self._spec_clock = {"phase": "spec_probe", "left": 6,
                            "spec_rate": None, "plain_rate": None,
                            "spec_probe": 6, "plain_probe": 2,
                            "hold": 64}
        if K_spec > 0:
            T = K_spec + 1

            def spec_step(params, cache, counts, tokens, kv_lens, bt,
                          active, samp, rows, spec_ok):
                """One speculative round: verify K drafts in ONE forward,
                PER-REQUEST (round 5 — the round-4 version was greedy-only
                and batch-global: one sampled request disabled speculation
                for the entire batch).

                tokens [W, T] = (carry token t0, drafts d1..dK); like
                decode's new token, t0's KV is not in the cache yet. The
                chunked-prefill forward (causal in-chunk + cached prefix)
                writes ALL T tokens' KV optimistically — rejected drafts'
                slots sit BEYOND the committed kv_len, are never read
                (attention masks at kv_len), and the next round's writes
                overwrite them.

                Per-row verification (spec_ok [W] marks rows allowed to
                speculate — no penalties, and either greedy or
                pure-temperature sampling):
                - greedy rows: argmax at position i is the model's true
                  token after t0..d_i, so accepted prefix + the model's
                  own next token (`bonus`) is BIT-IDENTICAL to plain
                  greedy decode.
                - sampled rows: rejection sampling against the point-mass
                  n-gram draft (the vllm-openai v0.9.1 [ngram] contract).
                  Draft d_i is accepted iff u_i < p_i(d_i) where p_i is
                  the temperature-scaled target distribution; on the
                  first rejection the bonus is drawn from the residual —
                  for a point-mass proposal that is exactly p_i with
                  d_i's mass removed (Gumbel-argmax over the masked
                  logits). The emitted distribution equals plain
                  temperature sampling EXACTLY (standard speculative
                  sampling correctness), though the realized draws
                  differ (different randomness consumption). Acceptance
                  uniforms come from a salted fold of the same
                  per-request stream so they are independent of the
                  bonus Gumbel draw at the same step index.
                - rows with penalties or truncation filters (top-k/p,
                  min-p): spec_ok is False — they ride the same program
                  as plain 1-token decode rows (acc pinned to 0, the
                  bonus sampled through the full penalty+filter sampler)
                  so a mixed batch never blocks the speculating rows.
                """
                W = tokens.shape[0]
                positions = (kv_lens[:, None]
                             + jnp.arange(T, dtype=jnp.int32)[None, :])
                wm = jnp.broadcast_to(active[:, None], tokens.shape)
                attn = AttnInputs(
                    block_tables=bt,
                    kv_lens=kv_lens + T * active.astype(jnp.int32),
                    positions=positions, write_mask=wm)
                hidden, cache = fwd(params, cfg, tokens, attn, cache,
                                    attn_impl=impl)
                h = hidden.reshape(W * T, -1)
                logits = logits_fn(params, h).reshape(W, T, -1)
                drafts = tokens[:, 1:]                     # [W, K]
                greedy_row = samp["temperature"] <= 0.0
                steps0 = samp["steps"]

                acc, bonus_logits = speculative_verify(
                    logits, drafts, seeds=samp["seeds"], steps=steps0,
                    temperature=samp["temperature"],
                    greedy_row=greedy_row, spec_ok=spec_ok)

                # plain rows (acc == 0): position-0 logits through the
                # full penalty path, filters handled inside sample()
                logits0 = apply_penalties(
                    logits[:, 0], counts[rows], samp["presence"],
                    samp["frequency"], samp["repetition"])
                logits_fin = jnp.where(spec_ok[:, None], bonus_logits,
                                       logits0)
                bonus = sample(
                    logits_fin, seeds=samp["seeds"], steps=steps0 + acc,
                    temperature=samp["temperature"], top_k=samp["top_k"],
                    top_p=samp["top_p"], min_p=samp["min_p"])

                k_ar = jnp.arange(K_spec, dtype=jnp.int32)[None, :]
                emit = jnp.concatenate(
                    [jnp.where(k_ar < acc[:, None], drafts, 0),
                     jnp.zeros((W, 1), jnp.int32)], axis=1)
                emit = emit.at[jnp.arange(W), acc].set(bonus)  # [W, T]
                n_emit = jnp.where(active, acc + 1, 0).astype(jnp.int32)

                # penalty counts see every emitted token (masked slots
                # scatter to index V => dropped)
                emit_pos = jnp.arange(T, dtype=jnp.int32)[None, :]
                emitted = emit_pos < n_emit[:, None]       # [W, T]
                tok_idx = jnp.where(emitted, emit, counts.shape[1])
                counts = counts.at[rows[:, None], tok_idx].add(
                    emitted.astype(jnp.int32), mode="drop")
                return (emit, n_emit, kv_lens + n_emit, cache, counts,
                        steps0 + n_emit)

            self._spec_fn = jax.jit(
                spec_step, donate_argnums=(1, 2),
                in_shardings=(None, cache_fmt, None, None, None, None,
                              None, None, None, None),
                out_shardings=(None, None, None, cache_fmt, None, None))

    # ------------------------------------------------------------- admission

    def add_request(self, prompt_token_ids: Sequence[int],
                    sampling: Optional[SamplingParams] = None,
                    priority: str = "medium",
                    request_id: Optional[str] = None) -> str:
        req = Request(prompt_token_ids=list(prompt_token_ids),
                      sampling=sampling or SamplingParams(),
                      priority=priority,
                      request_id=request_id or "")
        self.scheduler.add(req)
        self._requests[req.request_id] = req
        return req.request_id

    def abort_request(self, request_id: str) -> bool:
        return self.scheduler.abort(request_id)

    def has_unfinished(self) -> bool:
        return self.scheduler.has_work()

    # ------------------------------------------------------------- execution

    def step(self) -> List[RequestOutput]:
        plan = self.scheduler.schedule()
        self.metrics["preemptions"] += len(plan.preempted)
        self.metrics["waiting_evictions"] = \
            self.scheduler.num_waiting_evictions
        for req in plan.preempted:
            self._release_slot_state(req)
        outputs: List[RequestOutput] = []
        t0 = time.perf_counter()
        if plan.prefill is not None:
            self.metrics["num_prefill_steps"] += 1
            outputs.extend(self._run_prefill(plan.prefill))
            self._ema("prefill_step_ms_ema", (time.perf_counter() - t0) * 1e3)
        elif plan.decode is not None:
            self.metrics["num_decode_steps"] += 1
            outputs.extend(self._run_decode(plan.decode))
            self._ema("decode_step_ms_ema", (time.perf_counter() - t0) * 1e3)
        self.metrics["num_steps"] += 1
        return outputs

    def _ema(self, key: str, val: float, alpha: float = 0.1) -> None:
        prev = self.metrics[key]
        self.metrics[key] = val if prev == 0.0 else (1 - alpha) * prev \
            + alpha * val

    def _release_slot_state(self, req: Request) -> None:
        # slot was already freed by the scheduler; clear host mirrors lazily
        for s, r in enumerate(self._slot_req):
            if r is req:
                self._slot_req[s] = None
                self._active[s] = False
                self._bt_len[s] = 0
                self._dev = None

    def _run_prefill(self, plan) -> List[RequestOutput]:
        reqs, bucket = plan.requests, plan.bucket
        n = len(reqs)
        NP = 1
        while NP < n:
            NP *= 2
        tokens = np.zeros((NP, bucket), dtype=np.int32)
        positions = np.zeros((NP, bucket), dtype=np.int32)
        bt = np.zeros((NP, self._MB), dtype=np.int32)
        write_mask = np.zeros((NP, bucket), dtype=bool)
        kv_len = np.zeros((NP,), dtype=np.int32)
        last_idx = np.zeros((NP,), dtype=np.int32)
        for i, (req, start, length) in enumerate(
                zip(reqs, plan.starts, plan.lengths)):
            tokens[i, :length] = req.prompt_token_ids[start:start + length]
            positions[i] = start + np.arange(bucket, dtype=np.int32)
            bt[i, :len(req.block_ids)] = req.block_ids
            write_mask[i, :length] = True
            kv_len[i] = start + length
            last_idx[i] = length - 1

        logits, self.cache = self._prefill_fn(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(positions), jnp.asarray(bt), jnp.asarray(kv_len),
            jnp.asarray(write_mask), jnp.asarray(last_idx))

        finishing: List[int] = []
        for i, req in enumerate(reqs):
            self.scheduler.on_prefill_progress(req, plan.lengths[i])
            if req.prefill_done:
                finishing.append(i)
        if not finishing:
            return []

        # final chunks: sample each row's first generated token (one
        # batched sampler call for the whole program)
        for i in finishing:
            req = reqs[i]
            slot = req.slot
            assert slot is not None
            s = req.sampling
            # crc32, NOT hash(): str hashing is salted per process, which
            # would diverge sampling seeds across hosts running the same
            # SPMD schedule (multi-host decode must be deterministic)
            import zlib
            self._samp["seeds"][slot] = (
                s.seed if s.seed is not None
                else (zlib.crc32(req.request_id.encode()) & 0x7FFFFFFF))
            # resume the per-request sampling stream where it left off:
            # a preempted-and-recomputed request has already generated
            # num_generated tokens (0 for a fresh request)
            self._samp["steps"][slot] = req.num_generated
            self._samp["temperature"][slot] = s.temperature
            self._samp["top_k"][slot] = s.top_k
            self._samp["top_p"][slot] = s.top_p
            self._samp["min_p"][slot] = s.min_p
            self._samp["presence"][slot] = s.presence_penalty
            self._samp["frequency"][slot] = s.frequency_penalty
            self._samp["repetition"][slot] = s.repetition_penalty

        mask = np.zeros((NP,), dtype=bool)
        slots_full = np.zeros((NP,), dtype=np.int32)
        for i in finishing:
            mask[i] = True
            slots_full[i] = reqs[i].slot
        samp_rows = {k: jnp.asarray(v[slots_full])
                     for k, v in self._samp.items()}
        toks, self._counts = self._first_tokens_fn(
            self._counts, logits, jnp.asarray(slots_full), samp_rows,
            jnp.asarray(mask))
        toks_host = np.asarray(toks)

        outputs: List[RequestOutput] = []
        now = time.monotonic()
        for i in finishing:
            req = reqs[i]
            slot = req.slot
            tok = int(toks_host[i])
            if req.first_token_time is None:   # TTFT = first EVER token
                req.first_token_time = now
            req.output_token_ids.append(tok)
            self._samp["steps"][slot] = req.num_generated
            if req.sampling.logprobs is not None:
                from .sampling import top_logprobs
                lp, tv, ti = jax.jit(top_logprobs, static_argnums=2)(
                    logits[i][None], jnp.asarray([tok], jnp.int32), 5)
                req.logprob_data.append({
                    "logprob": float(lp[0]),
                    "top": list(zip([int(t) for t in np.asarray(ti[0])],
                                    [float(v) for v in np.asarray(tv[0])]))})
            self.metrics["generated_tokens"] += 1
            self._slot_req[slot] = req
            self._active[slot] = True
            self._bt[slot, :] = 0
            self._bt[slot, :len(req.block_ids)] = req.block_ids
            self._bt_len[slot] = len(req.block_ids)
            self._kv_lens[slot] = req.num_prompt_tokens
            self._last[slot] = tok
            outputs.append(self._emit(req, [tok]))
        self._dev = None
        return outputs

    def _upload_dev_state(self) -> None:
        active_slots = [s for s in range(self._B) if self._active[s]]
        greedy = all(self._samp["temperature"][s] == 0.0
                     for s in active_slots)
        # decode width bucket: compact active slots into a pow2-wide
        # batch (min 8) so one active request doesn't pay a
        # max_num_seqs-wide decode step; padding rows reuse slot 0 with
        # active=False (writes dropped, samples ignored). Pipeline
        # parallelism keeps the full width (microbatches split the
        # whole batch).
        W = 8
        n = max(len(active_slots), 1)
        while W < n:
            W *= 2
        W = min(W, self._B)
        if self.econfig.pipeline_parallel_size > 1:
            W = self._B
        rows = np.asarray((active_slots + [0] * W)[:W], np.int32)
        act = np.zeros((W,), bool)
        act[:min(len(active_slots), W)] = True
        self._dev = {
            "rows": rows,
            "row_of": {int(s): i for i, s in enumerate(rows)
                       if act[i]},
            "tokens": jnp.asarray(self._last[rows]),
            "kv_lens": jnp.asarray(self._kv_lens[rows]),
            "bt": jnp.asarray(self._bt[rows]),
            "active": jnp.asarray(act),
            "samp": {k: jnp.asarray(v[rows])
                     for k, v in self._samp.items()},
            "greedy": greedy,
        }

    def _run_decode(self, plan) -> List[RequestOutput]:
        # refresh block tables (scheduler may have appended blocks)
        for req in plan.requests:
            s = req.slot
            if len(req.block_ids) != self._bt_len[s] or req.bt_dirty:
                self._bt[s, :len(req.block_ids)] = req.block_ids
                self._bt_len[s] = len(req.block_ids)
                req.bt_dirty = False
                self._dev = None
        if self._dev is None:
            self._upload_dev_state()
        dev = self._dev

        if self.econfig.num_speculative_tokens > 0 and self._K_spec_built > 0:
            # per-request eligibility (round 5): a round runs whenever ANY
            # row can speculate; ineligible rows ride the same program as
            # plain 1-token decode rows. Only logprobs stays a
            # batch-global disqualifier (the spec program doesn't return
            # top-logprob tensors). Adaptive gating: rows in acceptance
            # cooldown don't draft (and don't trigger rounds) — a spec
            # round emits acc+1 tokens per DISPATCH, so zero-acceptance
            # rows are strictly faster on fused plain decode.
            eligible = (
                not any(r.sampling.logprobs is not None
                        for r in plan.requests)
                and any(self._spec_eligible(r.sampling)
                        and r.spec_cooldown <= 0
                        for r in plan.requests))
            if eligible and self._spec_gate_allows():
                t0 = time.perf_counter()
                emitted0 = self.metrics["spec_emitted"]
                outs = self._run_spec_decode(plan)
                self._spec_gate_record(
                    "spec", time.perf_counter() - t0,
                    self.metrics["spec_emitted"] - emitted0)
                return outs
            plain_t0 = time.perf_counter() if eligible else None
        else:
            plain_t0 = None

        K = self.econfig.decode_steps_per_call
        if self.scheduler.num_waiting and self.econfig.max_consecutive_prefills:
            # prompts are queued: a full K-step fusion would hold the
            # device for K x step_ms before the next prefill gets a turn
            # (round 2: 32 x 17.7 ms = 566 ms TTFT stalls); shorten the
            # fusion while mixing, return to full fusion at steady state
            K = max(min(K, self.econfig.mixed_decode_steps), 1)
        want_lp = any(r.sampling.logprobs is not None
                      for r in plan.requests)
        # context bucket: pow2 block-table width covering every active
        # sequence's context + this call's K new tokens
        bs = self.econfig.block_size
        max_len = int(self._kv_lens[self._active].max()) + K \
            if self._active.any() else K
        mb_need = max(-(-max_len // bs), 1)
        mbk = 1
        while mbk < mb_need:
            mbk *= 2
        mbk = min(mbk, self._MB)
        (toks_buf, self.cache, self._counts, new_kv_lens, new_steps,
         lp_bufs) = self._decode_fn(
            self.params, self.cache, self._counts,
            dev["tokens"], dev["kv_lens"], dev["bt"],
            dev["active"], dev["samp"], jnp.asarray(dev["rows"]),
            dev["greedy"], K, want_lp, mbk)
        # device state advances in place; host mirrors track it
        dev["tokens"] = toks_buf[K - 1]
        dev["kv_lens"] = new_kv_lens
        dev["samp"]["steps"] = new_steps
        toks_host = np.asarray(jax.device_get(toks_buf))  # [K, B]
        lp_host = (jax.device_get(lp_bufs) if want_lp else None)

        outputs = []
        row_of = dev["row_of"]
        for req in plan.requests:
            s = req.slot
            r = row_of[s]
            self._kv_lens[s] += K
            self._last[s] = int(toks_host[K - 1, r])
            self._samp["steps"][s] += K
            if req.spec_cooldown > 0:
                req.spec_cooldown -= K
            if want_lp and req.sampling.logprobs is not None:
                lp, tv, ti = lp_host
                for i in range(K):
                    req.logprob_data.append({
                        "logprob": float(lp[i, r]),
                        "top": list(zip(
                            [int(t) for t in ti[i, r]],
                            [float(v) for v in tv[i, r]]))})
            outputs.append(self._apply_decode_tokens(
                req, [int(t) for t in toks_host[:, r]]))
        if plain_t0 is not None:
            self._spec_gate_record(
                "plain", time.perf_counter() - plain_t0,
                K * int(np.asarray(dev["active"]).sum()))
        return outputs

    @staticmethod
    def _draft_ngram(history: np.ndarray, k: int) -> np.ndarray:
        """Propose k draft tokens by bigram lookup (vLLM's [ngram]
        speculator): find the most recent earlier occurrence of the last
        two tokens and copy the k tokens that followed; pad / fall back
        by repeating the last token (cheap, and exact for the repetition
        loops greedy decoding falls into)."""
        n = history.shape[0]
        out = np.full((k,), history[-1] if n else 0, np.int32)
        if n >= 3:
            a, b = history[-2], history[-1]
            hits = np.where((history[:-2] == a) & (history[1:-1] == b))[0]
            if hits.size:
                start = int(hits[-1]) + 2
                cont = history[start:start + k]
                out[:cont.shape[0]] = cont
        return out

    @staticmethod
    def _spec_eligible(s: SamplingParams) -> bool:
        """Rows that may speculate: no penalties, and either greedy or
        PURE temperature sampling. Truncation filters (top-k/top-p/min-p)
        would need the rejection test run against the FILTERED target
        distribution to stay exact — those rows run as plain decode rows
        inside the spec round instead."""
        return (s.presence_penalty == 0.0 and s.frequency_penalty == 0.0
                and s.repetition_penalty == 1.0
                and (s.temperature == 0.0
                     or (s.top_k <= 0 and s.top_p >= 1.0
                         and s.min_p == 0.0)))

    def _spec_gate_allows(self) -> bool:
        if not self.econfig.spec_throughput_gate:
            return True
        return self._spec_clock["phase"] in ("spec_probe", "spec")

    def _spec_gate_record(self, mode: str, dt: float, ntoks: int) -> None:
        """Feed one timed decode call into the throughput gate.

        Phases: spec_probe (N spec rounds) -> plain_probe (M fused
        calls) -> spec|plain held for `hold` calls -> re-probe. Rates
        are tokens/wall-second EMAs; spec wins only with a 5% margin."""
        if not self.econfig.spec_throughput_gate:
            return
        g = self._spec_clock
        if ntoks > 0 and dt > 0:
            rate = ntoks / dt
            ema = g[mode + "_rate"]
            g[mode + "_rate"] = (rate if ema is None
                                 else 0.5 * ema + 0.5 * rate)
        g["left"] -= 1
        if g["left"] > 0:
            return
        if g["phase"] == "spec_probe":
            g["phase"], g["left"] = "plain_probe", g["plain_probe"]
        elif g["phase"] == "plain_probe":
            sr, pr = g["spec_rate"], g["plain_rate"]
            if sr is not None and pr is not None and sr > 1.05 * pr:
                g["phase"], g["left"] = "spec", g["hold"]
            else:
                g["phase"], g["left"] = "plain", g["hold"]
        else:
            g["phase"], g["left"] = "spec_probe", g["spec_probe"]
            g["spec_rate"] = g["plain_rate"] = None
        self.metrics["spec_gate_phase"] = g["phase"]

    def _run_spec_decode(self, plan) -> List[RequestOutput]:
        """One speculative round (per-request; see spec_step)."""
        dev = self._dev
        K_spec = self._K_spec_built
        if self.econfig.num_speculative_tokens != K_spec:
            raise ValueError(
                f"num_speculative_tokens changed at runtime "
                f"({self.econfig.num_speculative_tokens} != built "
                f"{K_spec}); it can only be toggled 0 <-> {K_spec}")
        T = K_spec + 1
        W = len(dev["rows"])
        row_of = dev["row_of"]
        tok_mat = np.zeros((W, T), np.int32)
        spec_ok = np.zeros((W,), bool)
        for req in plan.requests:
            r = row_of[req.slot]
            tok_mat[r, 0] = self._last[req.slot]
            if self._spec_eligible(req.sampling) and req.spec_cooldown <= 0:
                spec_ok[r] = True
                hist = np.asarray(
                    req.prompt_token_ids + req.output_token_ids, np.int32)
                tok_mat[r, 1:] = self._draft_ngram(hist, K_spec)
            else:
                tok_mat[r, 1:] = tok_mat[r, 0]  # ignored (acc pinned 0)
        (emit, n_emit, new_kv, self.cache, self._counts,
         new_steps) = self._spec_fn(
            self.params, self.cache, self._counts, jnp.asarray(tok_mat),
            dev["kv_lens"], dev["bt"], dev["active"], dev["samp"],
            jnp.asarray(dev["rows"]), jnp.asarray(spec_ok))
        dev["kv_lens"] = new_kv
        dev["samp"]["steps"] = new_steps
        emit_h = np.asarray(jax.device_get(emit))
        n_h = np.asarray(jax.device_get(n_emit))
        outputs = []
        # one ROUND per call (round 4 counted request-rounds: inflated
        # batch-fold, and bench's tokens/round silently became a
        # per-sequence average)
        self.metrics["spec_rounds"] += 1
        self.metrics["spec_seq_rounds"] += int(spec_ok.sum())
        min_acc = self.econfig.spec_min_accept
        for req in plan.requests:
            s = req.slot
            r = row_of[s]
            k = int(n_h[r])
            toks = [int(t) for t in emit_h[r, :k]]
            self._kv_lens[s] += k
            self._last[s] = toks[-1]
            self._samp["steps"][s] += k
            self.metrics["spec_emitted"] += k
            if spec_ok[r]:
                self.metrics["spec_row_emitted"] += k
            if spec_ok[r] and min_acc > 0.0:
                rate = (k - 1) / K_spec
                req.spec_accept_ema = (0.5 * req.spec_accept_ema
                                       + 0.5 * rate)
                if req.spec_accept_ema < min_acc:
                    # stop drafting; re-probe after spec_probe_tokens
                    # emitted tokens with a fresh optimistic EMA
                    req.spec_cooldown = self.econfig.spec_probe_tokens
                    req.spec_accept_ema = 1.0
            elif req.spec_cooldown > 0:
                req.spec_cooldown -= k
            outputs.append(self._apply_decode_tokens(req, toks))
        dev["tokens"] = jnp.asarray(self._last[dev["rows"]])
        return outputs

    def _apply_decode_tokens(self, req: Request,
                             candidates: List[int]) -> RequestOutput:
        """Append up to K sampled tokens, truncating at the first stop
        condition (multi-step overshoot past a stop is discarded)."""
        applied: List[int] = []
        status = None
        for tok in candidates:
            req.output_token_ids.append(tok)
            applied.append(tok)
            self.metrics["generated_tokens"] += 1
            status = self._stop_status(req)
            if status is not None:
                break
        # drop logprob entries for discarded overshoot tokens (indexing
        # by the GENERATED count — entries for tokens a preemption folded
        # into the prompt are retained)
        if req.logprob_data:
            req.logprob_data = req.logprob_data[:req.num_generated]
        return self._finalize_output(req, applied, status)

    # -------------------------------------------------------------- scoring

    def score(self, prompt_ids: Sequence[int]) -> List[Optional[float]]:
        """Teacher-forced per-token logprobs of a prompt (OpenAI
        echo+logprobs / loglikelihood scoring). Independent of the serving
        cache; one compiled program per length bucket."""
        T = len(prompt_ids)
        if T < 2:
            return [None] * T
        bucket = next((b for b in self.econfig.prefill_buckets if T <= b),
                      None)
        if bucket is None:
            if T > self.econfig.max_model_len:
                raise ValueError(f"prompt length {T} > max_model_len")
            bucket = self.econfig.max_model_len
        fn = self._score_fns.get(bucket)
        if fn is None:
            fn = self._build_score_fn(bucket)
            self._score_fns[bucket] = fn
        padded = np.zeros((1, bucket), dtype=np.int32)
        padded[0, :T] = prompt_ids
        lps = np.asarray(fn(self.params, jnp.asarray(padded), T))
        return [None] + [float(x) for x in lps[:T - 1]]

    def _build_score_fn(self, bucket: int):
        cfg, e = self.model_cfg, self.econfig
        bs = e.block_size
        mb = -(-bucket // bs)
        fam = self.family
        fwd = self._fwd

        def score_fn(params, tokens, length):
            cache = init_kv_cache(cfg, mb + 1, bs, dtype=e.kv_jnp_dtype())
            attn = AttnInputs(
                block_tables=jnp.arange(1, mb + 1, dtype=jnp.int32)[None, :],
                kv_lens=jnp.asarray([length], jnp.int32),
                positions=jnp.arange(bucket, dtype=jnp.int32)[None, :],
                write_mask=(jnp.arange(bucket) < length)[None, :])
            hidden, _ = fwd(params, cfg, tokens, attn, cache,
                            attn_impl=self.attn_impl)
            logits = fam.logits_from_hidden(params, hidden)[0]
            logp = jax.nn.log_softmax(logits[:-1], axis=-1)
            tgt = tokens[0, 1:]
            return jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]

        return jax.jit(score_fn)

    # ----------------------------------------------------------- termination

    def _stop_status(self, req: Request) -> Optional[RequestStatus]:
        tok = req.output_token_ids[-1]
        s = req.sampling
        eos = set(self.model_cfg.eos_token_ids) | set(s.stop_token_ids)
        if self.tokenizer is not None and self.tokenizer.eos_token_id is not None:
            eos.add(self.tokenizer.eos_token_id)
        if not s.ignore_eos and tok in eos:
            return RequestStatus.FINISHED_STOPPED
        # num_generated, NOT len(output_token_ids): preemption folds
        # generated tokens into the prompt, which must not restart the
        # max_tokens budget
        if req.num_generated >= s.max_tokens:
            return RequestStatus.FINISHED_LENGTH
        if req.num_tokens >= self.econfig.max_model_len:
            return RequestStatus.FINISHED_LENGTH
        return None

    def _emit(self, req: Request, new_tokens: List[int]) -> RequestOutput:
        return self._finalize_output(req, new_tokens, self._stop_status(req))

    def _finalize_output(self, req: Request, new_tokens: List[int],
                         status) -> RequestOutput:
        if status is not None:
            slot = req.slot
            self.scheduler.finish(req, status)
            if slot is not None:
                self._active[slot] = False
                self._slot_req[slot] = None
                self._bt_len[slot] = 0
                self._dev = None
            del self._requests[req.request_id]
        lp_entries = None
        if req.sampling.logprobs is not None and req.logprob_data:
            n_out = req.num_generated
            lp_entries = req.logprob_data[n_out - len(new_tokens):n_out]
        return RequestOutput(
            request_id=req.request_id,
            new_token_ids=new_tokens,
            # user-visible view: all generated tokens, including any a
            # preemption folded into the recompute prompt
            output_token_ids=list(req.generated_token_ids),
            finished=status is not None,
            finish_reason=status.finish_reason if status else None,
            num_prompt_tokens=req.orig_prompt_len,
            logprobs=lp_entries,
            ttft=(req.first_token_time - req.arrival_time
                  if req.first_token_time else None),
            latency=(req.finish_time - req.arrival_time
                     if req.finish_time else None),
        )

    # ------------------------------------------------------------ convenience

    def generate(self, prompts: Sequence[Sequence[int]],
                 sampling: Optional[SamplingParams] = None,
                 priority: str = "medium") -> List[RequestOutput]:
        """Blocking batch generation; returns final outputs in prompt order."""
        ids = [self.add_request(p, sampling, priority) for p in prompts]
        finals: Dict[str, RequestOutput] = {}
        while self.has_unfinished():
            for out in self.step():
                if out.finished:
                    finals[out.request_id] = out
        return [finals[i] for i in ids]

    def stats(self) -> dict:
        out = {
            **self.metrics,
            "num_waiting": self.scheduler.num_waiting,
            "num_running": self.scheduler.num_running,
            "kv_blocks_total": self.allocator.num_blocks,
            "kv_blocks_free": self.allocator.num_free,
            "kv_occupancy": 1.0 - self.allocator.num_free
                            / max(self.allocator.num_blocks - 1, 1),
        }
        if hasattr(self.allocator, "stats"):
            out.update(self.allocator.stats())
        return out
