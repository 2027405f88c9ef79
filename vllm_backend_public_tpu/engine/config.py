"""Engine configuration.

Single typed config covering the engine surface the reference exposes as
vLLM CLI passthrough (reference: benchmark-vllm/models.py:5-31 VLLMConfig —
model, gpu_memory_utilization, max_num_seqs, block_size, tensor/pipeline
parallel size, dtype, quantization, max_model_len, served_model_name,
additional_args), retargeted to TPU: mesh axes replace NCCL world sizes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class EngineConfig:
    model: str = ""                      # path to HF model dir (or logical name)
    served_model_name: Optional[str] = None
    dtype: str = "bfloat16"              # "bfloat16" | "float32"
    quantization: Optional[str] = None   # None|"int8"|"fp8"|"w8a8"|"int4"
    kv_cache_dtype: Optional[str] = None  # None (=dtype) | "int8" | "fp8"

    # KV cache / batching (names match the reference's flag surface).
    # 64-token pages measured best on v5e (fewer attention-kernel grid
    # steps than 16 — see ARCHITECTURE.md; 128 is marginally faster for
    # decode but halves prefix-cache hit granularity)
    block_size: int = 64                 # tokens per KV block
    max_num_seqs: int = 8                # decode batch width
    max_model_len: int = 2048            # max context length per sequence
    max_num_batched_tokens: int = 512    # prefill chunk budget per step
    hbm_utilization: float = 0.9         # analog of gpu_memory_utilization
    num_kv_blocks: Optional[int] = None  # explicit override (tests)

    # Parallelism (mesh axes, not NCCL ranks)
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    expert_parallel_size: int = 1
    # microbatches in flight per pipelined step (0 = one per stage);
    # per-step stage utilization is M/(M+S-1), so more is better up to
    # max_num_seqs (parallel/pipeline.py)
    pipeline_microbatches: int = 0

    # Execution
    attn_impl: str = "auto"              # "auto"|"xla"|"pallas"
    enforce_eager: bool = False          # parity flag; jit is always used
    seed: int = 0
    # decode steps fused per device dispatch (multi-step decode): higher
    # amortizes host<->device latency; tokens stream in K-sized chunks.
    decode_steps_per_call: int = 1
    # mixed continuous batching: at most this many consecutive prefill
    # chunks while sequences are decoding, so a long prompt's chunks
    # can't starve running decodes (bounds ITL p99 by ~N chunk times;
    # the reference's engine contract is vLLM's --max-num-seqs
    # continuous batching, reference models.py:9). 0 = legacy
    # prefill-first behavior.
    max_consecutive_prefills: int = 2
    # prompts packed into ONE prefill program (pow2-padded row count).
    # Batching amortizes the program's full weight read + dispatch over
    # several prompts; the token budget is still max_num_batched_tokens.
    max_prefill_seqs: int = 8
    # decode steps fused per dispatch WHILE prompts are waiting: a full
    # decode_steps_per_call fusion (e.g. 32 x 17.7 ms) holds the device
    # for half a second before the next prefill can run — the other half
    # of round 2's 11.4 s TTFT p50. Smaller fusions interleave tighter;
    # steady state (no waiting work) keeps the full fusion.
    mixed_decode_steps: int = 4
    # speculative decoding (vLLM --num-speculative-tokens): draft K
    # tokens per round with the host-side n-gram drafter and verify all
    # K+1 positions in ONE chunked forward; greedy outputs are
    # bit-identical to non-speculative decode (engine/engine.py
    # _run_spec_decode). 0 disables. Non-greedy/penalized/logprobs
    # requests fall back to normal multi-step decode.
    num_speculative_tokens: int = 0
    # adaptive per-request speculation gating: a row whose acceptance-
    # rate EMA falls below spec_min_accept stops drafting (it costs a
    # whole verify round to emit 1 token) and re-probes after
    # spec_probe_tokens emitted tokens — unstructured text has ~zero
    # n-gram acceptance, and a batch of such rows is strictly faster on
    # fused plain decode. 0.0 disables gating (always speculate). Probe
    # spacing trades recovery latency against probe cost: a probe round
    # costs one full dispatch (the dominant spec cost on a
    # remote-tunneled chip); at 256 tokens between probes that is ~1
    # round per 8 fused 32-step decode calls.
    spec_min_accept: float = 0.1
    spec_probe_tokens: int = 256
    # engine-level throughput gate: probe spec-round vs fused-plain
    # wall rates and run the faster (see engine._spec_gate_record).
    # Disable to measure the raw speculative path (bench --spec does).
    spec_throughput_gate: bool = True
    # automatic prefix caching (needs the native allocator's radix cache)
    enable_prefix_caching: bool = True
    # shortest-first prefill packing fairness bound: within one priority
    # class the scheduler admits the smallest-bucket chunk group first
    # (one 4k prompt at the head otherwise blocks every short prompt
    # behind it for its whole chunked prefill — measured 8.1 s mixed
    # TTFT p99 in round 4, pure queueing); a request overtaken this many
    # prefill programs is served strictly FIFO so long prompts cannot
    # starve. 0 disables overtaking (plain priority-FIFO packing).
    prefill_aging_limit: int = 8

    # Prefill sequence-length buckets (powers of two generated up to max)
    prefill_buckets: tuple = ()

    additional_args: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.served_model_name:
            self.served_model_name = self.model.rstrip("/").split("/")[-1]
        if not self.prefill_buckets:
            buckets = []
            b = 16
            while b < min(self.max_num_batched_tokens, self.max_model_len):
                buckets.append(b)
                b *= 2
            buckets.append(min(self.max_num_batched_tokens, self.max_model_len))
            self.prefill_buckets = tuple(buckets)
        if self.kv_cache_dtype in (None, "auto"):
            self.kv_cache_dtype = self.dtype

    @property
    def max_blocks_per_seq(self) -> int:
        return (self.max_model_len + self.block_size - 1) // self.block_size

    def jnp_dtype(self):
        import jax.numpy as jnp
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                "float16": jnp.float16}[self.dtype]

    def kv_jnp_dtype(self):
        import jax.numpy as jnp
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                "float16": jnp.float16, "int8": jnp.int8,
                "fp8": jnp.float8_e4m3fn}[self.kv_cache_dtype]

    def matches(self, other: "EngineConfig") -> bool:
        """Config-equality for deployment reuse (reference:
        benchmark-vllm/models.py:37-55 VLLMConfig.matches_config)."""
        keys = ("model", "dtype", "quantization", "block_size", "max_num_seqs",
                "max_model_len", "tensor_parallel_size", "data_parallel_size",
                "pipeline_parallel_size", "expert_parallel_size")
        return all(getattr(self, k) == getattr(other, k) for k in keys)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        extra = {k: v for k, v in d.items() if k not in known}
        kw: dict[str, Any] = {k: v for k, v in d.items() if k in known}
        if extra:
            kw.setdefault("additional_args", {}).update(extra)
        if "prefill_buckets" in kw and kw["prefill_buckets"]:
            kw["prefill_buckets"] = tuple(kw["prefill_buckets"])
        return cls(**kw)
