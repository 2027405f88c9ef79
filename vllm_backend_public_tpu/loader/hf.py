"""HF model-directory parsing: config.json -> ModelConfig.

The reference system only passes a model *name* to vLLM
(reference: benchmark-vllm/vllm_templates.py:50-52, models.py:6); the engine
it deploys resolves architecture from the HF config. We do the same here,
natively: parse config.json into a typed ModelConfig that the JAX models
consume.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters, normalized across model families."""

    arch: str  # "llama" | "qwen2" | "gpt2" | "mixtral"
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    qkv_bias: bool = False  # qwen2 uses attention bias
    activation: str = "silu"  # "silu" (llama-family) | "gelu_new" (gpt2)
    # MoE (mixtral)
    num_experts: int = 0
    experts_per_token: int = 0
    # gpt2 family
    layer_norm_eps: float = 1e-5
    # sliding-window attention (Mistral-style): a query at position p
    # attends keys at positions (p - sliding_window, p]; None = full
    sliding_window: Optional[int] = None
    # bos/eos for generation control
    bos_token_id: Optional[int] = None
    eos_token_ids: tuple = field(default_factory=tuple)

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim


_LLAMA_LIKE = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "llama",  # same graph; sliding_window honored
    "Qwen2ForCausalLM": "qwen2",
    "MixtralForCausalLM": "mixtral",
}

_GPT2_LIKE = {"GPT2LMHeadModel": "gpt2"}


def _eos_tuple(raw: Any) -> tuple:
    if raw is None:
        return ()
    if isinstance(raw, int):
        return (raw,)
    return tuple(raw)


def parse_hf_config(cfg: dict) -> ModelConfig:
    """Build a ModelConfig from a raw HF config.json dict."""
    archs = cfg.get("architectures") or []
    arch = None
    for a in archs:
        if a in _LLAMA_LIKE:
            arch = _LLAMA_LIKE[a]
            break
        if a in _GPT2_LIKE:
            arch = _GPT2_LIKE[a]
            break
    if arch is None:
        # fall back on model_type
        mt = cfg.get("model_type", "")
        arch = {"llama": "llama", "mistral": "llama", "qwen2": "qwen2",
                "mixtral": "mixtral", "gpt2": "gpt2"}.get(mt)
    if arch is None:
        raise ValueError(f"unsupported architecture: {archs or cfg.get('model_type')}")

    if arch == "gpt2":
        n_head = cfg["n_head"]
        n_embd = cfg["n_embd"]
        return ModelConfig(
            arch="gpt2",
            vocab_size=cfg["vocab_size"],
            hidden_size=n_embd,
            intermediate_size=cfg.get("n_inner") or 4 * n_embd,
            num_layers=cfg["n_layer"],
            num_heads=n_head,
            num_kv_heads=n_head,
            head_dim=n_embd // n_head,
            max_position_embeddings=cfg.get("n_positions", 1024),
            tie_word_embeddings=True,
            activation="gelu_new",
            layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_ids=_eos_tuple(cfg.get("eos_token_id")),
        )

    num_heads = cfg["num_attention_heads"]
    hidden = cfg["hidden_size"]
    head_dim = cfg.get("head_dim") or hidden // num_heads
    num_kv = cfg.get("num_key_value_heads", num_heads)
    mc = ModelConfig(
        arch=arch,
        vocab_size=cfg["vocab_size"],
        hidden_size=hidden,
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=num_heads,
        num_kv_heads=num_kv,
        head_dim=head_dim,
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        rope_theta=cfg.get("rope_theta", 10000.0),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        qkv_bias=(arch == "qwen2" and cfg.get("attention_bias", True) is not False),
        num_experts=cfg.get("num_local_experts", 0) if arch == "mixtral" else 0,
        experts_per_token=cfg.get("num_experts_per_tok", 0) if arch == "mixtral" else 0,
        sliding_window=cfg.get("sliding_window"),
        bos_token_id=cfg.get("bos_token_id"),
        eos_token_ids=_eos_tuple(cfg.get("eos_token_id")),
    )
    return mc


def load_model_config(model_path: str) -> ModelConfig:
    with open(os.path.join(model_path, "config.json")) as f:
        return parse_hf_config(json.load(f))
