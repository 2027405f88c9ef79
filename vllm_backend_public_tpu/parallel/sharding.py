"""GSPMD partition specs for model params, KV cache, and engine step I/O.

Megatron-style tensor parallelism expressed declaratively: column-shard the
up projections, row-shard the down projections, and let XLA insert the
all-reduces on ICI (the TPU equivalent of vLLM's NCCL custom all-reduce,
which the reference toggles via --disable-custom-all-reduce,
reference benchmark-vllm/vllm_templates.py:62).

The KV cache pages shard over the "model" axis on the kv-head dimension
(each TP shard holds its heads' pages) and over "data" on the page-pool
dimension (each DP replica owns a slice of the pool).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..loader.hf import ModelConfig


def llama_param_specs(cfg: ModelConfig) -> Dict:
    """PartitionSpec pytree matching models/llama.py's param layout."""
    layers = {
        "attn_norm": P(None, None),
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "mlp_norm": P(None, None),
        "wg": P(None, None, ("expert", "model")),
        "wu": P(None, None, ("expert", "model")),
        "wd": P(None, ("expert", "model"), None),
    }
    if cfg.qkv_bias:
        layers.update({"bq": P(None, "model"), "bk": P(None, "model"),
                       "bv": P(None, "model")})
    return {
        "embed": P(None, None),
        "layers": layers,
        "final_norm": P(None),
        "lm_head": P(None, "model"),
    }


def mixtral_param_specs(cfg: ModelConfig) -> Dict:
    specs = llama_param_specs(cfg)
    layers = specs["layers"]
    for k in ("wg", "wu", "wd"):
        del layers[k]
    layers.update({
        "router": P(None, None, None),
        # expert weights: [L, E, H, I] — experts over "expert", I over "model"
        "we_gate": P(None, "expert", None, "model"),
        "we_up": P(None, "expert", None, "model"),
        "we_down": P(None, "expert", "model", None),
    })
    return specs


def kv_cache_spec(pipelined: bool = False) -> P:
    # [L, num_blocks, num_kv_heads, block_size, head_dim]; under pipeline
    # parallelism each stage owns its layers' pages; TP shards kv heads
    return P("pipe" if pipelined else None, "data", "model", None, None)


def kv_scale_spec(pipelined: bool = False) -> P:
    # int8-KV scales are head-major [L, num_blocks, num_kv_heads,
    # block_size] (models/common.py:KVCache)
    return P("pipe" if pipelined else None, "data", "model", None)


def param_specs(cfg: ModelConfig, pipelined: bool = False) -> Dict:
    if cfg.arch in ("llama", "qwen2"):
        specs = llama_param_specs(cfg)
    elif cfg.arch == "mixtral":
        specs = mixtral_param_specs(cfg)
    elif cfg.arch == "gpt2":
        specs = gpt2_param_specs(cfg)
    else:
        raise ValueError(cfg.arch)
    if pipelined:
        # stacked [L, ...] layer params split across pipeline stages;
        # embed/norms/lm_head stay replicated over "pipe"
        specs["layers"] = {k: P("pipe", *s[1:])
                           for k, s in specs["layers"].items()}
    return specs


def gpt2_param_specs(cfg: ModelConfig) -> Dict:
    return {
        "embed": P(None, None),
        "pos_embed": P(None, None),
        "layers": {
            "ln1_w": P(None, None), "ln1_b": P(None, None),
            "ln2_w": P(None, None), "ln2_b": P(None, None),
            "wq": P(None, None, "model"), "bq": P(None, "model"),
            "wk": P(None, None, "model"), "bk": P(None, "model"),
            "wv": P(None, None, "model"), "bv": P(None, "model"),
            "wo": P(None, "model", None), "bo": P(None, None),
            "w_fc": P(None, None, "model"), "b_fc": P(None, "model"),
            "w_proj": P(None, "model", None), "b_proj": P(None, None),
        },
        "final_norm_w": P(None), "final_norm_b": P(None),
        "lm_head": P(None, "model"),
    }


def _shard_one(x, spec: P, mesh: Mesh):
    from ..ops.linear import QuantizedWeight

    if isinstance(x, QuantizedWeight):
        # q shards with the dense spec; per-out-channel scales drop the
        # input axis (s [.., out]); int4 group scales keep the full rank
        # (s [.., in/G, out] — the group axis replaces the input axis)
        s_spec = spec if x.s.ndim == x.q.ndim else P(*spec[:-2], spec[-1])
        return QuantizedWeight(
            x.kind,
            jax.device_put(x.q, NamedSharding(mesh, spec)),
            jax.device_put(x.s, NamedSharding(mesh, s_spec)), x.g)
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_params(params, mesh: Mesh, cfg: ModelConfig,
                 pipelined: bool = False):
    """Place a (possibly quantized) param pytree onto the mesh with the
    family's specs."""
    from ..ops.linear import QuantizedWeight

    specs = param_specs(cfg, pipelined=pipelined)
    return jax.tree.map(
        lambda x, s: _shard_one(x, s, mesh), params, specs,
        is_leaf=lambda x: isinstance(x, QuantizedWeight))


def decode_in_specs():
    """Shardings for decode-step inputs (tokens, positions, bt, kv_lens,
    active): batch over 'data'."""
    return dict(tokens=P("data"), positions=P("data"),
                block_tables=P("data", None), kv_lens=P("data"),
                active=P("data"))
