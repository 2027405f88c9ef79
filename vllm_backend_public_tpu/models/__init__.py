"""Model family registry.

Maps normalized arch names (loader/hf.py) to the family module implementing:
  forward_hidden(params, cfg, tokens, attn, cache, attn_impl) -> (hidden, cache)
  logits_from_hidden(params, hidden) -> logits
  convert_hf_state_dict(tensors, cfg, dtype) -> params
  init_random_params(cfg, key, dtype) -> params
"""

from importlib import import_module

_FAMILIES = {
    "llama": ".llama",
    "qwen2": ".llama",   # same compute graph, qkv_bias handled by config
    "gpt2": ".gpt2",
    "mixtral": ".mixtral",
}


def get_model(arch: str):
    if arch not in _FAMILIES:
        raise ValueError(f"unsupported model family: {arch}")
    return import_module(_FAMILIES[arch], __package__)
