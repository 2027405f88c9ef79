"""Checkpoint loading: HF safetensors shards -> JAX pytrees.

The reference pulls models from the HF hub or `/data/local_models/...`
(reference: benchmark-mlflow/processors/vllm_processor.py:29); here weight
loading is in-repo: read every *.safetensors shard in a model directory,
hand the flat name->array dict to the model family's converter, and place
the result on device (sharded placement is applied by parallel/sharding.py).
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Dict

import numpy as np


def read_safetensors_dir(model_path: str) -> Dict[str, np.ndarray]:
    """Read all safetensors shards in a directory into one flat dict."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_path}")
    out: Dict[str, np.ndarray] = {}
    for path in files:
        with safe_open(path, framework="numpy") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
    return out


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Convert a torch state_dict to numpy (for in-memory test fixtures)."""
    out = {}
    for k, v in state_dict.items():
        t = v.detach().to("cpu")
        if t.dtype.is_floating_point:
            t = t.float()
        out[k] = t.numpy()
    return out


def load_model(model_path: str, dtype=None):
    """Load (ModelConfig, params) for any supported family from an HF dir."""
    import jax.numpy as jnp

    from .hf import load_model_config

    cfg = load_model_config(model_path)
    dtype = dtype or jnp.bfloat16
    tensors = read_safetensors_dir(model_path)
    converter = get_converter(cfg.arch)
    return cfg, converter(tensors, cfg, dtype=dtype)


def get_converter(arch: str) -> Callable:
    if arch in ("llama", "qwen2"):
        from ..models.llama import convert_hf_state_dict
        return convert_hf_state_dict
    if arch == "gpt2":
        from ..models.gpt2 import convert_hf_state_dict
        return convert_hf_state_dict
    if arch == "mixtral":
        from ..models.mixtral import convert_hf_state_dict
        return convert_hf_state_dict
    raise ValueError(f"unsupported arch {arch}")
