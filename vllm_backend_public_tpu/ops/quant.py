"""Weight quantization: INT8 / FP8 per-channel, INT4 group (AWQ-style).

Covers BASELINE.json configs #2-#4. Quantization is symmetric
round-to-nearest with per-output-channel (or per-group) scales; fp32 scale
math keeps the ≤0.1 ppl-delta budget (BASELINE.md accuracy target).
"""

from __future__ import annotations

from typing import Set

import jax
import jax.numpy as jnp

from .linear import QuantizedWeight

# the big projection mats worth quantizing in each family's layer pytree
DEFAULT_TARGETS: Set[str] = {"wq", "wk", "wv", "wo", "wg", "wu", "wd",
                             "w_fc", "w_proj", "we_gate", "we_up", "we_down",
                             "lm_head"}


def quantize_int8(w: jax.Array) -> dict:
    """w: [..., in, out] -> per-out-channel symmetric int8."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight("int8", q, scale.squeeze(-2))


def quantize_fp8(w: jax.Array) -> dict:
    """w: [..., in, out] -> per-out-channel float8_e4m3fn."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 448.0, 1e-8)  # e4m3fn max normal = 448
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return QuantizedWeight("fp8", q, scale.squeeze(-2))


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack signed int4 values (int8 storage, [-8, 7]) two per byte.

    q: [..., in, out] -> [..., in/2, out] int8. Logical row k pairs with
    row k + in/2 (two contiguous half-planes, so the fused kernel reads
    each plane with plain contiguous tiles — no stride-2 lane access).
    The LOW nibble stores q[:in/2] BIASED by +8 (range [0, 15]): the
    kernel then needs no sign fix-up for the low plane — the -8 bias is
    folded into the per-group output correction. The HIGH nibble stores
    q[in/2:] as plain signed bits (arithmetic shift recovers it).
    """
    *lead, in_dim, out = q.shape
    if in_dim % 2:
        raise ValueError(f"in_dim {in_dim} must be even to pack int4")
    half = in_dim // 2
    lo = q[..., :half, :].astype(jnp.int32) + 8      # [0, 15]
    hi = q[..., half:, :].astype(jnp.int32)          # [-8, 7]
    return (hi * 16 + lo).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: [..., in/2, out] int8 -> [..., in, out] int8."""
    p = packed.astype(jnp.int32)
    hi = p >> 4                      # arithmetic shift: sign-extended
    lo = (p & 0xF) - 8               # remove the +8 bias
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def quantize_int4(w: jax.Array, group_size: int = 128,
                  pack: bool = True) -> QuantizedWeight:
    """w: [..., in, out] -> per-(input-group, out-channel) symmetric int4.

    AWQ-style group quantization (activation-aware scale search can be
    layered on by pre-scaling w per channel before calling this). By
    default the values are bit-packed two per byte (pack_int4) so HBM
    weight traffic is 4 bits/element — vLLM's AWQ kernels do the same on
    GPU; here ops/matmul_q.py:matmul_int4 unpacks in VMEM."""
    wf = w.astype(jnp.float32)
    *lead, in_dim, out = wf.shape
    g = min(group_size, in_dim)
    if in_dim % g:
        raise ValueError(f"in_dim {in_dim} not divisible by group {g}")
    ng = in_dim // g
    wg = wf.reshape(*lead, ng, g, out)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)  # [..., ng, 1, out]
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, in_dim, out)
    if pack and in_dim % 2 == 0:
        q = pack_int4(q)
    return QuantizedWeight("int4", q, scale.squeeze(-2), g)


def quantize_w8a8(w: jax.Array) -> QuantizedWeight:
    """Weights as int8 (per-out-channel); activations quantized
    dynamically per token inside the matmul (int8 x int8 -> int32 MXU)."""
    qw = quantize_int8(w)
    return QuantizedWeight("w8a8", qw.q, qw.s)


_QUANTIZERS = {"int8": quantize_int8, "fp8": quantize_fp8,
               "int4": quantize_int4, "w8a8": quantize_w8a8}


def quantize_params(params: dict, kind: str,
                    targets: Set[str] = DEFAULT_TARGETS) -> dict:
    """Quantize the projection weights of a model param pytree in place
    (embeddings and norms stay high-precision)."""
    qfn = _QUANTIZERS[kind]

    def walk(node):
        if isinstance(node, dict):
            return {k: (qfn(v) if k in targets and not isinstance(v, (dict, QuantizedWeight))
                        else walk(v))
                    for k, v in node.items()}
        return node

    return walk(params)


def quantize_params_int8(params: dict) -> dict:
    return quantize_params(params, "int8")
