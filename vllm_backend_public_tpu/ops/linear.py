"""Linear-op dispatch: dense or quantized weights, one call site.

Model code routes every projection through `matmul(x, w)`. A weight is
either a plain array [in, out] or a `QuantizedWeight` pytree node:

  kind="int8": q int8 [.., in, out],  s f32 [.., out]     (per-out-channel)
  kind="fp8" : q f8e4m3 [.., in, out], s f32 [.., out]
  kind="int4": q int8 in [-8,7] [.., in, out], s f32 [.., in/G, out], G static

QuantizedWeight registers q/s as pytree children and kind/g as static aux
data, so stacked [L, ...] quantized layers slice cleanly through lax.scan
and shard through GSPMD like any other param leaf.

Weight-only schemes dequantize into the MXU feed (XLA fuses the cast, so
HBM traffic is the quantized bytes — the win on a bandwidth-bound decode).
The reference exposes this capability only as vLLM's --quantization flag
(reference: benchmark-vllm/vllm_templates.py:75-76,
configs/vllm_config.yaml:36-38); here the kernels are in-repo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantizedWeight:
    def __init__(self, kind: str, q, s, g: int | None = None):
        self.kind = kind
        self.q = q
        self.s = s
        self.g = g

    def tree_flatten(self):
        return (self.q, self.s), (self.kind, self.g)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, g = aux
        q, s = children
        return cls(kind, q, s, g)

    def __repr__(self):
        qs = getattr(self.q, "shape", None)
        return f"QuantizedWeight({self.kind}, q{qs}, g={self.g})"


def is_quantized(w) -> bool:
    return isinstance(w, QuantizedWeight)


# Pallas kernels are single-device programs. Under GSPMD (mesh sharding)
# the XLA convert+dot path partitions correctly; the engine flips this
# off when it builds a mesh (engine/engine.py) — same discipline as its
# attn_impl="xla" override.
import os
KERNELS_ENABLED = os.environ.get("VBPT_DISABLE_KERNELS", "") != "1"


def set_kernels_enabled(flag: bool) -> None:
    global KERNELS_ENABLED
    KERNELS_ENABLED = bool(flag)


def matmul(x: jax.Array, w) -> jax.Array:
    """x: [..., in] @ w -> [..., out]; dense or quantized."""
    if not is_quantized(w):
        return x @ w
    if w.kind in ("int8", "fp8"):
        if _use_fused_kernel(x, w):
            from .matmul_q import matmul_quantized
            lead = x.shape[:-1]
            x2 = x.reshape(-1, x.shape[-1])
            y = matmul_quantized(x2, w.q, w.s)
            return y.reshape(*lead, w.q.shape[-1])
        y = jnp.dot(x, w.q.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return (y * w.s).astype(x.dtype)
    if w.kind == "w8a8":
        return _w8a8_matmul(x, w)
    if w.kind == "int4":
        return _int4_matmul(x, w)
    raise ValueError(f"unknown quant kind {w.kind}")


def quantize_activations(x: jax.Array):
    """Dynamic symmetric per-token int8 activation quantization.

    x: [..., K] -> (x8 int8, sx f32 [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-8)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def _w8a8_matmul(x: jax.Array, w: QuantizedWeight) -> jax.Array:
    """int8 activations x int8 weights -> int32 accumulate on the MXU
    (BASELINE config #3). Scales: per-token (dynamic) x per-out-channel."""
    if _use_fused_kernel(x, w):
        from .matmul_q import matmul_w8a8
        lead = x.shape[:-1]
        y = matmul_w8a8(x.reshape(-1, x.shape[-1]), w.q, w.s)
        return y.reshape(*lead, w.q.shape[-1])
    x8, sx = quantize_activations(x)
    y = jax.lax.dot_general(
        x8, w.q, (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * w.s).astype(x.dtype)


def _use_fused_kernel(x, w) -> bool:
    """Fused Pallas dequant+matmul needs TPU + tile-friendly shapes."""
    if (not KERNELS_ENABLED or jax.default_backend() != "tpu"
            or w.q.ndim != 2):
        return False
    m = 1
    for dim in x.shape[:-1]:
        m *= dim
    k, n = w.q.shape
    return m % 8 == 0 and m <= 1024 and k % 128 == 0 and n % 128 == 0


def _int4_kernel_ok(x, w: QuantizedWeight) -> bool:
    """Packed-int4 Pallas kernel preconditions (else XLA unpack path)."""
    if (not KERNELS_ENABLED or jax.default_backend() != "tpu"
            or w.q.ndim != 2):
        return False
    in_dim = x.shape[-1]
    if w.q.shape[-2] * 2 != in_dim:       # not packed
        return False
    m = 1
    for dim in x.shape[:-1]:
        m *= dim
    k2, n = w.q.shape
    ng = in_dim // w.g
    return (m % 8 == 0 and m <= 1024 and ng % 2 == 0
            and k2 % w.g == 0 and k2 % 128 == 0 and n % 128 == 0)


def _int4_matmul(x: jax.Array, w: QuantizedWeight) -> jax.Array:
    """Group-quantized INT4 (AWQ-style): per-(input-group, out-col) scales.

    q is bit-packed two values per byte (quant.pack_int4 layout) so HBM
    weight traffic is 4 bits/element; legacy unpacked int8 storage is
    also accepted. The Pallas kernel (matmul_q.matmul_int4) unpacks in
    VMEM; the XLA path unpacks explicitly and runs a grouped einsum."""
    g = w.g
    in_dim = x.shape[-1]
    ng = in_dim // g
    out = w.q.shape[-1]
    if _int4_kernel_ok(x, w):
        from .matmul_q import matmul_int4
        lead = x.shape[:-1]
        y = matmul_int4(x.reshape(-1, in_dim), w.q, w.s, w.g)
        return y.reshape(*lead, out)
    q = w.q
    if q.shape[-2] * 2 == in_dim:
        from .quant import unpack_int4
        q = unpack_int4(q)
    qd = q.astype(x.dtype).reshape(ng, g, out)
    xg = x.reshape(*x.shape[:-1], ng, g)
    # partial sums per group, scaled per (group, out)
    y = jnp.einsum("...ng,ngo->...no", xg, qd,
                   preferred_element_type=jnp.float32)
    y = (y * w.s).sum(axis=-2)
    return y.astype(x.dtype)
