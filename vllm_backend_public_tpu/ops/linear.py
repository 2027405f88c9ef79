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

# 8-bit matmul implementation. Measured on one v5e chip (Llama-3-8B w8a8
# decode, b64): XLA's fused convert+int8-dot outperforms the Pallas
# kernels even with zero-copy stacked-layer indexing (25.4 vs 29.1 ms
# step) — XLA overlaps the weight streams of adjacent matmuls across op
# boundaries, which per-call Pallas pipelines can't. Packed INT4 always
# uses Pallas (XLA would materialize the unpacked weights: >2x traffic).
MATMUL_IMPL = os.environ.get("VBPT_MATMUL_IMPL", "xla")  # "xla"|"pallas"


def set_kernels_enabled(flag: bool) -> None:
    global KERNELS_ENABLED
    KERNELS_ENABLED = bool(flag)


class LayerView:
    """Layer `idx` of a stacked [L, ...] weight, resolved inside the kernel.

    Built in the layer-scan body from a closure-captured stacked weight and
    the traced layer index. `matmul` routes it to the *_stacked Pallas
    kernels, which DMA the layer's tiles straight out of the stacked HBM
    array via a scalar-prefetch block index — no per-layer copy. On
    non-TPU (or tile-unfriendly shapes) it degrades to dynamic-index +
    the regular path."""

    __slots__ = ("w", "idx")

    def __init__(self, w, idx):
        self.w = w          # stacked array or QuantizedWeight ([L, ...])
        self.idx = idx      # traced int32 scalar


def _slice_layer(w, idx):
    if is_quantized(w):
        return QuantizedWeight(
            w.kind, jax.lax.dynamic_index_in_dim(w.q, idx, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(w.s, idx, 0, keepdims=False), w.g)
    return jax.lax.dynamic_index_in_dim(w, idx, 0, keepdims=False)


def _matmul_layer_view(x: jax.Array, v: LayerView) -> jax.Array:
    w, idx = v.w, v.idx
    if not is_quantized(w):
        return x @ _slice_layer(w, idx)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    n = w.q.shape[-1]
    if w.kind in ("int8", "fp8") and _use_fused_kernel(x, w, stacked=True):
        from .matmul_q import matmul_quantized_stacked
        return matmul_quantized_stacked(x2, w.q, w.s, idx).reshape(*lead, n)
    if w.kind == "w8a8" and _use_fused_kernel(x, w, stacked=True):
        from .matmul_q import matmul_w8a8_stacked
        return matmul_w8a8_stacked(x2, w.q, w.s, idx).reshape(*lead, n)
    if w.kind == "int4":
        sliced = _slice_layer(w, idx)
        if _int4_kernel_ok(x, sliced):
            from .matmul_q import matmul_int4_stacked
            return matmul_int4_stacked(x2, w.q, w.s, w.g,
                                       idx).reshape(*lead, n)
        return _int4_matmul(x, sliced)
    return matmul(x, _slice_layer(w, idx))


def matmul(x: jax.Array, w) -> jax.Array:
    """x: [..., in] @ w -> [..., out]; dense or quantized; a LayerView
    resolves its layer inside the kernel (zero-copy stacked weights)."""
    if isinstance(w, LayerView):
        return _matmul_layer_view(x, w)
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


def _use_fused_kernel(x, w, stacked: bool = False) -> bool:
    """Fused Pallas dequant+matmul needs TPU + tile-friendly shapes."""
    want_ndim = 3 if stacked else 2
    if (MATMUL_IMPL != "pallas" or not KERNELS_ENABLED
            or jax.default_backend() != "tpu" or w.q.ndim != want_ndim):
        return False
    m = 1
    for dim in x.shape[:-1]:
        m *= dim
    k, n = w.q.shape[-2:]
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
