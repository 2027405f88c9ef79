"""Pallas fused dequant+matmul: y = x @ dequant(W) for quantized weights.

The point: on a bandwidth-bound decode step the weights must cross HBM
exactly once at their *quantized* width. XLA's int8->bf16 convert+dot can
materialize the dequantized matrix in HBM (3x traffic); this kernel casts
inside VMEM on the way into the MXU.

Shapes are decode-typical: x [M, K] with small M (the batch), W [K, N]
int8/fp8 with per-output-channel scale [N]. Grid (N/bn, K/bk) with K
innermost; fp32 accumulator in VMEM scratch; scales applied at the final
K step. Pallas double-buffers the W tile DMAs across grid steps
automatically.

This is the in-repo replacement for the CUDA dequant GEMMs behind vLLM's
--quantization flag (reference: benchmark-vllm/vllm_templates.py:75-76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_q_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # NB: int8 -> float32 is the fast Mosaic convert path; int8 -> bf16
    # relayouts catastrophically (measured ~170x slower). The MXU takes
    # the f32 operands at this small M without becoming compute-bound.
    x = x_ref[:].astype(jnp.float32)              # [M, bk]
    w = w_ref[:].astype(jnp.float32)              # [bk, bn] dequant in VMEM
    acc_ref[:] += jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


def _w8a8_kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 x int8 -> int32 rides the MXU's native int8 path
    acc_ref[:] += jax.lax.dot(x_ref[:], w_ref[:],
                              preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * sx_ref[:]
                    * sw_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_k", "block_n", "interpret"))
def matmul_w8a8(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                block_k: int = 512, block_n: int = 1024,
                interpret: bool = False) -> jax.Array:
    """W8A8: dynamic per-token activation quant + int8 weights.

    x [M, K] bf16/f32; w_q [K, N] int8; scale [N] f32 -> [M, N] x.dtype.
    """
    from .linear import quantize_activations

    m, kdim = x.shape
    _, n = w_q.shape
    x8, sx = quantize_activations(x)

    def pick(block, dim):
        for c in (block, 384, 256, 128):
            if c <= block and dim % c == 0:
                return c
        return None

    bk = pick(block_k, kdim)
    bn = pick(block_n, n)
    if bk is None or bn is None:
        y = jax.lax.dot_general(x8, w_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sx * scale).astype(x.dtype)
    n_k = kdim // bk

    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=n_k),
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda ni, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x8, w_q, sx, scale.reshape(1, n).astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# Stacked-layer variants: weights stay [L, K, N] in HBM and the kernel
# DMAs layer `li` directly via a scalar-prefetch index in the BlockSpec.
# This is THE zero-copy path for a lax.scan over layers: slicing a stacked
# weight in the scan body and feeding the slice to a pallas_call forces
# XLA to materialize a full per-layer copy (an opaque custom call can't
# fuse a dynamic-slice producer) — measured ~10 ms/step of pure HBM->HBM
# copy on Llama-3-8B decode before this path existed.
# ---------------------------------------------------------------------------

def _w8a8_stacked_kernel(li_ref, x_ref, w_ref, sx_ref, sw_ref, o_ref,
                         acc_ref, *, n_k: int):
    del li_ref
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot(x_ref[:], w_ref[0],
                              preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * sx_ref[:]
                    * sw_ref[0]).astype(o_ref.dtype)


def _matmul_q_stacked_kernel(li_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                             n_k: int):
    del li_ref
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32)
    acc_ref[:] += jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def _pick_blocks(kdim, n, block_k, block_n):
    def pick(block, dim):
        for c in (block, 384, 256, 128):
            if c <= block and dim % c == 0:
                return c
        return None
    return pick(block_k, kdim), pick(block_n, n)


@functools.partial(jax.jit,
                   static_argnames=("block_k", "block_n", "interpret"))
def matmul_w8a8_stacked(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                        layer: jax.Array, block_k: int = 512,
                        block_n: int = 1024,
                        interpret: bool = False) -> jax.Array:
    """W8A8 against layer `layer` of stacked weights, zero-copy.

    x [M, K]; w_q [L, K, N] int8; scale [L, N] f32; layer scalar int32."""
    from .linear import quantize_activations

    m, kdim = x.shape
    _, _, n = w_q.shape
    x8, sx = quantize_activations(x)
    bk, bn = _pick_blocks(kdim, n, block_k, block_n)
    n_k = kdim // bk
    li = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki, li: (0, ki)),
            pl.BlockSpec((1, bk, bn), lambda ni, ki, li: (li[0], ki, ni)),
            pl.BlockSpec((m, 1), lambda ni, ki, li: (0, 0)),
            pl.BlockSpec((1, 1, bn), lambda ni, ki, li: (li[0], 0, ni)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki, li: (0, ni)),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.int32)])
    return pl.pallas_call(
        functools.partial(_w8a8_stacked_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(li, x8, w_q, sx, scale.reshape(-1, 1, n).astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("block_k", "block_n", "interpret"))
def matmul_quantized_stacked(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                             layer: jax.Array, block_k: int = 512,
                             block_n: int = 1024,
                             interpret: bool = False) -> jax.Array:
    """Weight-only int8/fp8 against layer `layer` of stacked weights.

    x [M, K]; w_q [L, K, N]; scale [L, N] f32; layer scalar int32."""
    m, kdim = x.shape
    _, _, n = w_q.shape
    bk, bn = _pick_blocks(kdim, n, block_k, block_n)
    n_k = kdim // bk
    li = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki, li: (0, ki)),
            pl.BlockSpec((1, bk, bn), lambda ni, ki, li: (li[0], ki, ni)),
            pl.BlockSpec((1, 1, bn), lambda ni, ki, li: (li[0], 0, ni)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki, li: (0, ni)),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)])
    return pl.pallas_call(
        functools.partial(_matmul_q_stacked_kernel, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(li, x, w_q, scale.reshape(-1, 1, n).astype(jnp.float32))


def _int4_stacked_kernel(li_ref, x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                         n_k: int, g: int, gpb: int):
    del li_ref
    k = pl.program_id(1)
    sbase = k * gpb

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = w_ref[0].astype(jnp.float32)
    hi = jnp.floor(f * 0.0625)
    lo = f - hi * 16.0
    for gi in range(gpb):
        rows = slice(gi * g, (gi + 1) * g)
        xl = x_ref[:, 0, rows].astype(jnp.float32)
        xh = x_ref[:, 1, rows].astype(jnp.float32)
        yl = jax.lax.dot(xl, lo[rows], preferred_element_type=jnp.float32)
        yh = jax.lax.dot(xh, hi[rows], preferred_element_type=jnp.float32)
        xsum = jnp.sum(xl, axis=1, keepdims=True)
        sl = s_ref[0, 0, pl.ds(sbase + gi, 1), :]
        sh = s_ref[0, 1, pl.ds(sbase + gi, 1), :]
        acc_ref[:] += (yl - 8.0 * xsum) * sl + yh * sh

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("g", "block_k", "block_n", "interpret"))
def matmul_int4_stacked(x: jax.Array, w_packed: jax.Array, scale: jax.Array,
                        g: int, layer: jax.Array, block_k: int = 512,
                        block_n: int = 512,
                        interpret: bool = False) -> jax.Array:
    """Packed INT4 against layer `layer` of stacked weights, zero-copy.

    x [M, K]; w_packed [L, K/2, N] int8; scale [L, K/g, N]; layer int32."""
    m, kdim = x.shape
    _, k2, n = w_packed.shape
    ng = kdim // g

    bkp = block_k
    while k2 % bkp or bkp % g:
        bkp //= 2
    bn = block_n
    while n % bn:
        bn //= 2
    n_k = k2 // bkp
    gpb = bkp // g

    x_r = x.reshape(m, 2, k2)
    s_r = scale.reshape(-1, 2, ng // 2, n).astype(jnp.float32)
    li = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((m, 2, bkp), lambda ni, ki, li: (0, 0, ki)),
            pl.BlockSpec((1, bkp, bn), lambda ni, ki, li: (li[0], ki, ni)),
            pl.BlockSpec((1, 2, ng // 2, bn),
                         lambda ni, ki, li: (li[0], 0, 0, ni)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki, li: (0, ni)),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)])
    return pl.pallas_call(
        functools.partial(_int4_stacked_kernel, n_k=n_k, g=g, gpb=gpb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(li, x_r, w_packed, s_r)


def _int4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                 n_k: int, g: int, gpb: int):
    k = pl.program_id(1)
    # s_ref holds ALL groups for this n-tile: [2, ng/2, bn] (whole axis —
    # a (2, gpb, bn) block would break Mosaic's 8-sublane tiling for
    # small gpb); this k-step's groups start at k * gpb
    sbase = k * gpb

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # One packed byte holds two weights: HIGH nibble = logical row
    # r + K/2 (signed), LOW nibble = logical row r biased +8 (unsigned).
    # Decode in f32 (int8 -> f32 is the fast Mosaic convert; bit ops on
    # int8 relayout): every byte value is exactly representable.
    f = w_ref[:].astype(jnp.float32)           # [bkp, bn]
    hi = jnp.floor(f * 0.0625)                 # [-8, 7]
    lo = f - hi * 16.0                         # biased, [0, 15]

    # Per-group MXU dots with the RAW nibble planes; group scales (and the
    # -8 low-bias correction, folded into a per-group x row-sum) apply to
    # the [M, bn] group outputs — O(M·bn) VPU work per group instead of
    # O(g·bn) scaling of the weight tile.
    for gi in range(gpb):
        rows = slice(gi * g, (gi + 1) * g)
        xl = x_ref[:, 0, rows].astype(jnp.float32)     # [M, g]
        xh = x_ref[:, 1, rows].astype(jnp.float32)
        yl = jax.lax.dot(xl, lo[rows], preferred_element_type=jnp.float32)
        yh = jax.lax.dot(xh, hi[rows], preferred_element_type=jnp.float32)
        xsum = jnp.sum(xl, axis=1, keepdims=True)      # [M, 1]
        sl = s_ref[0, pl.ds(sbase + gi, 1), :]         # [1, bn]
        sh = s_ref[1, pl.ds(sbase + gi, 1), :]
        acc_ref[:] += (yl - 8.0 * xsum) * sl + yh * sh

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("g", "block_k", "block_n", "interpret"))
def matmul_int4(x: jax.Array, w_packed: jax.Array, scale: jax.Array,
                g: int, block_k: int = 512, block_n: int = 512,
                interpret: bool = False) -> jax.Array:
    """Fused group-dequant + matmul for bit-packed INT4 (AWQ-style).

    x [M, K] bf16/f32; w_packed [K/2, N] int8 (quant.pack_int4 layout:
    row r pairs with row r + K/2); scale [K/g, N] f32, g = group size.
    HBM weight traffic is 4 bits per element — half the int8 kernel's.
    Caller guarantees tile-friendliness (see linear._int4_kernel_ok).
    """
    m, kdim = x.shape
    k2, n = w_packed.shape
    ng = kdim // g

    bkp = block_k
    while k2 % bkp or bkp % g:
        bkp //= 2
    bn = block_n
    while n % bn:
        bn //= 2
    n_k = k2 // bkp
    gpb = bkp // g

    x_r = x.reshape(m, 2, k2)
    s_r = scale.reshape(2, ng // 2, n).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_int4_kernel, n_k=n_k, g=g, gpb=gpb),
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((m, 2, bkp), lambda ni, ki: (0, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ng // 2, bn), lambda ni, ki: (0, 0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kdim * n,
            bytes_accessed=k2 * n + m * kdim * 2 + m * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(x_r, w_packed, s_r)
    return out


@functools.partial(jax.jit,
                   static_argnames=("block_k", "block_n", "interpret"))
def matmul_quantized(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                     block_k: int = 512, block_n: int = 512,
                     interpret: bool = False) -> jax.Array:
    """x [M, K] bf16/f32; w_q [K, N] int8/fp8; scale [N] f32 -> [M, N] x.dtype."""
    m, kdim = x.shape
    _, n = w_q.shape

    def pick(block, dim):
        for c in (block, 384, 256, 128):
            if c <= block and dim % c == 0:
                return c
        return None

    bk = pick(block_k, kdim)
    bn = pick(block_n, n)
    if bk is None or bn is None:
        # fall back on XLA for ragged shapes
        y = jnp.dot(x, w_q.astype(x.dtype), preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)
    n_k = kdim // bk

    grid = (n // bn, n_k)
    out = pl.pallas_call(
        functools.partial(_matmul_q_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kdim * n,
            bytes_accessed=kdim * n + m * kdim * 2 + m * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, n).astype(jnp.float32))
    return out
