"""HBM DMA bandwidth probe (the round-4 attention-kernel bisection tool).

Measures what the paged-attention kernel's page fetches can actually
sustain, via trivial Pallas kernels that do nothing but move blocks:

  A/B  one vs 32 BlockSpec operands        (operand count: no effect)
  C/D  big blocks +/- tiny scale blocks    (tiny DMAs: ~free)
  E/F  5-D dropped-dim vs 4-D folded pool  (rank: no effect at equal bytes)
  G    re-read of a recently-touched 33MB  (>1.5 TB/s - a cache exists)
  H    cold sequential 256KB page blocks   (~310 GB/s)
  I    cold 4MB blocks                     (~460 GB/s)

Findings on v5e (one chip, remote "axon" tunnel): COLD page fetches cap
at ~310 GB/s (256KB) / ~460 GB/s (4MB) regardless of operand count,
rank, or sequential vs scattered ids; XLA's own gather of the same
pattern gets 438 GB/s; only huge contiguous weight streams reach
~745 GB/s. This reprices the attention kernel's "DMA floor": the naive
819 GB/s speed-of-light model overstates what scattered page reads can
reach by ~1.8x (see ARCHITECTURE.md round 4).

Usage: python tools/dma_probe.py
"""

import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

L = 64
NB, NKV, BS, D = 129, 8, 256, 128
pool = jnp.ones((NB, NKV, BS, D), jnp.int8)
bt = jnp.asarray(np.arange(64*2, dtype=np.int32) % NB)

def bench(name, fn, *a):
    np.asarray(fn(*a)); t0 = time.perf_counter()
    r = None
    for _ in range(20): r = fn(*a)
    np.asarray(r); dt = (time.perf_counter() - t0)/20
    print(f"{name}: {dt*1e6/L:.2f} us/iter", flush=True)

# A: grid (8,1,8), ONE pool operand with prefetch-driven index map
def kern_a(bt_ref, k_ref, o_ref):
    o_ref[...] = jnp.full((8, 128), pl.program_id(0), jnp.float32)

def call_a(pool, bt):
    return pl.pallas_call(
        kern_a,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(8, 1, 8),
            in_specs=[pl.BlockSpec((1, NKV, BS, D),
                                   lambda b, q, i, bt: (bt[b*8+i], 0, 0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, bt: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(bt, pool)

# B: same but 32 pool operands (8 seqs x k/v/ks/vs analog)
def kern_b(bt_ref, *refs):
    refs[-1][...] = jnp.full((8, 128), pl.program_id(0), jnp.float32)

def call_b(pool, bt):
    n_ops = 32
    return pl.pallas_call(
        kern_b,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(8, 1, 8),
            in_specs=[pl.BlockSpec((1, NKV, BS, D),
                                   (lambda j: lambda b, q, i, bt: (bt[(b*8+j)%128//8], 0, 0, 0))(j))
                      for j in range(n_ops)],
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, bt: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(bt, *([pool]*n_ops))

@jax.jit
def scan_a(pool, bt):
    def body(c, _):
        return c + call_a(pool, bt)[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
    return c

@jax.jit
def scan_b(pool, bt):
    def body(c, _):
        return c + call_b(pool, bt)[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
    return c

bench("A grid+prefetch+1op", scan_a, pool, bt)
bench("B grid+prefetch+32ops", scan_b, pool, bt)

# C: 16 big ops + 16 tiny scale-like ops per grid step
spool = jnp.ones((NB, NKV, BS), jnp.float32)
def kern_c(bt_ref, *refs):
    refs[-1][...] = jnp.full((8, 128), pl.program_id(0), jnp.float32)

def call_c(pool, spool, bt):
    big = [pl.BlockSpec((1, NKV, BS, D),
                        (lambda j: lambda b, q, i, bt: (bt[(b*8+j) % 128 // 8], 0, 0, 0))(j))
           for j in range(16)]
    tiny = [pl.BlockSpec((1, NKV, BS),
                         (lambda j: lambda b, q, i, bt: (bt[(b*8+j) % 128 // 8], 0, 0))(j))
            for j in range(16)]
    return pl.pallas_call(
        kern_c,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(8, 1, 8),
            in_specs=big + tiny,
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, bt: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(bt, *([pool]*16), *([spool]*16))

@jax.jit
def scan_c(pool, spool, bt):
    def body(c, _):
        return c + call_c(pool, spool, bt)[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
    return c

bench("C 16 big + 16 tiny ops", scan_c, pool, spool, bt)

# D: 16 big ops only (no tiny) — k+v for 8 seqs
def call_d(pool, bt):
    big = [pl.BlockSpec((1, NKV, BS, D),
                        (lambda j: lambda b, q, i, bt: (bt[(b*8+j) % 128 // 8], 0, 0, 0))(j))
           for j in range(16)]
    return pl.pallas_call(
        kern_c,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(8, 1, 8),
            in_specs=big,
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, bt: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(bt, *([pool]*16))

@jax.jit
def scan_d(pool, bt):
    def body(c, _):
        return c + call_d(pool, bt)[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
    return c

bench("D 16 big ops", scan_d, pool, bt)

# E: 5-D stacked pool with dropped layer dim (the real kernel's shape)
LL = 4
pool5 = jnp.ones((LL, NB, NKV, BS, D), jnp.int8)
def call_e(pool5, bt, lay):
    big = [pl.BlockSpec((None, 1, NKV, BS, D),
                        (lambda j: lambda b, q, i, pf_lay, pf_bt:
                         (pf_lay[0], pf_bt[(b*8+j) % 128 // 8], 0, 0, 0))(j))
           for j in range(16)]
    return pl.pallas_call(
        kern_c,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(8, 1, 8),
            in_specs=big,
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, *pf: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(lay, bt, *([pool5]*16))

@jax.jit
def scan_e(pool5, bt):
    def body(c, l):
        return c + call_e(pool5, bt, l.reshape(1))[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0),
                        jnp.arange(L, dtype=jnp.int32) % LL)
    return c

bench("E 16 big 5-D stacked ops", scan_e, pool5, bt)

# F: 4-D pool, SAME total bytes as E (132MB), folded layer indexing
pool4 = jnp.ones((LL * NB, NKV, BS, D), jnp.int8)
def call_f(pool4, bt, lay):
    big = [pl.BlockSpec((1, NKV, BS, D),
                        (lambda j: lambda b, q, i, pf_lay, pf_bt:
                         (pf_lay[0] * NB + pf_bt[(b*8+j) % 128 // 8], 0, 0, 0))(j))
           for j in range(16)]
    return pl.pallas_call(
        kern_c,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(8, 1, 8),
            in_specs=big,
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, *pf: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(lay, bt, *([pool4]*16))

@jax.jit
def scan_f(pool4, bt):
    def body(c, l):
        return c + call_f(pool4, bt, l.reshape(1))[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0),
                        jnp.arange(L, dtype=jnp.int32) % LL)
    return c

bench("F 16 big 4-D folded (132MB)", scan_f, pool4, bt)

# G: like F but every iteration reads the SAME 33MB region (lay=0 fixed)
@jax.jit
def scan_g(pool4, bt):
    def body(c, l):
        return c + call_f(pool4, bt, (l * 0).reshape(1))[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0),
                        jnp.arange(L, dtype=jnp.int32) % LL)
    return c

bench("G 4-D folded, same 33MB each iter", scan_g, pool4, bt)

# H: like F (distinct 33MB per iter) but blocks SEQUENTIAL within iter
bt_seq = jnp.asarray(np.arange(128, dtype=np.int32))
bench("H 4-D folded, seq pages", scan_f, pool4, bt_seq)

# I: cold reads with ONE 4MB block per grid step (vs 16 x 256KB)
def call_i(pool4, bt, lay):
    return pl.pallas_call(
        kern_c,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(8, 1, 8),
            in_specs=[pl.BlockSpec((16, NKV, BS, D),
                      lambda b, q, i, pf_lay, pf_bt:
                      (pf_lay[0] * (NB // 16) + b, 0, 0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, *pf: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(lay, bt, pool4)

@jax.jit
def scan_i(pool4, bt):
    def body(c, l):
        return c + call_i(pool4, bt, l.reshape(1))[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0),
                        jnp.arange(L, dtype=jnp.int32) % LL)
    return c

bench("I one 4MB block/step cold", scan_i, pool4, bt)
