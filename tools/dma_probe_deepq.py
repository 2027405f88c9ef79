"""Deep-queue manual-DMA probe (round 5).

Round 4 established (tools/dma_probe.py): COLD page-block fetches through
Mosaic's automatic double-buffered pipeline sustain ~310 GB/s at 256KB
descriptors and ~460 GB/s at one 4MB descriptor, vs ~745 GB/s for XLA's
big contiguous weight streams. The parked round-4 lever is a manual-DMA
kernel with a DEEPER fetch queue: this probe measures whether queue depth
(not descriptor size) closes the 310 -> 460 gap, BEFORE committing to a
kernel rewrite.

Experiments (all cold: 4 x 33MB regions cycled per scan iteration):
  BASE   auto-pipeline, 16 x 256KB per grid step (round-4 H reprise)
  J(Q)   manual async_copy queue, depth Q in {2,4,8,16}, 256KB descriptors
  S(n)   manual queue depth 4, descriptor = n contiguous pages
         (n in {2,4,8} -> 512KB/1MB/2MB)
  P      J(8) with start(priority=1) (background-priority DMAs)

Usage: python tools/dma_probe_deepq.py
"""

import sys, time, functools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

L = 64                      # scan length (iterations per timed call)
LL = 4                      # distinct 33MB regions cycled (cold reads)
NB, NKV, BS, D = 128, 8, 256, 128   # one page block = 256KB int8
NPAGES = 128                # pages fetched per iteration (32MB)
pool = jnp.ones((LL * NB, NKV, BS, D), jnp.int8)
bt = jnp.asarray(np.arange(NPAGES, dtype=np.int32))


def bench(name, fn, *a, mb_per_iter=32.0):
    np.asarray(fn(*a)); t0 = time.perf_counter()
    r = None
    for _ in range(20):
        r = fn(*a)
    np.asarray(r); dt = (time.perf_counter() - t0) / 20
    us = dt * 1e6 / L
    gbs = mb_per_iter / 1e3 / (dt / L)
    print(f"{name}: {us:7.2f} us/iter  {gbs:6.1f} GB/s", flush=True)


# ---- BASE: auto-pipeline 16 x 256KB per grid step (H reprise) ----------
def kern_base(lay_ref, bt_ref, *refs):
    refs[-1][...] = jnp.full((8, 128), pl.program_id(0), jnp.float32)


def call_base(pool, bt, lay):
    big = [pl.BlockSpec((1, NKV, BS, D),
                        (lambda j: lambda b, q, i, pf_lay, pf_bt:
                         (pf_lay[0] * NB + pf_bt[(b * 16 + j) % NPAGES],
                          0, 0, 0))(j))
           for j in range(16)]
    return pl.pallas_call(
        kern_base,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(8, 1, 1),
            in_specs=big,
            out_specs=pl.BlockSpec((8, 128), lambda b, q, i, *pf: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(lay, bt, *([pool] * 16))


@jax.jit
def scan_base(pool, bt):
    def body(c, l):
        return c + call_base(pool, bt, l.reshape(1))[0, 0], None
    c, _ = jax.lax.scan(body, jnp.float32(0),
                        jnp.arange(L, dtype=jnp.int32) % LL)
    return c


# ---- J(Q): manual deep-queue, 256KB descriptors ------------------------
def make_manual(Q, pages_per_desc=1, priority=0):
    nd = NPAGES // pages_per_desc

    def kern(lay_ref, bt_ref, hbm_ref, o_ref):
        def body(scratch, sems):
            base = lay_ref[0] * NB

            def get_dma(slot, i):
                if pages_per_desc == 1:
                    src = hbm_ref.at[base + bt_ref[i]]
                else:
                    src = hbm_ref.at[
                        pl.ds(base + bt_ref[i * pages_per_desc],
                              pages_per_desc)]
                return pltpu.make_async_copy(
                    src, scratch.at[slot], sems.at[slot])

            for q in range(min(Q, nd)):
                get_dma(q, q).start(priority=priority)

            def loop(i, _):
                slot = jax.lax.rem(i, Q)
                get_dma(slot, i).wait()

                @pl.when(i + Q < nd)
                def _():
                    get_dma(slot, i + Q).start(priority=priority)
                return ()

            jax.lax.fori_loop(0, nd, loop, ())
            o_ref[...] = jnp.full((8, 128), 1.0, jnp.float32)

        shape = ((Q, NKV, BS, D) if pages_per_desc == 1
                 else (Q, pages_per_desc, NKV, BS, D))
        pl.run_scoped(
            body,
            pltpu.VMEM(shape, jnp.int8),
            pltpu.SemaphoreType.DMA((Q,)),
        )

    def call(pool, bt, lay):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda i, *pf: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(lay, bt, pool)

    @jax.jit
    def scan(pool, bt):
        def body(c, l):
            return c + call(pool, bt, l.reshape(1))[0, 0], None
        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(L, dtype=jnp.int32) % LL)
        return c

    return scan


if __name__ == "__main__":
    bench("BASE auto 16x256KB", scan_base, pool, bt)
    for Q in (2, 4, 8, 16):
        bench(f"J manual 256KB Q={Q:2d}", make_manual(Q), pool, bt)
    for n in (2, 4, 8):
        bench(f"S manual {256*n}KB Q=4 ", make_manual(4, pages_per_desc=n),
              pool, bt)
    bench("P manual 256KB Q=8 prio1", make_manual(8, priority=1), pool, bt)
