"""Microbenchmark for the paged decode-attention kernel.

Times the standalone kernel over a stacked-layer page pool with an
on-device lax.scan over layers (amortizes the remote-dispatch cost),
mimicking bench.py decode shapes. Usage:

  python tools/attn_microbench.py [--bs 128] [--batch 64] [--ctx 160]
                                  [--kv int8|bf16] [--iters 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=160)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--nkv", type=int, default=8)
    ap.add_argument("--g", type=int, default=4)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--kv", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from vllm_backend_public_tpu.ops.attention import paged_prefix_attention

    B, L, nkv, g, d, bs = (args.batch, args.layers, args.nkv, args.g,
                           args.d, args.bs)
    mb = -(-(args.ctx + 64) // bs)       # a little headroom like the engine
    nb = B * mb + 1
    key = jax.random.PRNGKey(0)
    quant = args.kv == "int8"
    if quant:
        kp = jax.random.randint(key, (L, nb, nkv, bs, d), -127, 128,
                                dtype=jnp.int8)
        vp = jax.random.randint(key, (L, nb, nkv, bs, d), -127, 128,
                                dtype=jnp.int8)
        ks = jnp.full((L, nb, nkv, bs), 0.01, jnp.float32)
        vs = jnp.full((L, nb, nkv, bs), 0.01, jnp.float32)
    else:
        kp = jax.random.normal(key, (L, nb, nkv, bs, d), dtype=jnp.bfloat16)
        vp = jax.random.normal(key, (L, nb, nkv, bs, d), dtype=jnp.bfloat16)
        ks = vs = None
    q = jax.random.normal(key, (B, nkv * g, d), dtype=jnp.bfloat16)
    bt = jnp.asarray(
        np.arange(1, B * mb + 1, dtype=np.int32).reshape(B, mb))
    lens = jnp.full((B,), args.ctx, jnp.int32)

    @jax.jit
    def run(q, kp, vp, ks, vs, bt, lens):
        def body(carry, layer):
            acc, m, l = paged_prefix_attention(
                q + carry, kp, vp, bt, lens, 1.0 / d ** 0.5,
                k_scale=ks, v_scale=vs, layer=layer)
            return carry + acc[:1, :1, :1].astype(q.dtype) * 1e-9, None
        carry, _ = jax.lax.scan(
            body, jnp.zeros((1, 1, 1), q.dtype),
            jnp.arange(L, dtype=jnp.int32))
        return carry

    # compile + one full round trip (block_until_ready alone does not
    # await remote-tunnel execution on the axon backend)
    np.asarray(run(q, kp, vp, ks, vs, bt, lens))
    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = run(q, kp, vp, ks, vs, bt, lens)
    np.asarray(out)  # one fetch drains the whole queued pipeline
    dt = (time.perf_counter() - t0) / args.iters
    per_layer = dt / L * 1e6
    kv_bytes = (2 * B * min(mb * bs, ((args.ctx + bs - 1) // bs) * bs)
                * nkv * d * (1 if quant else 2)) * L
    print(f"bs={bs} ctx={args.ctx} kv={args.kv}: {dt * 1e3:.3f} ms/scan, "
          f"{per_layer:.1f} us/layer, dma-floor="
          f"{kv_bytes / 819e9 / L * 1e6:.1f} us/layer")


if __name__ == "__main__":
    main()
