"""Time the real decode-attention kernel in isolation (round 5).

Replicates the flagship bench's decode attention per layer (llama8b
w8a8 int8-KV b64 bs256, stacked pools, K-major lookahead buffer, in-kernel
merge + finalize) in a 32-layer scan, full and NOCOMPUTE, and prices the
measured time against the bytes the kernel actually fetches at today's
measured cold-page ceiling (~490 GB/s, tools/dma_probe_deepq.py).

Usage: python tools/attn_probe.py [--prefix 160] [--count 16] [--nocompute]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prefix", type=int, default=160)
    ap.add_argument("--count", type=int, default=16)
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--kspec", type=int, default=32)
    ap.add_argument("--nocompute", action="store_true")
    ap.add_argument("--manual", action="store_true")
    ap.add_argument("--calls", type=int, default=20)
    args = ap.parse_args()
    if args.nocompute:
        os.environ["VBPT_ATTN_NOCOMPUTE"] = "1"

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from vllm_backend_public_tpu.ops import attention as A

    B, NKV, G, D = args.batch, 8, 4, 128
    BS, L, K = args.block_size, args.layers, args.kspec
    MB = -(-384 // BS)
    NB = B * MB + 1
    rng = np.random.default_rng(0)

    import jax.random as jr
    keys = jr.split(jr.key(0), 8)
    mk = jax.jit(lambda k, s, lo, hi, dt: (
        jr.uniform(k, s, jnp.float32, lo, hi).astype(dt)),
        static_argnums=(1, 4))
    k_pages = mk(keys[0], (L, NB, NKV, BS, D), -80., 80., jnp.int8)
    v_pages = mk(keys[1], (L, NB, NKV, BS, D), -80., 80., jnp.int8)
    k_scale = mk(keys[2], (L, NB, NKV, BS), 0.01, 0.02, jnp.float32)
    v_scale = mk(keys[3], (L, NB, NKV, BS), 0.01, 0.02, jnp.float32)
    # distinct pages per (seq, slot): a permutation, like the allocator
    bt = jnp.asarray(
        rng.permutation(NB - 1)[:B * MB].reshape(B, MB).astype(np.int32))
    plens = jnp.full((B,), args.prefix, jnp.int32)
    q = mk(keys[4], (B, NKV * G, D), -1., 1., jnp.bfloat16)
    kn = mk(keys[5], (B, NKV, D), -1., 1., jnp.bfloat16)
    vn = mk(keys[6], (B, NKV, D), -1., 1., jnp.bfloat16)
    pk = mk(keys[7], (L, K, B, NKV, D), -1., 1., jnp.bfloat16)
    pv = mk(keys[7], (L, K, B, NKV, D), -1., 1., jnp.bfloat16)
    cnt = jnp.int32(args.count)

    @jax.jit
    def run(q, kn, vn, k_pages, v_pages, k_scale, v_scale, bt, plens, cnt,
            pk, pv):
        def body(c, lay):
            o = A.decode_attention_deferred(
                q, kn, vn, k_pages, v_pages, bt, plens, 1.0 / np.sqrt(D),
                k_scale=k_scale, v_scale=v_scale, layer=lay,
                pending=(pk, pv, cnt), manual=args.manual)
            return c + o.astype(jnp.float32).sum(), None
        c, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(L, dtype=jnp.int32))
        return c

    opd = (q, kn, vn, k_pages, v_pages, k_scale, v_scale, bt, plens, cnt,
           pk, pv)
    np.asarray(run(*opd))
    t0 = time.perf_counter()
    for _ in range(args.calls):
        r = run(*opd)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / args.calls
    us_layer = dt * 1e6 / L

    # bytes per layer the kernel fetches: valid pages per seq (clamped
    # table skips OOB refetches), K+V int8 + f32 scales + q + pending +
    # new-kv + out/m/l writes
    vp = -(-args.prefix // BS)
    kv_mb = B * vp * 2 * (NKV * BS * D) / 1e6
    sc_mb = B * vp * 2 * (NKV * BS * 4) / 1e6
    pend_mb = 2 * K * B * NKV * D * 2 / 1e6
    q_mb = B * NKV * G * D * 2 / 1e6
    out_mb = B * NKV * G * (D + 2) * 4 / 1e6
    tot_mb = kv_mb + sc_mb + pend_mb + q_mb + out_mb
    gbs = tot_mb / 1e3 / (us_layer / 1e6)
    print(f"mode={'NOCOMPUTE' if args.nocompute else 'full'}"
          f"{' manual' if args.manual else ''} "
          f"prefix={args.prefix} count={args.count} bs={BS}")
    print(f"{us_layer:7.2f} us/layer  ({dt*1e3:.2f} ms/{L}-layer call)")
    print(f"bytes/layer: kv={kv_mb:.1f} sc={sc_mb:.1f} pend={pend_mb:.1f} "
          f"q={q_mb:.2f} out={out_mb:.2f}  total={tot_mb:.1f} MB "
          f"-> {gbs:.0f} GB/s effective")
    print(f"floor @490 cold: {tot_mb/1e3/490*1e6:.1f} us/layer")


if __name__ == "__main__":
    main()
