"""Bisect the steady-state decode step: where do the milliseconds live?

Builds the standard bench engine (llama8b w8a8 int8-KV b64 by default),
runs steady-state decode under jax.profiler, and buckets DEVICE time per
fused multi-step call by op name (attention kernel custom-calls, int8
matmul fusions, cache scatter, everything else), plus the host-side
dispatch gap (wall - device).

Usage: python tools/step_bisect.py [--model llama8b] [--steps 64] ...
(flags mirror bench.py).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(tracedir):
    """Read the perfetto trace.json.gz jax.profiler wrote; return
    [(name, total_us, count)] for TensorCore ops."""
    # the profiler finishes writing trace.json.gz asynchronously after
    # the `with jax.profiler.trace(...)` block returns — poll briefly
    paths = []
    for _ in range(30):
        paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                          recursive=True)
        if paths:
            break
        time.sleep(1)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TensorCore pids (XLA Ops / XLA Modules lanes)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    op_pids = {p for p, n in pid_names.items()
               if "TensorCore" in n or "/device:TPU" in n or "XLA Ops" in n}
    if not op_pids:
        print("process lanes in trace:", sorted(set(pid_names.values())),
              file=sys.stderr)
    tot = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in op_pids:
            continue
        # thread lane name distinguishes "XLA Ops" vs "XLA Modules" etc.
        name = e.get("name", "?")
        dur = e.get("dur", 0)
        k = name
        c, n = tot.get(k, (0, 0))
        tot[k] = (c + dur, n + 1)
    return sorted(((k, v[0], v[1]) for k, v in tot.items()),
                  key=lambda x: -x[1])


def bucket(name):
    n = name.lower()
    if "fusion" in n and "scatter" in n:
        return "cache-scatter-fusion"
    if n.startswith("custom-call") or "tpu_custom_call" in n:
        return "pallas-attention"
    if "dynamic-update-slice" in n or "scatter" in n:
        return "scatter/update"
    if "convert" in n:
        return "convert"
    if "fusion" in n:
        return "fusion(matmul/elementwise)"
    if "copy" in n or "bitcast" in n:
        return "copy"
    if "dot" in n or "convolution" in n:
        return "dot"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama8b")
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--kv-dtype", default="int8")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--max-model-len", type=int, default=384)
    ap.add_argument("--multi-step", type=int, default=32)
    ap.add_argument("--prof-calls", type=int, default=2)
    ap.add_argument("--tracedir", default="/tmp/step_bisect_trace")
    args = ap.parse_args()
    args.prefill_budget = 1024
    args.steps = 64

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import bench
    from vllm_backend_public_tpu.engine.request import SamplingParams

    cfg = bench.flagship_cfg(args.model)
    engine = bench.build_engine(cfg, args, args.quant, args.kv_dtype)

    B = args.batch
    rng = np.random.default_rng(0)
    n_calls = args.prof_calls
    # keep prompt + all decode tokens within max_model_len (bench.py sizes
    # the same way: overflowing the window causes preemption thrash)
    budget = (2 + 2 * n_calls + 1) * args.multi_step
    assert args.prompt_len + budget <= args.max_model_len, \
        "budget overflows max_model_len; lower --prof-calls"
    sp = SamplingParams(max_tokens=budget, temperature=0.0, ignore_eos=True)
    for _ in range(B):
        engine.add_request(
            rng.integers(0, cfg.vocab_size, size=args.prompt_len).tolist(),
            sp)
    while engine.scheduler.num_waiting:
        engine.step()
    for _ in range(2):
        engine.step()

    # wall-clock per call (no profiler)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        engine.step()
    wall_call = (time.perf_counter() - t0) / n_calls

    os.system(f"rm -rf {args.tracedir}")
    with jax.profiler.trace(args.tracedir):
        for _ in range(n_calls):
            engine.step()

    ops = parse_trace(args.tracedir)
    steps_per_call = args.multi_step
    print(f"wall/call = {wall_call * 1e3:.2f} ms  "
          f"({wall_call / steps_per_call * 1e3:.2f} ms/step, B={B})")
    if ops is None:
        print("no trace found", file=sys.stderr)
        return
    buckets = {}
    for name, us, cnt in ops:
        b = bucket(name)
        c, n = buckets.get(b, (0, 0))
        buckets[b] = (c + us, n + cnt)
    total_us = sum(v[0] for v in buckets.values())
    print(f"device total/call = {total_us / n_calls / 1e3:.2f} ms  "
          f"dispatch gap = {(wall_call - total_us / n_calls / 1e6) * 1e3:.2f}"
          f" ms/call")
    print("\n-- buckets (per call) --")
    for b, (us, cnt) in sorted(buckets.items(), key=lambda x: -x[1][0]):
        print(f"{us / n_calls / 1e3:9.3f} ms  x{cnt // n_calls:<5} {b}")
    print("\n-- top 60 ops (per call) --")
    for name, us, cnt in ops[:60]:
        print(f"{us / n_calls / 1e3:9.3f} ms  x{cnt // n_calls:<5} "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
