"""Dump the optimized HLO of the engine's decode program (remote-safe).

The axon backend compiles behind a tunnel, so --xla_dump_to writes on the
server; this captures the decode call's concrete args and uses the AOT API
(.lower().compile().as_text()) instead. Prints per-fusion summaries to map
trace names (fusion.NNN) to real ops.

Usage: python tools/hlo_dump.py [--out /tmp/decode.hlo.txt]
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    ap.add_argument("--out", default="/tmp/decode.hlo.txt")
    args = ap.parse_args()
    args.prefill_budget = 1024
    args.steps = 64

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import bench
    from vllm_backend_public_tpu.engine.request import SamplingParams

    cfg = bench.flagship_cfg(args.model)
    engine = bench.build_engine(cfg, args, args.quant, args.kv_dtype)

    captured = {}
    orig = engine._decode_fn

    class Capture:
        def __call__(self, *a, **kw):
            captured["a"], captured["kw"] = a, kw
            return orig(*a, **kw)

    engine._decode_fn = Capture()

    rng = np.random.default_rng(0)
    sp = SamplingParams(max_tokens=96, temperature=0.0, ignore_eos=True)
    for _ in range(args.batch):
        engine.add_request(
            rng.integers(0, cfg.vocab_size, size=args.prompt_len).tolist(),
            sp)
    while engine.scheduler.num_waiting:
        engine.step()
    engine.step()
    engine.step()  # steady-state shapes (full K fusion)

    txt = orig.lower(*captured["a"], **captured["kw"]).compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt) / 1e6:.1f} MB)")

    # summarize each fusion computation: name -> list of big ops inside
    for m in re.finditer(r"^(%?[\w.\-]+)\s*(?:\([^)]*\))?\s*->[^{]*\{",
                         txt, re.M):
        pass


if __name__ == "__main__":
    main()
