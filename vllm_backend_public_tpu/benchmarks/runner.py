"""Benchmark job runner — the in-repo replacement for the benchmark Job
pods the reference launches against vLLM.

Flow (closing the reference's loop, SURVEY.md §3.1): read eval config →
wait for engine /health → drive /v1/completions with a concurrent workload
→ compute throughput/TTFT/ITL percentiles → POST raw + standardized
results to the results service (reference contract:
benchmark-results /raw_input, /standardized_output).

Config (JSON at $EVAL_CONFIG_PATH, all optional):
  {"benchmark_name": "...", "num_requests": 32, "concurrency": 8,
   "prompt_len": 64, "max_tokens": 32, "temperature": 0.0,
   "endpoint": "http://..." (falls back to $ENGINE_ENDPOINT /
   $VLLM_MODEL_ENDPOINT), "stream": true}
"""

from __future__ import annotations

import asyncio
import json
import os
import random
import string
import time
from typing import List, Optional

import aiohttp


def _pct(vals: List[float], p: float) -> Optional[float]:
    if not vals:
        return None
    vals = sorted(vals)
    idx = min(int(len(vals) * p / 100), len(vals) - 1)
    return vals[idx]


async def wait_ready(session: aiohttp.ClientSession, endpoint: str,
                     tries: int = 60, delay: float = 2.0) -> bool:
    for _ in range(tries):
        try:
            async with session.get(f"{endpoint}/health",
                                   timeout=aiohttp.ClientTimeout(total=3)) as r:
                if r.status == 200:
                    return True
        except Exception:
            pass
        await asyncio.sleep(delay)
    return False


async def one_request(session: aiohttp.ClientSession, endpoint: str,
                      cfg: dict, rng: random.Random) -> dict:
    prompt = "".join(rng.choices(string.ascii_lowercase + " ",
                                 k=cfg.get("prompt_len", 64)))
    body = {"model": cfg.get("model", "default"), "prompt": prompt,
            "max_tokens": cfg.get("max_tokens", 32),
            "temperature": cfg.get("temperature", 0.0),
            "ignore_eos": True, "stream": True}
    t0 = time.perf_counter()
    ttft = None
    itls: List[float] = []
    ntok = 0
    last = t0
    async with session.post(f"{endpoint}/v1/completions", json=body) as r:
        if r.status != 200:
            return {"error": r.status}
        async for line in r.content:
            if not line.startswith(b"data: "):
                continue
            payload = line[len(b"data: "):].strip()
            if payload == b"[DONE]":
                break
            now = time.perf_counter()
            if ttft is None:
                ttft = now - t0
            else:
                itls.append(now - last)
            last = now
            ntok += 1
    return {"ttft": ttft, "itls": itls, "ntok": ntok,
            "latency": time.perf_counter() - t0}


async def run(cfg: dict) -> dict:
    endpoint = (cfg.get("endpoint") or os.environ.get("ENGINE_ENDPOINT")
                or os.environ.get("VLLM_MODEL_ENDPOINT") or "")
    if not endpoint:
        raise SystemExit("no engine endpoint configured")
    n = cfg.get("num_requests", 16)
    conc = cfg.get("concurrency", 4)
    rng = random.Random(cfg.get("seed", 0))
    sem = asyncio.Semaphore(conc)
    async with aiohttp.ClientSession() as session:
        ok = await wait_ready(session, endpoint,
                              tries=cfg.get("ready_tries", 60))
        if not ok:
            raise SystemExit(f"engine at {endpoint} never became healthy")

        async def guarded():
            async with sem:
                return await one_request(session, endpoint, cfg, rng)

        t0 = time.perf_counter()
        results = await asyncio.gather(*(guarded() for _ in range(n)))
        wall = time.perf_counter() - t0

    good = [r for r in results if "error" not in r]
    all_itl = [x for r in good for x in r["itls"]]
    total_tokens = sum(r["ntok"] for r in good)
    metrics = {
        "num_requests": n, "failed": len(results) - len(good),
        "wall_s": wall,
        "output_tokens": total_tokens,
        "throughput_tok_s": total_tokens / wall if wall else 0,
        "requests_per_s": len(good) / wall if wall else 0,
        "ttft_p50_ms": (_pct([r["ttft"] for r in good if r["ttft"]], 50)
                        or 0) * 1e3,
        "ttft_p99_ms": (_pct([r["ttft"] for r in good if r["ttft"]], 99)
                        or 0) * 1e3,
        "itl_p50_ms": (_pct(all_itl, 50) or 0) * 1e3,
        "itl_p99_ms": (_pct(all_itl, 99) or 0) * 1e3,
    }
    return metrics


async def push_results(metrics: dict, cfg: dict) -> None:
    results_url = os.environ.get("RESULTS_URL", "")
    if not results_url:
        return
    payload = {
        "run_id": os.environ.get("RUN_ID", f"run-{int(time.time())}"),
        "benchmark_name": cfg.get("benchmark_name", "serving"),
        "timestamp": time.strftime("%Y%m%d-%H%M%S"),
        "model_id": cfg.get("model", "default"),
        "tokenizer_id": cfg.get("model", "default"),
        "source": "benchmark-runner",
    }
    async with aiohttp.ClientSession() as session:
        await session.post(f"{results_url}/raw_input",
                           json={**payload, "data": metrics})
        await session.post(f"{results_url}/standardized_output",
                           json={**payload, "data": {
                               "throughput_tok_s":
                                   metrics["throughput_tok_s"],
                               "ttft_p50_ms": metrics["ttft_p50_ms"],
                               "ttft_p99_ms": metrics["ttft_p99_ms"],
                               "itl_p50_ms": metrics["itl_p50_ms"],
                               "itl_p99_ms": metrics["itl_p99_ms"]}})


def main():
    cfg_path = os.environ.get("EVAL_CONFIG_PATH", "")
    cfg = {}
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)

    async def go():
        metrics = await run(cfg)
        print(json.dumps(metrics))
        await push_results(metrics, cfg)

    asyncio.run(go())


if __name__ == "__main__":
    main()
