"""Engine server CLI.

The in-repo replacement for the external `vllm/vllm-openai` image the
reference deploys: flags mirror the vLLM arg surface the reference
assembles (reference: benchmark-vllm/vllm_templates.py:50-87 — model,
served-model-name, block-size, max-num-seqs, max-model-len, dtype,
quantization, tensor/pipeline-parallel sizes).

  python -m vllm_backend_public_tpu.server --model /path/to/hf_dir --port 8000
  python -m vllm_backend_public_tpu.server --demo --port 8000   # tiny random model
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Optional, Sequence


class ByteTokenizer:
    """Dependency-free byte-level tokenizer for --demo and tests."""

    eos_token_id = 0
    hf = None
    chat_template = None

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        return [b + 1 for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True):
        # demo vocab can exceed 256; fold sampled ids onto the byte range
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(
            "utf-8", errors="replace")


class _ByteDetokCompat:
    """Adapter so IncrementalDetokenizer can call .hf.decode on ByteTokenizer."""

    def __init__(self, outer):
        self._outer = outer

    def decode(self, ids, skip_special_tokens=True):
        return self._outer.decode(ids)


def build_demo_engine(args):
    import jax
    import jax.numpy as jnp

    from ..engine.config import EngineConfig
    from ..engine.engine import LLMEngine
    from ..loader.hf import parse_hf_config
    from ..models.llama import init_random_params

    cfg = parse_hf_config({
        "architectures": ["LlamaForCausalLM"], "vocab_size": 512,
        "hidden_size": 128, "intermediate_size": 256, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "max_position_embeddings": 2048, "rms_norm_eps": 1e-5,
        "eos_token_id": 0})
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    params = init_random_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    econ = EngineConfig(
        model="demo", served_model_name=args.served_model_name or "demo",
        dtype="float32" if dtype == jnp.float32 else "bfloat16",
        block_size=args.block_size, max_num_seqs=args.max_num_seqs,
        max_model_len=min(args.max_model_len, 512),
        num_kv_blocks=args.max_num_seqs * 40 + 1)
    tok = ByteTokenizer()
    tok.hf = _ByteDetokCompat(tok)
    return LLMEngine(econ, model_cfg=cfg, params=params, tokenizer=tok), tok


def build_engine(args):
    from ..engine.config import EngineConfig
    from ..engine.engine import LLMEngine
    from ..engine.tokenizer import Tokenizer

    econ = EngineConfig(
        model=args.model, served_model_name=args.served_model_name,
        dtype=args.dtype, quantization=args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
        block_size=args.block_size, max_num_seqs=args.max_num_seqs,
        max_model_len=args.max_model_len,
        max_num_batched_tokens=args.max_num_batched_tokens,
        hbm_utilization=args.hbm_utilization,
        tensor_parallel_size=args.tensor_parallel_size,
        data_parallel_size=args.data_parallel_size,
        pipeline_parallel_size=getattr(args, "pipeline_parallel_size", 1),
        expert_parallel_size=getattr(args, "expert_parallel_size", 1),
        num_speculative_tokens=getattr(args, "num_speculative_tokens", 0))
    tok = Tokenizer.from_path(args.model)
    return LLMEngine(econ, tokenizer=tok), tok


def _run_dp_replicas(args, argv):
    """Spawn N single-replica servers and front them with the DP router.

    Each replica is this same server binary minus the --dp-replicas flag,
    on port+1..port+N; the router serves --port with health-checked
    least-outstanding-requests routing (server/router.py)."""
    import subprocess
    import sys

    src = list(argv if argv is not None else sys.argv[1:])
    base = []
    skip = False
    for i, tok in enumerate(src):
        if skip:
            skip = False
            continue
        if tok in ("--dp-replicas", "--port"):
            skip = True
            continue
        if tok.startswith("--dp-replicas=") or tok.startswith("--port="):
            continue
        base.append(tok)

    ports = [args.port + 1 + i for i in range(args.dp_replicas)]
    procs = []
    try:
        for p in ports:
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "vllm_backend_public_tpu.server",
                 *base, "--port", str(p)]))
        logging.info("dp replicas on ports %s; router on %d", ports,
                     args.port)
        from aiohttp import web

        from .router import DPRouter
        router = DPRouter([f"http://127.0.0.1:{p}" for p in ports])
        web.run_app(router.build_app(), host=args.host, port=args.port)
    finally:
        for pr in procs:
            pr.terminate()
        for pr in procs:
            try:
                pr.wait(timeout=10)
            except Exception:
                pr.kill()


def main(argv=None):
    ap = argparse.ArgumentParser("vllm-backend-public-tpu server")
    ap.add_argument("--model", default=None, help="HF model directory")
    ap.add_argument("--demo", action="store_true",
                    help="serve a tiny random-weight model (no files needed)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--served-model-name", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--kv-cache-dtype", default=None)
    ap.add_argument("--block-size", type=int, default=64)
    ap.add_argument("--max-num-seqs", type=int, default=8)
    ap.add_argument("--max-model-len", type=int, default=2048)
    ap.add_argument("--max-num-batched-tokens", type=int, default=512)
    ap.add_argument("--hbm-utilization", type=float, default=0.9)
    ap.add_argument("--tensor-parallel-size", type=int, default=1)
    ap.add_argument("--data-parallel-size", type=int, default=1)
    ap.add_argument("--pipeline-parallel-size", type=int, default=1)
    ap.add_argument("--expert-parallel-size", type=int, default=1)
    ap.add_argument("--num-speculative-tokens", type=int, default=0,
                    help="speculative decoding: draft K tokens per round "
                         "(host-side n-gram speculator) and verify all "
                         "K+1 positions in one forward; greedy-only, "
                         "same flag name as vLLM")
    # multi-host SPMD runtime (TPU pod slice). The TPU-native replacement
    # for vLLM's NCCL/Ray world bring-up (--worker-use-ray etc., reference
    # configs/test_small_model.yaml:25): every host runs this same server
    # binary; jax.distributed.initialize wires the slice over ICI/DCN and
    # GSPMD compiles the collectives into the jitted step.
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize() (multi-host "
                         "pod slice; coordinator/process env auto-detected "
                         "on TPU, or set --coordinator-address)")
    ap.add_argument("--coordinator-address", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    # DP-as-replicas: N engine processes + the least-outstanding-requests
    # router in front (server/router.py) — the in-repo analog of the
    # reference's replicaCount behind a K8s Service
    # (reference vllm_manager.py:370)
    ap.add_argument("--dp-replicas", type=int, default=0,
                    help="spawn N engine replicas on port+1..port+N and "
                         "serve a request router on --port")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    # Re-apply JAX_PLATFORMS through jax.config: in environments where jax
    # is pre-imported with a remote TPU plugin (sitecustomize), env-var
    # platform selection can touch — and block on — the remote backend
    # during discovery; the config path does not.
    import os as _os

    if _os.environ.get("JAX_PLATFORMS"):
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    # SIGUSR1 dumps all thread stacks (debug hung engines in production)
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1, all_threads=True)
    if not args.demo and not args.model:
        ap.error("--model or --demo required")

    if args.dp_replicas > 1:
        return _run_dp_replicas(args, argv)

    if args.distributed:
        import jax

        kw = {}
        if args.coordinator_address:
            kw["coordinator_address"] = args.coordinator_address
        if args.num_processes is not None:
            kw["num_processes"] = args.num_processes
        if args.process_id is not None:
            kw["process_id"] = args.process_id
        jax.distributed.initialize(**kw)
        logging.info("distributed runtime: process %d/%d, %d devices",
                     jax.process_index(), jax.process_count(),
                     len(jax.devices()))

    engine, tok = (build_demo_engine(args) if args.demo
                   else build_engine(args))

    from aiohttp import web

    from .async_engine import AsyncEngineRunner
    from .openai_api import OpenAIServer

    runner = AsyncEngineRunner(engine)
    server = OpenAIServer(runner, tok, engine.econfig.served_model_name)
    web.run_app(server.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
