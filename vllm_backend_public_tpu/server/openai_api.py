"""OpenAI-compatible HTTP serving layer (aiohttp).

Serves exactly the contract the reference control plane probes on its vLLM
pods — /health readiness (reference: benchmark-vllm/vllm_templates.py:182-201),
/v1/models listing (benchmark-eval/main.py:105), /v1/completions benchmark
traffic (benchmark-deployer/docs/deployment/post_run.md:46) — plus
/v1/chat/completions, /status and /metrics for engine observability
(tokens/s, KV occupancy, queue depth).
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Optional

from aiohttp import web

from ..engine.request import SamplingParams
from ..engine.tokenizer import IncrementalDetokenizer
from .async_engine import AsyncEngineRunner


def _now() -> int:
    return int(time.time())


class OpenAIServer:
    def __init__(self, runner: AsyncEngineRunner, tokenizer,
                 served_model_name: str):
        self.runner = runner
        self.tokenizer = tokenizer
        self.model_name = served_model_name
        self.start_time = time.time()

    # ------------------------------------------------------------ routing

    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/health", self.health)
        app.router.add_get("/status", self.status)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_get("/v1/models", self.models)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/debug/profile/start", self.profile_start)
        app.router.add_post("/debug/profile/stop", self.profile_stop)
        app.on_startup.append(self._on_startup)
        app.on_cleanup.append(self._on_cleanup)
        return app

    async def _on_startup(self, app):
        import asyncio
        self.runner.start(asyncio.get_running_loop())

    async def _on_cleanup(self, app):
        self.runner.shutdown()

    # ----------------------------------------------------------- handlers

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "healthy"})

    async def status(self, request: web.Request) -> web.Response:
        s = self.runner.stats()
        s.update(model=self.model_name, uptime_s=time.time() - self.start_time)
        return web.json_response(s)

    async def metrics(self, request: web.Request) -> web.Response:
        """Prometheus-style plaintext metrics."""
        s = self.runner.stats()
        lines = []
        for k, v in s.items():
            if isinstance(v, (int, float)):
                lines.append(f"engine_{k} {v}")
        return web.Response(text="\n".join(lines) + "\n")

    async def profile_start(self, request: web.Request) -> web.Response:
        """Start a jax.profiler device trace (the tracing subsystem the
        reference only aspires to in its design doc — SURVEY.md §5)."""
        import jax

        body = await request.json() if request.can_read_body else {}
        log_dir = body.get("log_dir", "/tmp/vbpt-profile")
        try:
            jax.profiler.start_trace(log_dir)
        except RuntimeError as e:
            return self._err(409, str(e))
        return web.json_response({"status": "tracing", "log_dir": log_dir})

    async def profile_stop(self, request: web.Request) -> web.Response:
        import jax

        try:
            jax.profiler.stop_trace()
        except RuntimeError as e:
            return self._err(409, str(e))
        return web.json_response({"status": "stopped"})

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": _now(), "owned_by": "vllm-backend-public-tpu"}],
        })

    def _sampling_from(self, body: dict) -> SamplingParams:
        stop = body.get("stop") or ()
        if isinstance(stop, str):
            stop = (stop,)
        return SamplingParams(
            max_tokens=int(body.get("max_tokens", 16)),
            temperature=float(body.get("temperature", 1.0)),
            top_p=float(body.get("top_p", 1.0)),
            top_k=int(body.get("top_k", 0)),
            min_p=float(body.get("min_p", 0.0)),
            seed=body.get("seed"),
            stop=tuple(stop),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            repetition_penalty=float(body.get("repetition_penalty", 1.0)),
            ignore_eos=bool(body.get("ignore_eos", False)),
            logprobs=body.get("logprobs"),
            echo=bool(body.get("echo", False)),
        )

    async def completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return self._err(400, "invalid JSON body")
        prompt = body.get("prompt")
        if prompt is None:
            return self._err(400, "missing 'prompt'")
        prompts = prompt if isinstance(prompt, list) else [prompt]
        if len(prompts) != 1 and body.get("stream"):
            return self._err(400, "stream supports a single prompt")
        sampling = self._sampling_from(body)
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"
        priority = body.get("priority", "medium")

        if body.get("stream"):
            return await self._stream_completion(request, prompts[0],
                                                 sampling, rid, priority)

        n = max(int(body.get("n", 1)), 1)
        expanded = [(p, j) for p in prompts for j in range(n)]
        choices = []
        usage_p = usage_c = 0
        for i, (p, _j) in enumerate(expanded):
            prompt_ids = self._encode(p)
            lp_obj = None
            if sampling.max_tokens == 0:
                # pure scoring (echo + logprobs, lm-eval loglikelihood)
                text, finish, ntok = "", "length", 0
                if sampling.echo and sampling.logprobs is not None:
                    lp_obj = await self._prompt_logprobs(prompt_ids)
            else:
                samp_i = sampling
                if _j and sampling.seed is not None:
                    import dataclasses
                    samp_i = dataclasses.replace(sampling,
                                                 seed=sampling.seed + _j)
                text, finish, ntok, gen_lp = await self._collect(
                    prompt_ids, samp_i, f"{rid}-{i}", priority)
                if sampling.logprobs is not None:
                    lp_obj = self._format_logprobs(gen_lp,
                                                   sampling.logprobs)
                    if sampling.echo:
                        pre = await self._prompt_logprobs(prompt_ids)
                        lp_obj = {k: pre[k] + lp_obj[k] for k in lp_obj}
            if sampling.echo:
                text = (p if isinstance(p, str) else
                        self.tokenizer.decode(prompt_ids)) + text
            choices.append({"index": i, "text": text,
                            "finish_reason": finish, "logprobs": lp_obj})
            usage_p += len(prompt_ids)
            usage_c += ntok
        return web.json_response({
            "id": rid, "object": "text_completion", "created": _now(),
            "model": body.get("model", self.model_name),
            "choices": choices,
            "usage": {"prompt_tokens": usage_p, "completion_tokens": usage_c,
                      "total_tokens": usage_p + usage_c},
        })

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return self._err(400, "invalid JSON body")
        messages = body.get("messages")
        if not messages:
            return self._err(400, "missing 'messages'")
        prompt_ids = self._encode_chat(messages)
        sampling = self._sampling_from(body)
        rid = f"chatcmpl-{uuid.uuid4().hex[:24]}"

        if body.get("stream"):
            return await self._stream_chat(request, prompt_ids, sampling, rid)

        text, finish, ntok, _ = await self._collect(
            prompt_ids, sampling, rid, body.get("priority", "medium"))
        return web.json_response({
            "id": rid, "object": "chat.completion", "created": _now(),
            "model": body.get("model", self.model_name),
            "choices": [{"index": 0,
                         "message": {"role": "assistant", "content": text},
                         "finish_reason": finish}],
            "usage": {"prompt_tokens": len(prompt_ids),
                      "completion_tokens": ntok,
                      "total_tokens": len(prompt_ids) + ntok},
        })

    # ------------------------------------------------------------ helpers

    def _encode(self, prompt):
        if isinstance(prompt, list):  # pre-tokenized
            return [int(t) for t in prompt]
        return self.tokenizer.encode(prompt)

    def _encode_chat(self, messages):
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None and getattr(hf, "chat_template", None):
            return hf.apply_chat_template(messages, tokenize=True,
                                          add_generation_prompt=True)
        # fallback: simple role-tagged transcript
        text = "".join(f"{m.get('role', 'user')}: {m.get('content', '')}\n"
                       for m in messages) + "assistant: "
        return self.tokenizer.encode(text)

    def _matched_stop(self, text: str, stops) -> Optional[int]:
        for s in stops:
            idx = text.find(s)
            if idx >= 0:
                return idx
        return None

    async def _collect(self, prompt_ids, sampling, rid, priority):
        detok = IncrementalDetokenizer(self.tokenizer, prompt_ids)
        text = ""
        finish = None
        ntok = 0
        lp_entries: list = []
        token_ids: list = []
        async for out in self.runner.submit(prompt_ids, sampling, priority,
                                            rid):
            text += detok.push(out.new_token_ids)
            ntok = len(out.output_token_ids)
            token_ids.extend(out.new_token_ids)
            if out.logprobs:
                lp_entries.extend(out.logprobs)
            finish = out.finish_reason
            if sampling.stop:
                cut = self._matched_stop(text, sampling.stop)
                if cut is not None:
                    self.runner.abort(rid)
                    return (text[:cut], "stop", ntok,
                            (token_ids, lp_entries))
        return text, finish or "stop", ntok, (token_ids, lp_entries)

    def _format_logprobs(self, gen_lp, k: int) -> dict:
        token_ids, entries = gen_lp
        toks, lps, tops = [], [], []
        for tid, e in zip(token_ids, entries):
            toks.append(self.tokenizer.decode([tid]))
            lps.append(e["logprob"])
            tops.append({self.tokenizer.decode([t]): lp
                         for t, lp in e["top"][:k]})
        return {"tokens": toks, "token_logprobs": lps,
                "top_logprobs": tops,
                "text_offset": [0] * len(toks)}

    async def _prompt_logprobs(self, prompt_ids) -> dict:
        lps = await self.runner.score(prompt_ids)
        toks = [self.tokenizer.decode([t]) for t in prompt_ids]
        return {"tokens": toks, "token_logprobs": lps,
                "top_logprobs": [None] * len(toks),
                "text_offset": [0] * len(toks)}

    async def _stream_completion(self, request, prompt, sampling, rid,
                                 priority):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        prompt_ids = self._encode(prompt)
        detok = IncrementalDetokenizer(self.tokenizer, prompt_ids)
        text_so_far = ""
        async for out in self.runner.submit(prompt_ids, sampling,
                                            priority, rid):
            delta = detok.push(out.new_token_ids)
            stopped = False
            if sampling.stop and delta:
                cut = self._matched_stop(text_so_far + delta, sampling.stop)
                if cut is not None:
                    delta = (text_so_far + delta)[:cut][len(text_so_far):]
                    stopped = True
            text_so_far += delta
            if delta or out.finished or stopped:
                chunk = {"id": rid, "object": "text_completion",
                         "created": _now(), "model": self.model_name,
                         "choices": [{"index": 0, "text": delta,
                                      "finish_reason":
                                          ("stop" if stopped
                                           else out.finish_reason)}]}
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            if stopped:
                self.runner.abort(rid)
                break
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def _stream_chat(self, request, prompt_ids, sampling, rid):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        detok = IncrementalDetokenizer(self.tokenizer, prompt_ids)
        first = True
        async for out in self.runner.submit(prompt_ids, sampling, "medium",
                                            rid):
            delta = detok.push(out.new_token_ids)
            if delta or out.finished:
                d = {"content": delta}
                if first:
                    d["role"] = "assistant"
                    first = False
                chunk = {"id": rid, "object": "chat.completion.chunk",
                         "created": _now(), "model": self.model_name,
                         "choices": [{"index": 0, "delta": d,
                                      "finish_reason": out.finish_reason}]}
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _err(self, code: int, msg: str) -> web.Response:
        return web.json_response(
            {"error": {"message": msg, "type": "invalid_request_error"}},
            status=code)
