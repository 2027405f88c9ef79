"""HTTP-contract tests: the exact surface the reference control plane
probes on its engine pods (/health, /v1/models, /v1/completions —
reference: benchmark-vllm/vllm_templates.py:182-201, benchmark-eval/main.py:105,
benchmark-deployer/docs/deployment/post_run.md:46), plus chat + streaming.

Runs the real server binary in a subprocess with --demo (tiny random model,
CPU) and drives it over a socket — replacing the reference's curl playbooks
with automated tests.
"""

import json
import os
import socket
import subprocess
import sys
import time

import pytest
import requests


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "vllm_backend_public_tpu.server", "--demo",
         "--port", str(port), "--host", "127.0.0.1",
         "--max-num-seqs", "4"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if requests.get(base + "/health", timeout=1).status_code == 200:
                    break
            except requests.ConnectionError:
                if proc.poll() is not None:
                    out = proc.stdout.read().decode()
                    raise RuntimeError(f"server died:\n{out}")
                time.sleep(0.5)
        else:
            raise TimeoutError("server did not become healthy")
        yield base
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_health(server):
    r = requests.get(server + "/health")
    assert r.status_code == 200
    assert r.json()["status"] == "healthy"


def test_models(server):
    r = requests.get(server + "/v1/models")
    assert r.status_code == 200
    data = r.json()
    assert data["object"] == "list"
    assert data["data"][0]["id"] == "demo"


def test_completions(server):
    r = requests.post(server + "/v1/completions", json={
        "model": "demo", "prompt": "hello world", "max_tokens": 8,
        "temperature": 0.0, "ignore_eos": True})
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["object"] == "text_completion"
    assert body["choices"][0]["finish_reason"] == "length"
    assert body["usage"]["completion_tokens"] == 8
    assert body["usage"]["prompt_tokens"] > 0


def test_completions_batch_prompts(server):
    r = requests.post(server + "/v1/completions", json={
        "model": "demo", "prompt": ["abc", "defgh"], "max_tokens": 4,
        "temperature": 0.0, "ignore_eos": True})
    assert r.status_code == 200
    assert len(r.json()["choices"]) == 2


def test_completions_deterministic_with_seed(server):
    def go():
        return requests.post(server + "/v1/completions", json={
            "model": "demo", "prompt": "determinism", "max_tokens": 8,
            "temperature": 0.9, "seed": 7, "ignore_eos": True}).json()
    a, b = go(), go()
    assert a["choices"][0]["text"] == b["choices"][0]["text"]


def test_completions_streaming(server):
    r = requests.post(server + "/v1/completions", json={
        "model": "demo", "prompt": "stream me", "max_tokens": 6,
        "temperature": 0.0, "stream": True, "ignore_eos": True}, stream=True)
    assert r.status_code == 200
    assert r.headers["Content-Type"].startswith("text/event-stream")
    events = []
    for line in r.iter_lines():
        if line.startswith(b"data: "):
            payload = line[len(b"data: "):]
            if payload == b"[DONE]":
                events.append("DONE")
            else:
                events.append(json.loads(payload))
    assert events[-1] == "DONE"
    assert any(isinstance(e, dict) and e["choices"][0]["text"]
               for e in events[:-1])
    finishes = [e for e in events[:-1]
                if isinstance(e, dict) and e["choices"][0]["finish_reason"]]
    assert finishes, "no finish_reason chunk seen"


def test_chat_completions(server):
    r = requests.post(server + "/v1/chat/completions", json={
        "model": "demo",
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 5, "temperature": 0.0, "ignore_eos": True})
    assert r.status_code == 200
    body = r.json()
    assert body["object"] == "chat.completion"
    assert body["choices"][0]["message"]["role"] == "assistant"


def test_bad_requests(server):
    r = requests.post(server + "/v1/completions", json={"model": "demo"})
    assert r.status_code == 400
    r = requests.post(server + "/v1/completions", data="not json",
                      headers={"Content-Type": "application/json"})
    assert r.status_code == 400
    r = requests.post(server + "/v1/chat/completions", json={"model": "demo"})
    assert r.status_code == 400


def test_status_and_metrics(server):
    s = requests.get(server + "/status").json()
    assert "generated_tokens" in s and s["model"] == "demo"
    m = requests.get(server + "/metrics").text
    assert "engine_generated_tokens" in m


def test_completions_logprobs(server):
    r = requests.post(server + "/v1/completions", json={
        "model": "demo", "prompt": "logprob test", "max_tokens": 4,
        "temperature": 0.0, "logprobs": 3, "ignore_eos": True})
    assert r.status_code == 200, r.text
    lp = r.json()["choices"][0]["logprobs"]
    assert lp is not None
    assert len(lp["tokens"]) == 4
    assert all(x <= 0 for x in lp["token_logprobs"])
    # byte-fallback demo tokenizer can fold distinct ids to one string,
    # deduping dict keys — bound, don't pin, the width
    assert all(1 <= len(t) <= 3 for t in lp["top_logprobs"])


def test_completions_echo_scoring(server):
    """lm-eval loglikelihood pattern: echo + logprobs + max_tokens=0."""
    r = requests.post(server + "/v1/completions", json={
        "model": "demo", "prompt": "score this prompt", "max_tokens": 0,
        "echo": True, "logprobs": 0})
    assert r.status_code == 200, r.text
    c = r.json()["choices"][0]
    lp = c["logprobs"]
    assert lp["token_logprobs"][0] is None
    assert len(lp["token_logprobs"]) == len(lp["tokens"])
    assert all(x <= 0 for x in lp["token_logprobs"][1:])
    assert c["text"].startswith("score")
