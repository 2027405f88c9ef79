"""DP request-router tests (server/router.py).

The reference's data parallelism is replicaCount behind a K8s Service
(reference: benchmark-vllm/vllm_manager.py:370); ours is engine replicas
behind the least-outstanding-requests router. Stub upstream servers keep
these fast; the real-engine path is covered by the server contract tests.
"""

import asyncio
import json

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from vllm_backend_public_tpu.server.router import DPRouter


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def make_stub(name, healthy=True, fail=False):
    """Upstream stub: /health, an echo endpoint, and an SSE stream."""
    app = web.Application()
    state = {"requests": 0}

    async def health(req):
        if not healthy:
            return web.json_response({"status": "bad"}, status=503)
        return web.json_response({"status": "healthy"})

    async def completions(req):
        state["requests"] += 1
        if fail:
            raise web.HTTPInternalServerError()
        body = await req.json()
        return web.json_response({"replica": name, "echo": body})

    async def stream(req):
        resp = web.StreamResponse()
        resp.headers["Content-Type"] = "text/event-stream"
        await resp.prepare(req)
        for i in range(3):
            await resp.write(f"data: {name}-{i}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    app.router.add_get("/health", health)
    app.router.add_post("/v1/completions", completions)
    app.router.add_get("/stream", stream)
    return app, state


def test_routing_and_aggregate_health():
    async def go():
        a_app, a_state = make_stub("a")
        b_app, b_state = make_stub("b")
        async with TestServer(a_app) as sa, TestServer(b_app) as sb:
            router = DPRouter([str(sa.make_url("/")), str(sb.make_url("/"))],
                              health_interval=0.1)
            async with TestClient(TestServer(router.build_app())) as c:
                await asyncio.sleep(0.3)  # health sweep
                r = await c.get("/health")
                assert r.status == 200
                data = await r.json()
                assert data["status"] == "healthy"
                assert all(x["healthy"] for x in data["replicas"])
                # requests spread over both replicas
                seen = set()
                for _ in range(8):
                    r = await c.post("/v1/completions",
                                     json={"prompt": "hi"})
                    assert r.status == 200
                    seen.add((await r.json())["replica"])
                assert seen == {"a", "b"}
                assert a_state["requests"] > 0 and b_state["requests"] > 0

    run(go())


def test_unhealthy_replica_excluded_and_recovers():
    async def go():
        a_app, a_state = make_stub("a")
        b_app, b_state = make_stub("b", healthy=False)
        async with TestServer(a_app) as sa, TestServer(b_app) as sb:
            router = DPRouter([str(sa.make_url("/")), str(sb.make_url("/"))],
                              health_interval=0.05, fail_threshold=1)
            async with TestClient(TestServer(router.build_app())) as c:
                await asyncio.sleep(0.2)
                for _ in range(4):
                    r = await c.post("/v1/completions", json={})
                    assert (await r.json())["replica"] == "a"
                assert b_state["requests"] == 0
                r = await c.get("/health")
                d = await r.json()
                healthy = {x["url"]: x["healthy"] for x in d["replicas"]}
                assert sum(healthy.values()) == 1

    run(go())


def test_all_down_returns_503():
    async def go():
        router = DPRouter(["http://127.0.0.1:1"],  # nothing listening
                          health_interval=0.05, fail_threshold=1)
        async with TestClient(TestServer(router.build_app())) as c:
            await asyncio.sleep(0.2)
            r = await c.post("/v1/completions", json={})
            assert r.status == 503
            r = await c.get("/health")
            assert r.status == 503

    run(go())


def test_streaming_passthrough():
    async def go():
        a_app, _ = make_stub("a")
        async with TestServer(a_app) as sa:
            router = DPRouter([str(sa.make_url("/"))], health_interval=0.05)
            async with TestClient(TestServer(router.build_app())) as c:
                await asyncio.sleep(0.15)
                r = await c.get("/stream")
                assert r.status == 200
                body = await r.text()
                assert "data: a-0" in body and "data: [DONE]" in body

    run(go())


def test_engine_command_maps_dp_to_replicas():
    from vllm_backend_public_tpu.services.deployer.service import \
        engine_command

    cmd = engine_command({"demo": True, "data_parallel_size": 2}, 9000)
    assert "--dp-replicas" in cmd
    assert cmd[cmd.index("--dp-replicas") + 1] == "2"
    assert "--data-parallel-size" not in cmd
    cmd1 = engine_command({"demo": True, "data_parallel_size": 1}, 9000)
    assert "--dp-replicas" not in cmd1
