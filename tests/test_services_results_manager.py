"""Results + Manager service tests (in-process aiohttp TestClient)."""

import asyncio
import os

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_backend_public_tpu.services.results.service import ResultsService
from vllm_backend_public_tpu.services.manager.service import ManagerService


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def with_client(service, fn):
    async def inner():
        async with TestClient(TestServer(service.build_app())) as client:
            return await fn(client)
    return run(inner())


# ----------------------------------------------------------------- results

def test_results_upsert_and_fetch():
    async def fn(c):
        payload = {"run_id": "r1", "benchmark_name": "mmlu",
                   "timestamp": "2026-08-17", "data": '{"accuracy": 0.85}',
                   "model_id": "m", "tokenizer_id": "t", "source": "s"}
        r = await c.post("/raw_input", json=payload)
        assert r.status == 200
        pk = (await r.json())["pk"]
        assert pk == "2026-08-17-mmlu-r1"
        # upsert: same pk, new data
        payload["data"] = '{"accuracy": 0.9}'
        await c.post("/raw_input", json=payload)
        r = await c.get(f"/raw_input/{pk}")
        doc = await r.json()
        assert doc["data"] == {"accuracy": 0.9}  # JSON-string auto-parsed
        r = await c.get("/raw_input")
        assert (await r.json())["count"] == 1
        # standardized collection is separate
        r = await c.get("/standardized_output")
        assert (await r.json())["count"] == 0
        # missing required field -> 422
        r = await c.post("/raw_input", json={"run_id": "x"})
        assert r.status == 422
        # 404
        r = await c.get("/raw_input/nope")
        assert r.status == 404
        # health
        r = await c.get("/health")
        assert (await r.json())["status"] == "healthy"
    with_client(ResultsService(), fn)


def test_results_filtering():
    async def fn(c):
        for i, name in enumerate(["a", "a", "b"]):
            await c.post("/standardized_output", json={
                "run_id": f"r{i}", "benchmark_name": name,
                "timestamp": "t", "data": {}})
        r = await c.get("/standardized_output?benchmark_name=a")
        assert (await r.json())["count"] == 2
    with_client(ResultsService(), fn)


# ----------------------------------------------------------------- manager

@pytest.fixture()
def local_repo(tmp_path):
    (tmp_path / "config").mkdir()
    (tmp_path / "job").mkdir()
    (tmp_path / "config" / "eval.json").write_text('{"bench": "mmlu"}')
    (tmp_path / "job" / "job.yaml").write_text("kind: Job")
    (tmp_path / "custom-values-a.yaml").write_text("replicas: 1")
    return tmp_path


def test_manager_sync_and_overlay(local_repo):
    async def fn(c):
        r = await c.post("/projects", json={
            "name": "p1", "repo_url": f"file://{local_repo}",
            "project_type": "benchmark"})
        assert r.status == 201
        pid = (await r.json())["project_id"]

        r = await c.post(f"/projects/{pid}/sync")
        s = await r.json()
        assert s["created"] == 2 and s["deleted"] == 0

        r = await c.get(f"/projects/{pid}/files")
        files = (await r.json())["files"]
        assert {f["file_path"] for f in files} == {"config/eval.json",
                                                   "job/job.yaml"}
        fid = [f for f in files if f["file_path"] == "config/eval.json"
               ][0]["file_id"]

        # modify overlay
        r = await c.put(f"/projects/{pid}/files/{fid}",
                        json={"content": '{"bench": "edited"}'})
        assert r.status == 200
        r = await c.get(f"/projects/{pid}/files/{fid}")
        doc = await r.json()
        assert doc["modified"] and doc["content"] == '{"bench": "edited"}'

        # re-sync preserves file_id and keeps overlay separate
        (local_repo / "config" / "eval.json").write_text('{"bench": "v2"}')
        (local_repo / "job" / "job.yaml").unlink()
        r = await c.post(f"/projects/{pid}/sync")
        s = await r.json()
        assert s["updated"] == 1 and s["deleted"] == 1
        r = await c.get(f"/projects/{pid}/files/{fid}")
        doc = await r.json()
        assert doc["file_id"] == fid
        assert doc["content"] == '{"bench": "edited"}'  # overlay wins

        # reset project clears overlay
        r = await c.post(f"/projects/{pid}/reset")
        assert (await r.json())["reset_count"] == 1
        r = await c.get(f"/projects/{pid}/files/{fid}")
        assert (await r.json())["content"] == '{"bench": "v2"}'
    with_client(ManagerService(), fn)


def test_manager_engine_project(local_repo):
    async def fn(c):
        r = await c.post("/projects", json={
            "name": "e1", "repo_url": f"file://{local_repo}",
            "project_type": "vllm"})  # reference-compatible alias
        pid = (await r.json())["project_id"]
        r = await c.post(f"/projects/{pid}/sync")
        assert (await r.json())["created"] == 1  # custom-values-a.yaml only
        r = await c.get(f"/projects/{pid}/files")
        files = (await r.json())["files"]
        assert files[0]["file_path"] == "custom-values-a.yaml"
        assert files[0]["benchmark_type"] == "engine"
    with_client(ManagerService(), fn)


def test_manager_sync_all_and_errors(local_repo):
    async def fn(c):
        a = await (await c.post("/projects", json={
            "name": "ok", "repo_url": f"file://{local_repo}",
            "project_type": "benchmark"})).json()
        await c.post("/projects", json={
            "name": "bad", "repo_url": "file:///nonexistent-dir",
            "project_type": "benchmark"})
        r = await c.post("/projects/sync-all")
        synced = (await r.json())["synced"]
        assert len(synced) == 2
        oks = [s for s in synced if "error" not in s]
        errs = [s for s in synced if "error" in s]
        assert len(oks) == 1 and len(errs) == 1
        # delete cascades
        r = await c.delete(f"/projects/{a['project_id']}")
        assert r.status == 200
        r = await c.get(f"/projects/{a['project_id']}")
        assert r.status == 404
    with_client(ManagerService(), fn)
