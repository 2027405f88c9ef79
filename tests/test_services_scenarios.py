"""Engine-manager scenario tests — the reference's curl test points as
real tests (reference: benchmark-vllm/configs/test_scenario*.yaml +
README test-point list):

1. reuse: identical config re-deployed -> same engine reused
2. conflict: same name, different config -> cleanup-and-replace
3. TPU resource conflict: over-requesting chips -> rejected
Plus: deployer PTY terminal over WebSocket, config validation endpoint.
"""

import asyncio
import os

import pytest
import yaml
from aiohttp.test_utils import TestClient, TestServer

from vllm_backend_public_tpu.services.common.procman import ProcessManager
from vllm_backend_public_tpu.services.deployer.service import DeployerService
from vllm_backend_public_tpu.services.engine_manager.service import (
    EngineManagerService)

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def load_cfg(name):
    with open(os.path.join(CONFIGS, name)) as f:
        return yaml.safe_load(f)


def test_scenario_reuse_and_conflict(tmp_path):
    os.environ["ENGINE_READY_TIMEOUT"] = "120"
    os.environ["ENGINE_RETRY_DELAY"] = "0.5"

    async def main():
        em = EngineManagerService(autostart_scheduler=False,
                                  procman=ProcessManager(
                                      log_dir=str(tmp_path),
                                      total_tpu_chips=8))
        async with TestClient(TestServer(em.build_app())) as c:
            cfg1 = load_cfg("test_scenario1_reuse.yaml")
            r = await c.post("/deploy", json={"engine_config": cfg1})
            assert r.status == 200
            d1 = await r.json()
            assert d1["status"] == "deploying"
            # wait ready
            ok = await em.engines.wait_ready(d1["name"])
            assert ok

            # scenario 1: identical config -> reuse
            r = await c.post("/deploy", json={"engine_config": cfg1})
            d2 = await r.json()
            assert d2["status"] == "reused"
            assert d2["endpoint"] == d1["endpoint"]

            # scenario 2: same served name, different config -> replace
            cfg2 = load_cfg("test_scenario2_conflict.yaml")
            r = await c.post("/deploy", json={"engine_config": cfg2})
            d3 = await r.json()
            assert d3["name"] == d1["name"]  # deterministic release name
            assert d3["status"] == "deploying"
            assert d3["endpoint"] != d1["endpoint"]
            assert await em.engines.wait_ready(d3["name"])
            # only one engine process exists
            engines = [p for p in em.procman.list() if p.kind == "engine"]
            assert len([p for p in engines if p.status == "running"]) == 1

            # scenario 3: TPU chip conflict -> rejected with clear error
            cfg3 = load_cfg("test_scenario3_tpu_conflict.yaml")
            r = await c.post("/deploy", json={"engine_config": cfg3})
            assert r.status == 400
            assert "TPU resource conflict" in (await r.json())["detail"]

            # config validation endpoint
            r = await c.post("/configs/validate", json={
                "engine_config": {"model": "x", "block_size": 16}})
            assert (await r.json())["valid"] is True
            r = await c.post("/configs/validate", json={
                "engine_config": {"dtype": "float99"}})
            body = await r.json()
            # normalization succeeds (dtype checked at engine start);
            # endpoint must respond deterministically either way
            assert "valid" in body

            # configs listing includes the scenario files
            r = await c.get("/configs")
            names = (await r.json())["configs"]
            assert "test_scenario1_reuse.yaml" in names

            # teardown
            r = await c.delete(f"/deployments/{d1['name']}")
            assert r.status == 200

    run(main())


def test_deployer_terminal_websocket(tmp_path):
    async def main():
        dep = DeployerService(procman=ProcessManager(log_dir=str(tmp_path)))
        async with TestClient(TestServer(dep.build_app())) as c:
            r = await c.post("/terminal/create", json={})
            assert r.status == 200
            sid = (await r.json())["session_id"]

            ws = await c.ws_connect(f"/terminal/{sid}")
            await ws.send_str("echo tpu_$((40+2))\n")
            seen = ""
            for _ in range(50):
                try:
                    msg = await ws.receive(timeout=0.5)
                except asyncio.TimeoutError:
                    continue
                if msg.type.name == "TEXT":
                    seen += msg.data
                if "tpu_42" in seen:
                    break
            assert "tpu_42" in seen, seen[-500:]
            await ws.close()

            r = await c.get("/terminal/sessions")
            assert len((await r.json())["sessions"]) == 1
            r = await c.delete(f"/terminal/{sid}")
            assert r.status == 200
            r = await c.delete(f"/terminal/{sid}")
            assert r.status == 404

    run(main())


def test_deployer_terminal_job_endpoints(tmp_path):
    """Reference-parity endpoints: POST /jobs/{n}/terminal, plain GET
    /terminal/{sid} info, DELETE /terminal/job/{n}, POST /jobs/logs
    (reference benchmark-deployer/main.py:160-265)."""
    async def main():
        dep = DeployerService(procman=ProcessManager(log_dir=str(tmp_path)))
        async with TestClient(TestServer(dep.build_app())) as c:
            job_yaml = yaml.safe_dump({
                "kind": "Job", "metadata": {"name": "sleepy"},
                "spec": {"template": {"spec": {"containers": [{
                    "command": ["/bin/sh", "-c",
                                "echo hello_log; sleep 30"]}]}}}})
            r = await c.post("/deploy", json={"yaml_content": job_yaml})
            assert r.status == 200

            r = await c.post("/jobs/sleepy/terminal")
            assert r.status == 200
            sid = (await r.json())["session_id"]

            # plain GET (no WS upgrade) returns session info
            r = await c.get(f"/terminal/{sid}")
            assert r.status == 200
            info = await r.json()
            assert info["job_name"] == "sleepy" and info["active"]

            # bulk logs with unknown job mixed in
            await asyncio.sleep(0.3)
            r = await c.post("/jobs/logs",
                             json={"job_names": ["sleepy", "ghost"]})
            logs = (await r.json())["logs"]
            assert "hello_log" in (logs["sleepy"] or "")
            assert logs["ghost"] is None

            # close all sessions of the job
            r = await c.delete("/terminal/job/sleepy")
            assert sid in (await r.json())["closed"]
            r = await c.get("/terminal/sessions")
            assert (await r.json())["sessions"] == []

            r = await c.delete("/jobs/sleepy")
            assert r.status == 200

    run(main())


def test_deployer_vllm_queue_aliases(tmp_path):
    """/vllm/queue/* reference paths proxy to the engine-manager
    (reference benchmark-deployer/main.py:296-399)."""
    async def main():
        em = EngineManagerService(autostart_scheduler=False,
                                  procman=ProcessManager(
                                      log_dir=str(tmp_path),
                                      total_tpu_chips=8))
        em_server = TestServer(em.build_app())
        async with TestClient(em_server) as emc:
            dep = DeployerService(
                procman=ProcessManager(log_dir=str(tmp_path)),
                engine_manager_url=str(em_server.make_url("")).rstrip("/"))
            async with TestClient(TestServer(dep.build_app())) as c:
                r = await c.post("/vllm/queue/deployment", json={
                    "engine_config": {"demo": True, "model": "demo"},
                    "benchmark_configs": [], "priority": "low"})
                assert r.status in (200, 201)
                qid = (await r.json())["queue_id"]

                r = await c.get("/vllm/queue/list")
                assert r.status == 200
                assert any(q["queue_id"] == qid
                           for q in (await r.json())["queue"])

                r = await c.get(f"/vllm/queue/{qid}")
                assert (await r.json())["priority"] == "low"

                r = await c.post(f"/vllm/queue/{qid}/priority",
                                 json={"priority": "urgent"})
                assert r.status == 200
                r = await c.get(f"/vllm/queue/{qid}")
                assert (await r.json())["priority"] == "urgent"

                r = await c.get("/vllm/queue/scheduler/status")
                assert r.status == 200

                r = await c.post(f"/vllm/queue/{qid}/cancel")
                assert r.status == 200
                r = await c.get(f"/vllm/queue/{qid}")
                assert (await r.json())["status"] == "cancelled"

                r = await c.delete(f"/vllm/queue/{qid}")
                assert r.status == 200

    run(main())


def test_deployer_secret_kind(tmp_path):
    """Secret docs deploy like ConfigMaps but base64-decode `data`, pass
    `stringData` through, and write files mode 0600 (reference kind
    dispatch: benchmark-deployer/kubernetes_client.py:106-226)."""
    import asyncio
    import base64
    import os
    import stat

    from aiohttp.test_utils import TestClient, TestServer

    from vllm_backend_public_tpu.services.common.procman import ProcessManager
    from vllm_backend_public_tpu.services.deployer.service import (
        DeployerService)

    secret_yaml = """\
apiVersion: v1
kind: Secret
metadata:
  name: shared-secrets
data:
  MONGO_URL: {b64}
stringData:
  GITHUB_TOKEN: plain-token
""".format(b64=base64.b64encode(b"mongodb://mongo-primary:27017").decode())

    async def go():
        dep = DeployerService(
            procman=ProcessManager(log_dir=str(tmp_path)))
        async with TestClient(TestServer(dep.build_app())) as c:
            r = await c.post("/deploy", json={"yaml_content": secret_yaml})
            assert r.status == 200
            out = (await r.json())["deployed"][0]
            assert out["kind"] == "Secret" and out["status"] == "created"
            import pathlib
            root = pathlib.Path(dep.configmap_root) / "shared-secrets"
            mongo = root / "MONGO_URL"
            assert mongo.read_text() == "mongodb://mongo-primary:27017"
            assert (root / "GITHUB_TOKEN").read_text() == "plain-token"
            mode = stat.S_IMODE(os.stat(mongo).st_mode)
            assert mode == 0o600, oct(mode)
            r = await c.get("/deployments")
            names = [d["name"] for d in (await r.json())["deployments"]]
            assert "shared-secrets" in names
            # delete by yaml
            r = await c.post("/delete", json={"yaml_content": secret_yaml})
            assert "shared-secrets" in (await r.json())["deleted"]

    asyncio.new_event_loop().run_until_complete(go())
