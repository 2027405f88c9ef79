"""Full control-plane loop integration test.

queue a deployment (engine-manager) -> engine process deployed + readiness
polled -> benchmark job launched through the deployer -> job drives the
engine's /v1/completions -> metrics pushed to the results service.

This is the reference's primary end-to-end path (SURVEY.md §3.1) running
entirely in-repo: real HTTP between services (aiohttp TestServer binds
real sockets), a real engine subprocess (--demo, CPU), a real benchmark
job subprocess.
"""

import asyncio
import json
import os

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vllm_backend_public_tpu.services.results.service import ResultsService
from vllm_backend_public_tpu.services.deployer.service import DeployerService
from vllm_backend_public_tpu.services.engine_manager.service import (
    EngineManagerService)

JOB_YAML = """\
apiVersion: batch/v1
kind: Job
metadata:
  name: bench-job-1
spec:
  template:
    spec:
      containers:
      - name: bench
        command: ["python", "-m", "vllm_backend_public_tpu.benchmarks.runner"]
        env:
        - name: ENGINE_ENDPOINT
          value: "ENGINE_ENDPOINT"
        - name: EVAL_CONFIG_PATH
          value: "{cfg_path}"
        - name: RESULTS_URL
          value: "{results_url}"
        - name: RUN_ID
          value: "itest-run"
        - name: JAX_PLATFORMS
          value: "cpu"
"""


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    os.environ["QUEUE_POLL_INTERVAL"] = "0.3"
    os.environ["ENGINE_READY_TIMEOUT"] = "120"
    os.environ["ENGINE_RETRY_DELAY"] = "0.5"
    os.environ["JOB_POLL_INTERVAL"] = "0.5"

    cfg_path = tmp_path / "eval_config.json"
    cfg_path.write_text(json.dumps({
        "benchmark_name": "itest", "num_requests": 3, "concurrency": 2,
        "prompt_len": 8, "max_tokens": 4, "ready_tries": 60}))

    async def main():
        results = ResultsService()
        results_server = TestServer(results.build_app())
        await results_server.start_server()
        results_url = f"http://127.0.0.1:{results_server.port}"

        deployer = DeployerService(results_url=results_url)
        deployer_server = TestServer(deployer.build_app())
        await deployer_server.start_server()
        deployer_url = f"http://127.0.0.1:{deployer_server.port}"

        em = EngineManagerService(deployer_url=deployer_url,
                                  autostart_scheduler=True)
        em_server = TestServer(em.build_app())
        await em_server.start_server()

        async with TestClient(em_server) as emc, \
                TestClient(results_server) as rc:
            job_yaml = JOB_YAML.format(cfg_path=cfg_path,
                                       results_url=results_url)
            r = await emc.post("/queue/deployment", json={
                "engine_config": {"demo": True, "max_num_seqs": 2,
                                  "served_model_name": "itest-model"},
                "benchmark_jobs": [{"yaml_content": job_yaml}],
                "priority": "high"})
            assert r.status == 201
            qid = (await r.json())["queue_id"]

            # wait for completion
            status = None
            for _ in range(240):
                r = await emc.get(f"/queue/deployment/{qid}")
                doc = await r.json()
                status = doc["status"]
                if status in ("completed", "failed", "cancelled"):
                    break
                await asyncio.sleep(1)
            assert status == "completed", doc

            # queue bookkeeping recorded the steps
            assert "engine_deployed" in doc["completed_steps"]
            assert "engine_ready" in doc["completed_steps"]
            assert any(s.endswith("_done") for s in doc["completed_steps"])

            # results arrived
            r = await rc.get("/raw_input?run_id=itest-run")
            raw = await r.json()
            assert raw["count"] == 1
            data = raw["results"][0]["data"]
            assert data["output_tokens"] > 0 and data["failed"] == 0
            r = await rc.get("/standardized_output?run_id=itest-run")
            assert (await r.json())["count"] == 1

            # second request with the SAME config: engine must be reused
            r = await emc.post("/queue/deployment", json={
                "engine_config": {"demo": True, "max_num_seqs": 2,
                                  "served_model_name": "itest-model"},
                "benchmark_jobs": [], "priority": "urgent"})
            qid2 = (await r.json())["queue_id"]
            for _ in range(60):
                doc2 = await (await emc.get(
                    f"/queue/deployment/{qid2}")).json()
                if doc2["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.5)
            assert doc2["status"] == "completed"

            # exactly one engine process exists
            dbg = await (await emc.get("/debug/processes")).json()
            engines = [p for p in dbg["processes"] if p["kind"] == "engine"]
            assert len(engines) == 1

            # teardown
            r = await emc.get("/deployments")
            for d in (await r.json())["deployments"]:
                await emc.delete(f"/deployments/{d['name']}")

        await em_server.close()
        await deployer_server.close()
        await results_server.close()

    asyncio.new_event_loop().run_until_complete(main())
