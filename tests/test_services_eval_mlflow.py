"""Eval-trigger and MLflow-watcher service tests."""

import asyncio
import json

import yaml
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from vllm_backend_public_tpu.services.evalsvc.service import EvalService
from vllm_backend_public_tpu.services.mlflowsvc.service import (
    LocalDirSink, LocalFileRegistry, MLflowWatcher)
from vllm_backend_public_tpu.services.mlflowsvc.processors import (
    PROCESSORS, get_processor)


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_eval_triggers_deployer():
    """Engine answers /v1/models -> eval renders template -> deployer
    receives the rendered Job YAML."""

    async def main():
        deploys = []

        # fake engine serving /v1/models
        engine_app = web.Application()
        engine_app.router.add_get(
            "/v1/models", lambda r: web.json_response({"data": []}))
        engine_server = TestServer(engine_app)
        await engine_server.start_server()
        engine_url = f"http://127.0.0.1:{engine_server.port}"

        # fake deployer capturing /deploy
        dep_app = web.Application()

        async def capture(request):
            deploys.append(await request.json())
            return web.json_response({"deployed": [{"name": "eval-job"}]})

        dep_app.router.add_post("/deploy", capture)
        dep_server = TestServer(dep_app)
        await dep_server.start_server()

        svc = EvalService(deployer_url=f"http://127.0.0.1:{dep_server.port}",
                          tries=10, delay=0.1)
        async with TestClient(TestServer(svc.build_app())) as c:
            r = await c.post("/evaluate", json={
                "model_name": "My/Model_1",
                "inference_engine_url": engine_url})
            assert r.status == 202
            eid = (await r.json())["eval_id"]
            for _ in range(100):
                doc = await (await c.get(f"/evaluations/{eid}")).json()
                if doc["status"] in ("deployed", "failed"):
                    break
                await asyncio.sleep(0.1)
            assert doc["status"] == "deployed", doc

            # bad URL scheme rejected (reference models.py:20-26)
            r = await c.post("/evaluate", json={
                "model_name": "m", "inference_engine_url": "ftp://x"})
            assert r.status == 400

        assert len(deploys) == 1
        rendered = yaml.safe_load(deploys[0]["yaml_content"])
        assert rendered["metadata"]["name"] == "eval-my-model-1"
        env = {e["name"]: e["value"] for e in
               rendered["spec"]["template"]["spec"]["containers"][0]["env"]}
        assert env["ENGINE_ENDPOINT"] == engine_url
        assert env["MODEL_NAME"] == "My/Model_1"

        await engine_server.close()
        await dep_server.close()

    run(main())


def test_processors_seam():
    event = {"model_name": "Meta/Llama-3-8B", "model_id": "runs:/abc/model",
             "version": "3", "run_id": "r", "experiment_id": "e"}
    assert set(PROCESSORS) == {"vllm", "tensorrt-llm", "tpu"}
    v = get_processor("vllm").process({}, event)
    assert v["vllm"]["vllm"]["model"] == "/data/local_models/Meta/Llama-3-8B"
    assert v["vllm"]["fullnameOverride"] == "vllm-meta-llama-3-8b"
    assert v["global"]["modelid"] == "runs:/abc/model"
    t = get_processor("tpu").process({}, event)
    assert t["engine"]["kind"] == "EngineDeployment"
    assert t["engine"]["served_model_name"] == "Meta/Llama-3-8B"
    trt = get_processor("tensorrt-llm").process({}, event)
    assert trt["tensorrt-llm"]["model"]["path"].endswith("Llama-3-8B")
    try:
        get_processor("nope")
        assert False
    except ValueError:
        pass


def test_mlflow_watcher_dedupe(tmp_path):
    registry_path = tmp_path / "registry.json"
    registry_path.write_text(json.dumps([
        {"model_name": "acme/m1", "version": "1", "model_id": "id-1"}]))
    sink_dir = tmp_path / "repo"

    async def main():
        svc = MLflowWatcher(
            registry=LocalFileRegistry(str(registry_path)),
            sink=LocalDirSink(str(sink_dir)),
            engines=["tpu", "vllm"], autostart=False)
        async with TestClient(TestServer(svc.build_app())) as c:
            r = await (await c.post("/poll")).json()
            assert r["processed"] == ["acme/m1"]
            # both engine YAMLs rendered
            tpu_doc = yaml.safe_load(
                (sink_dir / "models/tpu/acme-m1.yaml").read_text())
            assert tpu_doc["global"]["modelid"] == "id-1"
            assert (sink_dir / "models/vllm/acme-m1.yaml").exists()

            # second poll: same modelid -> dedupe, nothing processed
            r = await (await c.post("/poll")).json()
            assert r["processed"] == [] and r["skipped"] == ["acme/m1"]

            # version bump -> processed again
            registry_path.write_text(json.dumps([
                {"model_name": "acme/m1", "version": "2",
                 "model_id": "id-2"}]))
            r = await (await c.post("/poll")).json()
            assert r["processed"] == ["acme/m1"]

            ev = await (await c.get("/events")).json()
            assert len(ev["events"]) == 4  # 2 engines x 2 releases
            conn = await (await c.get("/connections")).json()
            assert "tpu" in conn["known_processors"]

    run(main())


def test_argocd_project_and_application_generation(tmp_path):
    """Model release generates an ArgoCD AppProject (once) and a
    per-(model, engine) Application with idempotent same-content skip —
    the reference's three-repo release flow
    (benchmark-mlflow/github_client.py:266-414)."""
    import asyncio
    import json

    import yaml

    from vllm_backend_public_tpu.services.mlflowsvc.service import (
        ArgoCDGenerator, LocalDirSink, LocalFileRegistry, MLflowWatcher)

    registry_path = tmp_path / "registry.json"
    registry_path.write_text(json.dumps([
        {"model_name": "llama-demo", "version": "3", "model_id": "m-3",
         "run_id": "r", "experiment_id": "e"}]))
    models_dir = tmp_path / "models-repo"
    argo_dir = tmp_path / "argo-repo"
    argo_sink = LocalDirSink(str(argo_dir))
    svc = MLflowWatcher(
        registry=LocalFileRegistry(str(registry_path)),
        sink=LocalDirSink(str(models_dir)),
        engines=["tpu"], autostart=False,
        argo=ArgoCDGenerator(argo_sink, project_name="model-serving",
                             repo_url="https://git.local/models.git",
                             namespace="serving"))

    async def go():
        res = await svc.poll_once()
        assert res["processed"] == ["llama-demo"]
        proj = yaml.safe_load(
            (argo_dir / "projects" / "model-serving.yaml").read_text())
        assert proj["kind"] == "AppProject"
        assert proj["apiVersion"] == "argoproj.io/v1alpha1"
        assert "https://git.local/models.git" in proj["spec"]["sourceRepos"]
        app = yaml.safe_load(
            (argo_dir / "applications" / "tpu-llama-demo.yaml").read_text())
        assert app["kind"] == "Application"
        assert app["spec"]["project"] == "model-serving"
        assert app["spec"]["source"]["helm"]["valueFiles"] == [
            "models/tpu/llama-demo.yaml"]
        assert app["spec"]["destination"]["namespace"] == "serving"
        # second poll: dedupe on modelid, argo files unchanged (no error)
        mtime = (argo_dir / "applications" / "tpu-llama-demo.yaml").stat()
        res2 = await svc.poll_once()
        assert res2["skipped"] == ["llama-demo"]

    asyncio.new_event_loop().run_until_complete(go())
