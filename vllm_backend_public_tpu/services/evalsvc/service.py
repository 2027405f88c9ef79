"""Eval service — evaluation trigger (port 8004).

Reimplements the reference's benchmark-eval (reference:
benchmark-eval/main.py): POST /evaluate schedules a background task that
polls the engine's /v1/models until it answers 200 (up to
EVALUATION_TRIES x EVALUATION_DELAY_SECONDS — reference config.py:33-34,
main.py:102-110), loads the evaluate-job template (from the manager
service or a local file), substitutes {model_name} /
{inference_engine_url} / {model_name_lower} (main.py:55-58), validates the
YAML, and POSTs it to the deployer /deploy (main.py:60-82).
"""

from __future__ import annotations

import asyncio
import os
import time
import uuid
from typing import Optional

import aiohttp
import yaml
from aiohttp import web

from ..common.app import ServiceApp, error_response, json_response, make_cli
from ..common.store import connect_store

DEFAULT_TEMPLATE = """\
apiVersion: batch/v1
kind: Job
metadata:
  name: eval-{model_name_lower}
spec:
  template:
    spec:
      containers:
      - name: eval
        command: ["python", "-m", "vllm_backend_public_tpu.benchmarks.runner"]
        env:
        - name: ENGINE_ENDPOINT
          value: "{inference_engine_url}"
        - name: MODEL_NAME
          value: "{model_name}"
"""


class EvalService(ServiceApp):
    name = "eval"

    def __init__(self, store=None, snapshot_path: Optional[str] = None,
                 deployer_url: str = "", manager_url: str = "",
                 tries: Optional[int] = None,
                 delay: Optional[float] = None):
        super().__init__(store or connect_store(
            db_name="result_db", snapshot_path=snapshot_path))
        self.deployer_url = deployer_url or os.environ.get(
            "DEPLOYER_URL", "http://127.0.0.1:8002")
        self.manager_url = manager_url or os.environ.get(
            "MANAGER_URL", "http://127.0.0.1:8001")
        self.tries = tries or int(os.environ.get("EVALUATION_TRIES", "60"))
        self.delay = (delay if delay is not None
                      else float(os.environ.get("EVALUATION_DELAY_SECONDS",
                                                "60")))
        self.template_path = os.environ.get("EVALUATE_TEMPLATE_PATH", "")

    def routes(self):
        return [
            web.post("/evaluate", self.evaluate),
            web.get("/evaluations", self.list_evaluations),
            web.get("/evaluations/{eid}", self.get_evaluation),
        ]

    async def evaluate(self, request: web.Request) -> web.Response:
        body = await request.json()
        model_name = body["model_name"]
        engine_url = body["inference_engine_url"]
        if not engine_url.startswith(("http://", "https://")):
            raise ValueError("inference_engine_url must be http(s)")
        eid = uuid.uuid4().hex[:12]
        await self.store["evaluations"].insert_one({
            "eval_id": eid, "model_name": model_name,
            "engine_url": engine_url, "status": "waiting_engine",
            "created_at": time.time()})
        self.spawn(self._execute(eid, model_name, engine_url))
        return json_response({"eval_id": eid, "status": "scheduled"},
                             status=202)

    async def _execute(self, eid: str, model_name: str, engine_url: str):
        evals = self.store["evaluations"]
        try:
            ok = await self._wait_models(engine_url)
            if not ok:
                await evals.update_one({"eval_id": eid}, {"$set": {
                    "status": "failed",
                    "error": "engine never served /v1/models"}})
                return
            template = await self._load_template()
            rendered = template.format(
                model_name=model_name,
                model_name_lower=model_name.lower().replace("/", "-")
                .replace("_", "-"),
                inference_engine_url=engine_url)
            yaml.safe_load(rendered)  # validate
            async with aiohttp.ClientSession() as session:
                async with session.post(f"{self.deployer_url}/deploy",
                                        json={"yaml_content": rendered}) as r:
                    data = await r.json()
                    if r.status != 200:
                        raise RuntimeError(f"deployer: {data}")
            await evals.update_one({"eval_id": eid}, {"$set": {
                "status": "deployed", "deployed": data,
                "finished_at": time.time()}})
        except Exception as e:
            await evals.update_one({"eval_id": eid}, {"$set": {
                "status": "failed", "error": str(e)}})

    async def _wait_models(self, engine_url: str) -> bool:
        async with aiohttp.ClientSession() as session:
            for _ in range(self.tries):
                try:
                    async with session.get(
                            f"{engine_url}/v1/models",
                            timeout=aiohttp.ClientTimeout(total=5)) as r:
                        if r.status == 200:
                            return True
                except Exception:
                    pass
                await asyncio.sleep(self.delay)
        return False

    async def _load_template(self) -> str:
        if self.template_path and os.path.exists(self.template_path):
            with open(self.template_path) as f:
                return f.read()
        return DEFAULT_TEMPLATE

    async def list_evaluations(self, request):
        docs = await self.store["evaluations"].find(
            {}, sort=[("created_at", -1)])
        for d in docs:
            d.pop("_id", None)
        return json_response({"evaluations": docs})

    async def get_evaluation(self, request):
        d = await self.store["evaluations"].find_one(
            {"eval_id": request.match_info["eid"]})
        if d is None:
            return error_response(404, "evaluation not found")
        d.pop("_id", None)
        return json_response(d)


main = make_cli(EvalService, default_port=8004)

if __name__ == "__main__":
    main()
