"""Engine-manager service — engine lifecycle + deployment queue (port 8005).

Reimplements the reference's benchmark-vllm service (reference:
benchmark-vllm/main.py 30 endpoints, vllm_manager.py, queue_manager.py),
retargeted from Helm-managed vLLM pods to TPU-slice engine processes:

- EngineManager: deterministic naming, config-hash comparison for
  reuse-or-replace (vllm_manager.py:137-194, _can_reuse_existing_deployment
  :1102-1158), TPU chip conflict detection (the GPU/MIG-conflict analog,
  models.py:57-72), readiness polling with a failure budget
  (wait_for_helm_deployment_ready :888-983; budgets from config.py:12-22),
  cleanup of failed deployments (:1049-1100), store persistence + rehydrate
  on restart (:61-76).
- QueueManager: priority FIFO (urgent>high>medium>low, queue_manager.py
  :579-580), single async scheduler loop processing one request at a time
  (:523-790): deploy engine -> wait ready -> run benchmark jobs
  sequentially through the deployer (:888-1018) -> completed/failed;
  cancellation with resource cleanup (:176-367); skip_engine_creation
  reuse path; scheduler start/stop/pause/resume/config/status endpoints
  (main.py:369-439).
"""

from __future__ import annotations

import asyncio
import hashlib
import json
import logging
import os
import time
import uuid
from typing import Dict, List, Optional

import aiohttp
from aiohttp import web

from ..common.app import ServiceApp, error_response, json_response
from ..common.procman import ProcessManager
from ..common.store import connect_store
from ..deployer.service import REPO_ROOT, engine_command, free_port

logger = logging.getLogger(__name__)

PRIORITIES = ("urgent", "high", "medium", "low")


def config_hash(config: dict) -> str:
    return hashlib.md5(
        json.dumps(config, sort_keys=True, default=str).encode()).hexdigest()


class EngineManager:
    """Engine process lifecycle with reuse-by-config-hash."""

    def __init__(self, store, procman: ProcessManager):
        self.store = store
        self.procman = procman
        self.ready_timeout = float(os.environ.get("ENGINE_READY_TIMEOUT",
                                                  "600"))
        self.max_failures = int(os.environ.get("ENGINE_MAX_FAILURES", "3"))
        self.retry_delay = float(os.environ.get("ENGINE_RETRY_DELAY", "2"))

    @staticmethod
    def release_name(config: dict) -> str:
        base = (config.get("served_model_name") or config.get("model")
                or "engine")
        safe = "".join(c if c.isalnum() or c == "-" else "-"
                       for c in str(base).lower()).strip("-")[:40]
        return f"engine-{safe or 'default'}"

    async def deploy(self, config: dict,
                     name: Optional[str] = None) -> dict:
        name = name or self.release_name(config)
        new_hash = config_hash(config)
        existing = await self.store["engine_deployments"].find_one(
            {"name": name})
        mp = self.procman.get(name)

        if (existing and mp is not None and mp.status == "running"
                and existing.get("config_hash") == new_hash):
            return {"name": name, "status": "reused",
                    "endpoint": existing["endpoint"]}

        if mp is not None:
            # conflicting config or dead process: cleanup-and-replace
            # (reference _check_and_cleanup_conflicting_helm_release)
            await self.procman.stop(name)
            self.procman.remove(name)

        chips = (int(config.get("tensor_parallel_size", 1))
                 * int(config.get("data_parallel_size", 1)))
        if self.procman.tpu_conflict(chips):
            raise ValueError(
                f"TPU resource conflict: need {chips} chips, "
                f"{self.procman.total_tpu_chips - self.procman.tpu_chips_in_use()} free")

        port = int(config.get("port") or free_port())
        cmd = engine_command(config, port)
        await self.procman.spawn(name, "engine", cmd, cwd=REPO_ROOT,
                                 tpu_chips=chips)
        endpoint = f"http://127.0.0.1:{port}"
        await self.store["engine_deployments"].update_one(
            {"name": name},
            {"$set": {"name": name, "endpoint": endpoint,
                      "config": config, "config_hash": new_hash,
                      "created_at": time.time(), "status": "deploying"}},
            upsert=True)
        await self.store["engine_last_custom_values"].update_one(
            {"name": name}, {"$set": {"hash": new_hash,
                                      "config": config}}, upsert=True)
        return {"name": name, "status": "deploying", "endpoint": endpoint}

    async def wait_ready(self, name: str) -> bool:
        doc = await self.store["engine_deployments"].find_one({"name": name})
        if doc is None:
            return False
        endpoint = doc["endpoint"]
        deadline = time.monotonic() + self.ready_timeout
        failures = 0
        async with aiohttp.ClientSession() as session:
            while time.monotonic() < deadline:
                mp = self.procman.get(name)
                if mp is not None and mp.status == "failed":
                    failures += 1
                    if failures >= self.max_failures:
                        break
                try:
                    async with session.get(
                            f"{endpoint}/health",
                            timeout=aiohttp.ClientTimeout(total=3)) as r:
                        if r.status == 200:
                            await self.store["engine_deployments"].update_one(
                                {"name": name},
                                {"$set": {"status": "running"}})
                            return True
                except Exception:
                    pass
                await asyncio.sleep(self.retry_delay)
        await self.cleanup_failed(name)
        return False

    async def cleanup_failed(self, name: str) -> None:
        await self.procman.stop(name)
        self.procman.remove(name)
        await self.store["engine_deployments"].update_one(
            {"name": name}, {"$set": {"status": "failed"}})

    async def delete(self, name: str) -> bool:
        stopped = await self.procman.stop(name)
        self.procman.remove(name)
        doc = await self.store["engine_deployments"].find_one({"name": name})
        await self.store["engine_deployments"].delete_many({"name": name})
        return stopped or doc is not None

    async def list(self) -> List[dict]:
        docs = await self.store["engine_deployments"].find({})
        for d in docs:
            d.pop("_id", None)
            mp = self.procman.get(d["name"])
            if mp is not None:
                d["process_status"] = mp.status
        return docs


class QueueManager:
    """Macro-scale deployment queue (the reference's queue_manager.py)."""

    def __init__(self, store, engines: EngineManager, deployer_url: str):
        self.store = store
        self.engines = engines
        self.deployer_url = deployer_url
        self.poll_interval = float(os.environ.get("QUEUE_POLL_INTERVAL",
                                                  "30"))
        self.job_timeout = float(os.environ.get("JOB_TIMEOUT", "3600"))
        self.job_poll = float(os.environ.get("JOB_POLL_INTERVAL", "2"))
        self.job_max_failures = int(os.environ.get("JOB_MAX_FAILURES", "3"))
        self.running = False
        self.paused = False
        self._task: Optional[asyncio.Task] = None
        self._processing: Optional[str] = None
        self._consecutive_errors = 0

    # ------------------------------------------------------------ control

    def start(self):
        if self._task is None or self._task.done():
            self.running = True
            self.paused = False
            self._task = asyncio.get_running_loop().create_task(self._loop())

    async def stop(self):
        self.running = False
        if self._task is not None:
            self._task.cancel()
            self._task = None

    def status(self) -> dict:
        return {"running": self.running, "paused": self.paused,
                "poll_interval": self.poll_interval,
                "processing": self._processing,
                "consecutive_errors": self._consecutive_errors}

    # -------------------------------------------------------------- queue

    async def add(self, body: dict) -> dict:
        priority = body.get("priority", "medium")
        if priority not in PRIORITIES:
            raise ValueError(f"priority must be one of {PRIORITIES}")
        qid = uuid.uuid4().hex[:12]
        item = {
            "queue_id": qid,
            "priority": priority,
            "status": "queued",
            "engine_config": body.get("engine_config")
                or body.get("vllm_config") or {},
            "benchmark_jobs": body.get("benchmark_jobs", []),
            "skip_engine_creation": bool(body.get("skip_engine_creation")
                                         or body.get("skip_vllm_creation")),
            "engine_name": body.get("engine_name"),
            "scheduling": body.get("scheduling", {"mode": "immediate"}),
            "created_at": time.time(),
            "current_step": 0, "total_steps": 0, "completed_steps": [],
            "error": None,
        }
        await self.store["engine_deployment_queue"].insert_one(item)
        item.pop("_id", None)
        return item

    async def list(self, status: Optional[str] = None) -> List[dict]:
        flt = {"status": status} if status else {}
        docs = await self.store["engine_deployment_queue"].find(
            flt, sort=[("created_at", 1)])
        for d in docs:
            d.pop("_id", None)
        return docs

    async def get(self, qid: str) -> Optional[dict]:
        d = await self.store["engine_deployment_queue"].find_one(
            {"queue_id": qid})
        if d:
            d.pop("_id", None)
        return d

    async def set_priority(self, qid: str, priority: str) -> bool:
        if priority not in PRIORITIES:
            raise ValueError(f"priority must be one of {PRIORITIES}")
        r = await self.store["engine_deployment_queue"].update_one(
            {"queue_id": qid, "status": "queued"},
            {"$set": {"priority": priority}})
        return r.matched_count > 0

    async def patch_status(self, qid: str, status: str) -> bool:
        r = await self.store["engine_deployment_queue"].update_one(
            {"queue_id": qid}, {"$set": {"status": status}})
        return r.matched_count > 0

    async def delete(self, qid: str, force: bool = False) -> bool:
        item = await self.get(qid)
        if item is None:
            return False
        if item["status"] == "processing" and not force:
            raise ValueError("item is processing; use force-delete or cancel")
        if item["status"] == "processing":
            await self.cancel(qid)
        await self.store["engine_deployment_queue"].delete_many(
            {"queue_id": qid})
        return True

    async def cancel(self, qid: str) -> bool:
        """Cancel with comprehensive resource cleanup
        (reference queue_manager.py:176-367)."""
        item = await self.get(qid)
        if item is None:
            return False
        # stop any jobs this request started
        for job_name in item.get("started_jobs", []):
            try:
                async with aiohttp.ClientSession() as s:
                    await s.delete(f"{self.deployer_url}/jobs/{job_name}")
            except Exception:
                pass
        # tear down the engine it deployed (unless reused)
        if item.get("deployed_engine") and not item.get(
                "skip_engine_creation"):
            await self.engines.delete(item["deployed_engine"])
        await self.store["engine_deployment_queue"].update_one(
            {"queue_id": qid}, {"$set": {"status": "cancelled"}})
        if self._processing == qid:
            self._processing = None
        return True

    # ---------------------------------------------------------- scheduler

    async def _loop(self):
        while self.running:
            try:
                if not self.paused:
                    await self._process_next()
                self._consecutive_errors = 0
            except asyncio.CancelledError:
                return
            except Exception:
                logger.exception("queue scheduler error")
                self._consecutive_errors += 1
                # error backoff (reference queue_manager.py:526-548)
                await asyncio.sleep(
                    min(self.poll_interval * self._consecutive_errors, 300))
            await asyncio.sleep(self.poll_interval)

    async def _pick_next(self) -> Optional[dict]:
        docs = await self.list(status="queued")
        now = time.time()
        eligible = []
        for d in docs:
            sched = d.get("scheduling") or {}
            if sched.get("mode") == "scheduled_time":
                if sched.get("start_time", 0) > now:
                    continue
            eligible.append(d)
        if not eligible:
            return None
        eligible.sort(key=lambda d: (PRIORITIES.index(d["priority"]),
                                     d["created_at"]))
        return eligible[0]

    async def _process_next(self):
        if self._processing is not None:
            return  # one at a time (reference deployer_manager.py:870-873)
        item = await self._pick_next()
        if item is None:
            return
        qid = item["queue_id"]
        self._processing = qid
        q = self.store["engine_deployment_queue"]
        total_steps = (0 if item["skip_engine_creation"] else 2) \
            + len(item["benchmark_jobs"])
        await q.update_one({"queue_id": qid},
                           {"$set": {"status": "processing",
                                     "started_at": time.time(),
                                     "total_steps": total_steps}})
        try:
            if item["skip_engine_creation"]:
                name = item.get("engine_name")
                doc = await self.store["engine_deployments"].find_one(
                    {"name": name}) if name else None
                if doc is None:
                    # fall back to any running engine
                    running = [d for d in await self.engines.list()
                               if d.get("process_status") == "running"]
                    if not running:
                        raise RuntimeError(
                            "skip_engine_creation set but no engine running")
                    doc = running[0]
                endpoint = doc["endpoint"]
                name = doc["name"]
            else:
                res = await self.engines.deploy(item["engine_config"])
                name, endpoint = res["name"], res["endpoint"]
                await q.update_one(
                    {"queue_id": qid},
                    {"$set": {"deployed_engine": name, "current_step": 1},
                     "$push": {"completed_steps": "engine_deployed"}})
                ok = await self.engines.wait_ready(name)
                if not ok:
                    raise RuntimeError(f"engine {name} never became ready")
                await q.update_one(
                    {"queue_id": qid},
                    {"$set": {"current_step": 2},
                     "$push": {"completed_steps": "engine_ready"}})

            for i, job in enumerate(item["benchmark_jobs"]):
                job_name = await self._launch_job(qid, job, name, endpoint)
                await q.update_one(
                    {"queue_id": qid},
                    {"$push": {"started_jobs": job_name}})
                ok = await self._wait_job(job_name)
                await q.update_one(
                    {"queue_id": qid},
                    {"$set": {"current_step": 2 + i + 1},
                     "$push": {"completed_steps":
                               f"job_{job_name}_"
                               f"{'done' if ok else 'failed'}"}})
                if not ok:
                    raise RuntimeError(f"benchmark job {job_name} failed")

            await q.update_one({"queue_id": qid},
                               {"$set": {"status": "completed",
                                         "finished_at": time.time()}})
        except Exception as e:
            logger.exception("queue item %s failed", qid)
            await q.update_one({"queue_id": qid},
                               {"$set": {"status": "failed",
                                         "error": str(e),
                                         "finished_at": time.time()}})
        finally:
            if self._processing == qid:
                self._processing = None

    async def _launch_job(self, qid: str, job: dict, engine_name: str,
                          endpoint: str) -> str:
        """Launch one benchmark job through the deployer
        (reference queue_manager.py:1020-1046)."""
        async with aiohttp.ClientSession() as session:
            if job.get("yaml_content"):
                body = {"yaml_content": job["yaml_content"],
                        "placeholders": {
                            "VLLM_DEPLOYMENT_NAME": engine_name,
                            "VLLM_SERVICE_NAME": engine_name,
                            "VLLM_POD_NAME": engine_name,
                            "ENGINE_ENDPOINT": endpoint}}
                async with session.post(f"{self.deployer_url}/deploy",
                                        json=body) as r:
                    data = await r.json()
                    if r.status != 200:
                        raise RuntimeError(f"job deploy failed: {data}")
                    return data["deployed"][0]["name"]
            body = {"project_id": job.get("project_id"),
                    "config_file_id": job.get("config_file_id"),
                    "job_file_id": job.get("job_file_id"),
                    "engine_endpoint": endpoint}
            async with session.post(f"{self.deployer_url}/run",
                                    json=body) as r:
                data = await r.json()
                if r.status != 200:
                    raise RuntimeError(f"job run failed: {data}")
                return data["run_id"]

    async def _wait_job(self, job_name: str) -> bool:
        """Poll job status with timeout + failure budget
        (reference queue_manager.py:1113-1264)."""
        deadline = time.monotonic() + self.job_timeout
        failures = 0
        async with aiohttp.ClientSession() as session:
            while time.monotonic() < deadline:
                try:
                    async with session.get(
                            f"{self.deployer_url}/jobs/{job_name}/status"
                            ) as r:
                        if r.status == 200:
                            st = (await r.json())["status"]
                            if st == "succeeded":
                                return True
                            if st == "failed":
                                failures += 1
                                if failures >= self.job_max_failures:
                                    return False
                except Exception:
                    failures += 1
                    if failures >= self.job_max_failures * 3:
                        return False
                await asyncio.sleep(self.job_poll)
        return False


class EngineManagerService(ServiceApp):
    name = "engine-manager"

    def __init__(self, store=None, snapshot_path: Optional[str] = None,
                 procman: Optional[ProcessManager] = None,
                 deployer_url: str = "", autostart_scheduler: bool = True,
                 configs_dir: Optional[str] = None):
        super().__init__(store or connect_store(
            db_name="deploy_db", snapshot_path=snapshot_path))
        self.procman = procman or ProcessManager()
        self.engines = EngineManager(self.store, self.procman)
        deployer_url = deployer_url or os.environ.get(
            "DEPLOYER_URL", "http://127.0.0.1:8002")
        self.queue = QueueManager(self.store, self.engines, deployer_url)
        self.autostart = autostart_scheduler
        self.configs_dir = configs_dir or os.path.join(
            REPO_ROOT, "configs")

    async def on_startup(self):
        # re-adopt engine processes a previous manager instance left
        # running, then reconcile the deployment records against them —
        # the reference reloads deployments from Mongo while its pods
        # keep serving (vllm_manager.py:61-76, main.py:69-71)
        adopted = await self.procman.readopt()
        if adopted:
            logger.info("re-adopted running processes: %s", adopted)
        for dep in await self.store["engine_deployments"].find(
                {"status": {"$in": ["ready", "deploying"]}}):
            name = dep.get("name")
            mp = self.procman.get(name)
            if mp is not None and mp.status == "running":
                continue
            await self.store["engine_deployments"].update_one(
                {"name": name},
                {"$set": {"status": "failed",
                          "error": "engine process not found after "
                                   "manager restart"}})
        if self.autostart:
            self.queue.start()

    async def on_cleanup(self):
        await self.queue.stop()

    def routes(self):
        return [
            # engine deployment
            web.post("/deploy", self.deploy),
            web.post("/deploy-from-file", self.deploy_from_file),
            web.post("/deploy-default", self.deploy_default),
            web.get("/deployments", self.list_deployments),
            web.get("/deployments/{name}", self.get_deployment),
            web.delete("/deployments/{name}", self.delete_deployment),
            # queue
            web.post("/queue/deployment", self.q_add),
            web.get("/queue/list", self.q_list),
            web.get("/queue/status", self.q_status),
            web.get("/queue/deployment/{qid}", self.q_get),
            web.delete("/queue/deployment/{qid}", self.q_delete),
            web.delete("/queue/deployment/{qid}/force", self.q_force_delete),
            web.post("/queue/deployment/{qid}/cancel", self.q_cancel),
            web.patch("/queue/deployment/{qid}/priority", self.q_priority),
            web.patch("/queue/deployment/{qid}/status", self.q_patch_status),
            # scheduler control
            web.post("/scheduler/start", self.sched_start),
            web.post("/scheduler/stop", self.sched_stop),
            web.post("/scheduler/pause", self.sched_pause),
            web.post("/scheduler/resume", self.sched_resume),
            web.get("/scheduler/status", self.sched_status),
            web.post("/scheduler/trigger", self.sched_trigger),
            web.patch("/scheduler/config", self.sched_config),
            # configs
            web.get("/configs", self.list_configs),
            web.post("/configs/validate", self.validate_config),
            # debug
            web.get("/debug/processes", self.debug_processes),
        ]

    # ----------------------------------------------------------- handlers

    async def deploy(self, request):
        body = await request.json()
        config = body.get("engine_config") or body.get("vllm_config") or body
        res = await self.engines.deploy(config, name=body.get("name"))
        if res["status"] == "deploying":
            # detached monitoring (reference main.py:115-129 returns
            # immediately with status deploying)
            self.spawn(self.engines.wait_ready(res["name"]))
        return json_response(res)

    async def deploy_from_file(self, request):
        body = await request.json()
        path = os.path.join(self.configs_dir,
                            os.path.basename(body["config_file"]))
        if not os.path.exists(path):
            return error_response(404, f"config {body['config_file']} "
                                       f"not found")
        import yaml as _yaml

        with open(path) as f:
            config = _yaml.safe_load(f)
        res = await self.engines.deploy(config, name=body.get("name"))
        if res["status"] == "deploying":
            self.spawn(self.engines.wait_ready(res["name"]))
        return json_response(res)

    async def deploy_default(self, request):
        return await self.deploy_from_file_named("engine_config.yaml")

    async def deploy_from_file_named(self, fname: str):
        path = os.path.join(self.configs_dir, fname)
        config = {}
        if os.path.exists(path):
            import yaml as _yaml

            with open(path) as f:
                config = _yaml.safe_load(f) or {}
        res = await self.engines.deploy(config)
        if res["status"] == "deploying":
            self.spawn(self.engines.wait_ready(res["name"]))
        return json_response(res)

    async def list_deployments(self, request):
        return json_response({"deployments": await self.engines.list()})

    async def get_deployment(self, request):
        name = request.match_info["name"]
        docs = await self.engines.list()
        for d in docs:
            if d["name"] == name:
                return json_response(d)
        return error_response(404, f"deployment {name} not found")

    async def delete_deployment(self, request):
        name = request.match_info["name"]
        ok = await self.engines.delete(name)
        if not ok:
            return error_response(404, f"deployment {name} not found")
        return json_response({"name": name, "status": "deleted"})

    async def q_add(self, request):
        item = await self.queue.add(await request.json())
        return json_response(item, status=201)

    async def q_list(self, request):
        return json_response({"queue": await self.queue.list(
            request.query.get("status"))})

    async def q_status(self, request):
        docs = await self.queue.list()
        counts: Dict[str, int] = {}
        for d in docs:
            counts[d["status"]] = counts.get(d["status"], 0) + 1
        return json_response({"counts": counts,
                              "scheduler": self.queue.status()})

    async def q_get(self, request):
        d = await self.queue.get(request.match_info["qid"])
        if d is None:
            return error_response(404, "queue item not found")
        return json_response(d)

    async def q_delete(self, request):
        ok = await self.queue.delete(request.match_info["qid"])
        if not ok:
            return error_response(404, "queue item not found")
        return json_response({"status": "deleted"})

    async def q_force_delete(self, request):
        ok = await self.queue.delete(request.match_info["qid"], force=True)
        if not ok:
            return error_response(404, "queue item not found")
        return json_response({"status": "deleted"})

    async def q_cancel(self, request):
        ok = await self.queue.cancel(request.match_info["qid"])
        if not ok:
            return error_response(404, "queue item not found")
        return json_response({"status": "cancelled"})

    async def q_priority(self, request):
        body = await request.json()
        ok = await self.queue.set_priority(request.match_info["qid"],
                                           body["priority"])
        if not ok:
            return error_response(404, "queued item not found")
        return json_response({"status": "updated"})

    async def q_patch_status(self, request):
        body = await request.json()
        ok = await self.queue.patch_status(request.match_info["qid"],
                                           body["status"])
        if not ok:
            return error_response(404, "queue item not found")
        return json_response({"status": "updated"})

    async def sched_start(self, request):
        self.queue.start()
        return json_response(self.queue.status())

    async def sched_stop(self, request):
        await self.queue.stop()
        return json_response(self.queue.status())

    async def sched_pause(self, request):
        self.queue.paused = True
        return json_response(self.queue.status())

    async def sched_resume(self, request):
        self.queue.paused = False
        return json_response(self.queue.status())

    async def sched_status(self, request):
        return json_response(self.queue.status())

    async def sched_trigger(self, request):
        """Force one scheduler pass immediately, bypassing the poll wait
        (reference deployer main.py:390 /vllm/queue/scheduler/trigger)."""
        try:
            await self.queue._process_next()
        except Exception as exc:  # surfaced, not swallowed by the loop
            return error_response(500, f"trigger failed: {exc}")
        return json_response({"triggered": True, **self.queue.status()})

    async def sched_config(self, request):
        body = await request.json()
        if "poll_interval" in body:
            self.queue.poll_interval = float(body["poll_interval"])
        if "job_timeout" in body:
            self.queue.job_timeout = float(body["job_timeout"])
        return json_response(self.queue.status())

    async def list_configs(self, request):
        files = []
        if os.path.isdir(self.configs_dir):
            files = sorted(f for f in os.listdir(self.configs_dir)
                           if f.endswith((".yaml", ".yml")))
        return json_response({"configs": files})

    async def validate_config(self, request):
        body = await request.json()
        from ...engine.config import EngineConfig

        try:
            cfg = EngineConfig.from_dict(
                body.get("engine_config") or body.get("vllm_config") or body)
            return json_response({"valid": True, "normalized": cfg.to_dict()})
        except Exception as e:
            return json_response({"valid": False, "error": str(e)})

    async def debug_processes(self, request):
        return json_response({"processes": [
            self.procman.describe(p) for p in self.procman.list()],
            "tpu_chips_total": self.procman.total_tpu_chips,
            "tpu_chips_in_use": self.procman.tpu_chips_in_use()})


def make_cli_em():
    import argparse

    def main(argv=None):
        ap = argparse.ArgumentParser()
        ap.add_argument("--host", default="0.0.0.0")
        ap.add_argument("--port", type=int, default=8005)
        ap.add_argument("--snapshot", default=None)
        args = ap.parse_args(argv)
        from ..common.app import run_service
        run_service(EngineManagerService(snapshot_path=args.snapshot),
                    host=args.host, port=args.port)

    return main


main = make_cli_em()

if __name__ == "__main__":
    main()
