"""Deployer service — deployment engine + terminal + queue front-door
(port 8002).

Reimplements the reference's benchmark-deployer (reference:
benchmark-deployer/main.py, deployer_manager.py, kubernetes_client.py,
terminal_manager.py) retargeted from K8s pods to TPU-slice processes:

- POST /deploy takes multi-doc YAML. Supported kinds: Job (k8s-shaped,
  containers[0].command runs as a local process with env + placeholder
  substitution — deployer_manager.py:1045-1080), EngineDeployment (ours:
  launches the in-repo engine server on TPU chips), ConfigMap
  (materialized to a mounted directory), Service/other (recorded,
  satisfied implicitly by local networking).
- Deployment registry with live status reconciliation on read
  (deployer_manager.py:257-344) and conflict-replace on re-deploy.
- /run: fetch config+job files from the manager, mount the eval config
  JSON, inject the engine endpoint env, launch the job
  (deployer_manager.py:2071-2263).
- Interactive terminal: PTY sessions bridged over a WebSocket
  (terminal_manager.py:64-175) — a shell in the job's working context.
- /engine/deploy + /queue proxy: registers queued engine deployments into
  the engine-manager service, which calls back here to run benchmark jobs
  (the deliberate circular dependency, SURVEY.md §1).
"""

from __future__ import annotations

import asyncio
import json
import os
import pty
import socket
import time
import uuid
from typing import Dict, List, Optional

import aiohttp
import yaml
from aiohttp import web

from ..common.app import ServiceApp, error_response, json_response
from ..common.procman import ProcessManager
from ..common.store import connect_store

ENGINE_MODULE = "vllm_backend_public_tpu.server"
JOB_DEFAULT_MODULE = "vllm_backend_public_tpu.benchmarks.runner"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def engine_command(config: dict, port: int) -> List[str]:
    """EngineConfig dict -> server argv (the analog of the vLLM CLI arg
    assembly at reference vllm_templates.py:50-87)."""
    import sys

    cmd = [sys.executable, "-m", ENGINE_MODULE,
           "--port", str(port), "--host", "127.0.0.1"]
    if config.get("demo") or not config.get("model"):
        cmd.append("--demo")
    else:
        cmd += ["--model", str(config["model"])]
    flag_map = {
        "served_model_name": "--served-model-name",
        "dtype": "--dtype", "quantization": "--quantization",
        "kv_cache_dtype": "--kv-cache-dtype",
        "block_size": "--block-size", "max_num_seqs": "--max-num-seqs",
        "max_model_len": "--max-model-len",
        "max_num_batched_tokens": "--max-num-batched-tokens",
        "hbm_utilization": "--hbm-utilization",
        "tensor_parallel_size": "--tensor-parallel-size",
    }
    for key, flag in flag_map.items():
        if config.get(key) is not None:
            cmd += [flag, str(config[key])]
    # data parallelism deploys as replicas behind the request router
    # (server/router.py) — the reference's replicaCount-behind-a-Service
    # (vllm_manager.py:370); in-program DP would shard the KV pool for
    # no serving benefit
    dp = int(config.get("data_parallel_size") or 1)
    if dp > 1:
        cmd += ["--dp-replicas", str(dp)]
    return cmd


class TerminalSession:
    def __init__(self, session_id: str, job_name: str, cwd: str,
                 env: Dict[str, str]):
        self.session_id = session_id
        self.job_name = job_name
        self.cwd = cwd
        self.env = env
        self.created_at = time.time()
        self.last_activity = time.time()
        self.master_fd: Optional[int] = None
        self.proc: Optional[asyncio.subprocess.Process] = None

    async def start(self):
        master, slave = pty.openpty()
        self.master_fd = master
        env = dict(os.environ)
        env.update(self.env)
        env["TERM"] = "xterm"
        self.proc = await asyncio.create_subprocess_exec(
            "/bin/bash", "-i", stdin=slave, stdout=slave, stderr=slave,
            cwd=self.cwd or None, env=env, start_new_session=True)
        os.close(slave)

    def write(self, data: bytes):
        self.last_activity = time.time()
        os.write(self.master_fd, data)

    def read_nowait(self) -> bytes:
        import fcntl

        fl = fcntl.fcntl(self.master_fd, fcntl.F_GETFL)
        fcntl.fcntl(self.master_fd, fcntl.F_SETFL, fl | os.O_NONBLOCK)
        try:
            return os.read(self.master_fd, 65536)
        except (BlockingIOError, OSError):
            return b""

    async def close(self):
        if self.proc and self.proc.returncode is None:
            try:
                self.proc.kill()
            except ProcessLookupError:
                pass
        if self.master_fd is not None:
            try:
                os.close(self.master_fd)
            except OSError:
                pass


class DeployerService(ServiceApp):
    name = "deployer"

    def __init__(self, store=None, snapshot_path: Optional[str] = None,
                 procman: Optional[ProcessManager] = None,
                 manager_url: str = "",
                 engine_manager_url: str = "",
                 results_url: str = ""):
        super().__init__(store or connect_store(
            db_name="deploy_db", snapshot_path=snapshot_path))
        self.procman = procman or ProcessManager()
        self.manager_url = (manager_url or
                            os.environ.get("MANAGER_URL",
                                           "http://127.0.0.1:8001"))
        self.engine_manager_url = (engine_manager_url or
                                   os.environ.get("ENGINE_MANAGER_URL",
                                                  "http://127.0.0.1:8005"))
        self.results_url = (results_url or
                            os.environ.get("RESULTS_URL",
                                           "http://127.0.0.1:8000"))
        self.configmap_root = os.path.join(self.procman.log_dir, "configmaps")
        os.makedirs(self.configmap_root, exist_ok=True)
        self.terminals: Dict[str, TerminalSession] = {}

    def routes(self):
        return [
            web.post("/deploy", self.deploy),
            web.post("/delete", self.delete),
            web.get("/deployments", self.list_deployments),
            web.get("/jobs/{name}/status", self.job_status),
            web.get("/jobs/{name}/logs", self.job_logs),
            web.delete("/jobs/{name}", self.delete_job),
            web.post("/jobs/logs", self.jobs_logs_bulk),
            web.post("/run", self.run_benchmark),
            web.post("/engine/deploy", self.engine_deploy),
            web.post("/terminal/create", self.terminal_create),
            web.post("/jobs/{name}/terminal", self.terminal_create_for_job),
            web.get("/terminal/sessions", self.terminal_sessions),
            web.delete("/terminal/job/{name}", self.terminal_close_for_job),
            web.delete("/terminal/{sid}", self.terminal_close),
            # GET /terminal/{sid}: WebSocket upgrade opens the shell bridge;
            # a plain GET returns session info (reference main.py:234,265)
            web.get("/terminal/{sid}", self.terminal_ws),
            # queue front-door (proxied to engine-manager)
            web.post("/queue/deployment", self.queue_register),
            web.get("/queue/list", self.queue_proxy_get),
            web.get("/queue/status", self.queue_proxy_get),
            web.get("/queue/deployment/{qid}", self.queue_proxy_get_item),
            web.delete("/queue/deployment/{qid}", self.queue_proxy_delete),
            # reference-path aliases (benchmark-deployer main.py:296-399)
            web.post("/vllm/helm/deploy", self.engine_deploy),
            web.post("/vllm/queue/deployment", self.queue_register),
            web.get("/vllm/queue/list", self.queue_proxy_get),
            web.get("/vllm/queue/status", self.queue_proxy_get),
            web.get("/vllm/queue/scheduler/status", self.sched_status_proxy),
            web.post("/vllm/queue/scheduler/trigger", self.sched_trigger),
            web.post("/vllm/queue/{qid}/priority", self.queue_priority_proxy),
            web.post("/vllm/queue/{qid}/cancel", self.queue_cancel_proxy),
            web.get("/vllm/queue/{qid}", self.queue_proxy_get_item),
            web.delete("/vllm/queue/{qid}", self.queue_proxy_delete),
        ]

    # ------------------------------------------------------------- deploy

    async def deploy(self, request: web.Request) -> web.Response:
        body = await request.json()
        yaml_content = body.get("yaml_content")
        if not yaml_content:
            raise KeyError("yaml_content")
        docs = [d for d in yaml.safe_load_all(yaml_content) if d]
        if not docs:
            raise ValueError("no YAML documents found")
        results = []
        for doc in docs:
            results.append(await self._deploy_doc(doc, body))
        return json_response({"deployed": results})

    async def _deploy_doc(self, doc: dict, body: dict) -> dict:
        kind = doc.get("kind", "")
        meta = doc.get("metadata", {}) or {}
        name = meta.get("name") or f"res-{uuid.uuid4().hex[:8]}"
        namespace = meta.get("namespace", "default")

        if kind in ("ConfigMap", "Secret"):
            # Secret: same file-mount substrate as ConfigMap but values
            # are base64-decoded (k8s Secret data contract; stringData
            # passes through) and files are chmod 0600
            # (reference kind dispatch: kubernetes_client.py:106-226)
            cm_dir = os.path.join(self.configmap_root, name)
            os.makedirs(cm_dir, exist_ok=True)
            items = dict(doc.get("data") or {})
            if kind == "Secret":
                import base64
                decoded = {}
                for fname, content in items.items():
                    try:
                        decoded[fname] = base64.b64decode(
                            content).decode("utf-8", "replace")
                    except Exception:
                        decoded[fname] = str(content)
                decoded.update(doc.get("stringData") or {})
                items = decoded
            for fname, content in items.items():
                path = os.path.join(cm_dir, fname)
                with open(path, "w") as f:
                    f.write(content)
                if kind == "Secret":
                    os.chmod(path, 0o600)
            await self._register(name, kind, namespace, {"dir": cm_dir})
            return {"name": name, "kind": kind, "status": "created"}

        if kind == "Job":
            return await self._deploy_job(doc, name, namespace, body)

        if kind in ("EngineDeployment", "Deployment", "StatefulSet"):
            config = (doc.get("spec") or {}).get("engine") or \
                     (doc.get("spec") or {}).get("config") or {}
            return await self._deploy_engine(name, namespace, config)

        # Service / Ingress etc.: recorded, locally a no-op
        await self._register(name, kind or "Unknown", namespace, {})
        return {"name": name, "kind": kind, "status": "recorded"}

    async def _deploy_job(self, doc: dict, name: str, namespace: str,
                          body: dict) -> dict:
        # conflict recovery: completed job with same name is replaced
        # (reference kubernetes_client.py:164-208)
        existing = self.procman.get(name)
        if existing is not None:
            if existing.status == "running":
                raise ValueError(f"job {name} already running")
            self.procman.remove(name)

        spec = ((doc.get("spec") or {}).get("template") or {}) \
            .get("spec", {}) or {}
        containers = spec.get("containers") or [{}]
        c0 = containers[0]
        command = list(c0.get("command") or []) + list(c0.get("args") or [])
        if not command:
            command = [os.sys.executable, "-m", JOB_DEFAULT_MODULE]
        env = {e["name"]: str(e.get("value", ""))
               for e in (c0.get("env") or [])}

        # placeholder substitution (deployer_manager.py:1045-1080)
        subs = body.get("placeholders", {})
        command = [self._substitute(tok, subs) for tok in command]
        env = {k: self._substitute(v, subs) for k, v in env.items()}

        mp = await self.procman.spawn(name, "job", command, env=env,
                                      cwd=REPO_ROOT)
        await self._register(name, "Job", namespace,
                             {"command": command, "log": mp.log_path})
        return {"name": name, "kind": "Job", "status": "started"}

    @staticmethod
    def _substitute(text: str, subs: dict) -> str:
        for key, val in subs.items():
            text = text.replace(key, str(val))
        return text

    async def _deploy_engine(self, name: str, namespace: str,
                             config: dict) -> dict:
        chips = int(config.get("tensor_parallel_size", 1)) * \
            int(config.get("data_parallel_size", 1))
        if self.procman.tpu_conflict(chips):
            raise ValueError(
                f"TPU resource conflict: need {chips} chips, "
                f"{self.procman.total_tpu_chips - self.procman.tpu_chips_in_use()} free")
        existing = self.procman.get(name)
        if existing is not None:
            if existing.status == "running":
                await self.procman.stop(name)
            self.procman.remove(name)
        port = int(config.get("port") or free_port())
        cmd = engine_command(config, port)
        mp = await self.procman.spawn(name, "engine", cmd, cwd=REPO_ROOT,
                                      tpu_chips=chips)
        endpoint = f"http://127.0.0.1:{port}"
        await self._register(name, "EngineDeployment", namespace,
                             {"endpoint": endpoint, "config": config,
                              "log": mp.log_path})
        return {"name": name, "kind": "EngineDeployment",
                "status": "deploying", "endpoint": endpoint}

    async def _register(self, name: str, kind: str, namespace: str,
                        extra: dict) -> None:
        await self.store["deployments"].update_one(
            {"name": name, "kind": kind},
            {"$set": {"name": name, "kind": kind, "namespace": namespace,
                      "created_at": time.time(), **extra}},
            upsert=True)

    # ------------------------------------------------------------- delete

    async def delete(self, request: web.Request) -> web.Response:
        body = await request.json()
        names: List[str] = []
        if body.get("yaml_content"):
            for doc in yaml.safe_load_all(body["yaml_content"]):
                if doc and doc.get("metadata", {}).get("name"):
                    names.append(doc["metadata"]["name"])
        if body.get("name"):
            names.append(body["name"])
        deleted = []
        for name in names:
            await self.procman.stop(name)
            self.procman.remove(name)
            await self.store["deployments"].delete_many({"name": name})
            deleted.append(name)
        return json_response({"deleted": deleted})

    # -------------------------------------------------------------- reads

    async def list_deployments(self, request: web.Request) -> web.Response:
        docs = await self.store["deployments"].find({})
        out = []
        for d in docs:
            d.pop("_id", None)
            mp = self.procman.get(d["name"])
            if mp is not None:
                d["status"] = mp.status
                d["returncode"] = mp.returncode
            elif d["kind"] in ("Job", "EngineDeployment"):
                # reconcile: process unknown to this instance -> tombstone
                # (reference deployer_manager.py:257-344)
                d["status"] = "unknown"
            out.append(d)
        return json_response({"deployments": out, "count": len(out)})

    async def job_status(self, request: web.Request) -> web.Response:
        name = request.match_info["name"]
        mp = self.procman.get(name)
        if mp is None:
            return error_response(404, f"job {name} not found")
        return json_response(self.procman.describe(mp))

    async def job_logs(self, request: web.Request) -> web.Response:
        name = request.match_info["name"]
        mp = self.procman.get(name)
        if mp is None:
            return error_response(404, f"job {name} not found")
        tail = request.query.get("tail")
        logs = self.procman.logs(name, tail=int(tail) if tail else None)
        return json_response({"name": name, "logs": logs})

    async def jobs_logs_bulk(self, request: web.Request) -> web.Response:
        """POST /jobs/logs {job_names: [...], tail?} — aggregated logs with
        per-job prefixes (reference main.py:173, kubernetes_client.py:292)."""
        body = await request.json()
        names = body.get("job_names") or body.get("names") or []
        tail = body.get("tail")
        out = {}
        for name in names:
            mp = self.procman.get(name)
            out[name] = (self.procman.logs(name, tail=tail)
                         if mp is not None else None)
        return json_response({"logs": out})

    async def delete_job(self, request: web.Request) -> web.Response:
        name = request.match_info["name"]
        stopped = await self.procman.stop(name)
        removed = self.procman.remove(name)
        await self.store["deployments"].delete_many({"name": name})
        if not (stopped or removed):
            return error_response(404, f"job {name} not found")
        return json_response({"name": name, "status": "deleted"})

    # ----------------------------------------------------- run (from mgr)

    async def run_benchmark(self, request: web.Request) -> web.Response:
        """POST /run: {project_id, config_file_id, job_file_id,
        engine_endpoint?} — reference deployer_manager.py:2071-2263."""
        body = await request.json()
        pid = body["project_id"]
        async with aiohttp.ClientSession() as session:
            cfg_doc = await self._manager_file(session, pid,
                                               body["config_file_id"])
            job_doc = (await self._manager_file(session, pid,
                                                body["job_file_id"])
                       if body.get("job_file_id") else None)

        run_id = f"run-{uuid.uuid4().hex[:8]}"
        cm_dir = os.path.join(self.configmap_root, run_id)
        os.makedirs(cm_dir, exist_ok=True)
        cfg_path = os.path.join(cm_dir, "eval_config.json")
        with open(cfg_path, "w") as f:
            f.write(cfg_doc["content"])

        endpoint = body.get("engine_endpoint", "")
        env = {"VLLM_MODEL_ENDPOINT": endpoint,
               "ENGINE_ENDPOINT": endpoint,
               "EVAL_CONFIG_PATH": cfg_path,
               "RESULTS_URL": self.results_url,
               "RUN_ID": run_id}
        if job_doc is not None:
            doc = yaml.safe_load(job_doc["content"])
            doc.setdefault("metadata", {})["name"] = run_id
            spec = ((doc.get("spec") or {}).get("template") or {}) \
                .get("spec", {}) or {}
            for c in spec.get("containers", []):
                c.setdefault("env", [])
                for k, v in env.items():
                    c["env"].append({"name": k, "value": v})
            result = await self._deploy_doc(doc, {})
        else:
            import sys
            mp = await self.procman.spawn(
                run_id, "job", [sys.executable, "-m", JOB_DEFAULT_MODULE],
                env=env, cwd=REPO_ROOT)
            await self._register(run_id, "Job", "benchmark",
                                 {"log": mp.log_path})
            result = {"name": run_id, "status": "started"}
        return json_response({"run_id": run_id, **result})

    async def _manager_file(self, session, pid: str, fid: str) -> dict:
        url = f"{self.manager_url}/projects/{pid}/files/{fid}"
        async with session.get(url) as r:
            if r.status != 200:
                raise ValueError(f"manager file fetch {fid}: HTTP {r.status}")
            return await r.json()

    # -------------------------------------------------- engine queue path

    async def engine_deploy(self, request: web.Request) -> web.Response:
        """Register an engine deployment into the engine-manager queue
        (the reference's helm-deploy delegation,
        deployer_manager.py:1138-1263)."""
        body = await request.json()
        async with aiohttp.ClientSession() as session:
            url = f"{self.engine_manager_url}/queue/deployment"
            async with session.post(url, json=body) as r:
                data = await r.json()
                return json_response(data, status=r.status)

    async def queue_register(self, request: web.Request) -> web.Response:
        return await self.engine_deploy(request)

    async def _proxy(self, request: web.Request, path: str,
                     method: str = "GET",
                     json_body: Optional[dict] = None) -> web.Response:
        async with aiohttp.ClientSession() as session:
            url = f"{self.engine_manager_url}{path}"
            async with session.request(method, url, json=json_body) as r:
                return json_response(await r.json(), status=r.status)

    async def queue_proxy_get(self, request):
        return await self._proxy(request, f"/queue/{request.path.split('/')[-1]}")

    async def queue_proxy_get_item(self, request):
        return await self._proxy(
            request, f"/queue/deployment/{request.match_info['qid']}")

    async def queue_proxy_delete(self, request):
        return await self._proxy(
            request, f"/queue/deployment/{request.match_info['qid']}",
            method="DELETE")

    async def queue_priority_proxy(self, request):
        body = await request.json()
        return await self._proxy(
            request, f"/queue/deployment/{request.match_info['qid']}/priority",
            method="PATCH", json_body=body)

    async def queue_cancel_proxy(self, request):
        return await self._proxy(
            request, f"/queue/deployment/{request.match_info['qid']}/cancel",
            method="POST")

    async def sched_status_proxy(self, request):
        return await self._proxy(request, "/scheduler/status")

    async def sched_trigger(self, request):
        """Reference main.py:390: force one scheduler pass now."""
        return await self._proxy(request, "/scheduler/trigger",
                                 method="POST")

    # ----------------------------------------------------------- terminal

    async def terminal_create(self, request: web.Request) -> web.Response:
        body = await request.json()
        job_name = body.get("job_name", "")
        cwd = REPO_ROOT
        env: Dict[str, str] = {}
        if job_name:
            mp = self.procman.get(job_name)
            if mp is None:
                return error_response(404, f"job {job_name} not found")
            cwd = mp.cwd or REPO_ROOT
            env = dict(mp.env)
        sid = uuid.uuid4().hex[:12]
        session = TerminalSession(sid, job_name, cwd, env)
        await session.start()
        self.terminals[sid] = session
        return json_response({"session_id": sid, "job_name": job_name})

    async def terminal_create_for_job(self, request: web.Request) -> web.Response:
        """POST /jobs/{name}/terminal (reference main.py:205)."""
        name = request.match_info["name"]
        mp = self.procman.get(name)
        if mp is None:
            return error_response(404, f"job {name} not found")
        sid = uuid.uuid4().hex[:12]
        session = TerminalSession(sid, name, mp.cwd or REPO_ROOT,
                                  dict(mp.env))
        await session.start()
        self.terminals[sid] = session
        return json_response({"session_id": sid, "job_name": name})

    async def terminal_close_for_job(self, request: web.Request) -> web.Response:
        """DELETE /terminal/job/{name}: close all of a job's sessions
        (reference main.py:256)."""
        name = request.match_info["name"]
        closed = []
        for sid in [s for s, t in self.terminals.items()
                    if t.job_name == name]:
            await self.terminals.pop(sid).close()
            closed.append(sid)
        return json_response({"job_name": name, "closed": closed})

    async def terminal_sessions(self, request: web.Request) -> web.Response:
        return json_response({"sessions": [
            {"session_id": s.session_id, "job_name": s.job_name,
             "created_at": s.created_at, "last_activity": s.last_activity}
            for s in self.terminals.values()]})

    async def terminal_close(self, request: web.Request) -> web.Response:
        sid = request.match_info["sid"]
        session = self.terminals.pop(sid, None)
        if session is None:
            return error_response(404, f"session {sid} not found")
        await session.close()
        return json_response({"session_id": sid, "status": "closed"})

    async def terminal_ws(self, request: web.Request) -> web.StreamResponse:
        sid = request.match_info["sid"]
        session = self.terminals.get(sid)
        if session is None:
            return error_response(404, f"session {sid} not found")
        if request.headers.get("Upgrade", "").lower() != "websocket":
            # plain GET: session info (reference main.py:234)
            return json_response({
                "session_id": session.session_id,
                "job_name": session.job_name,
                "created_at": session.created_at,
                "last_activity": session.last_activity,
                "active": session.proc is not None
                          and session.proc.returncode is None})
        ws = web.WebSocketResponse()
        await ws.prepare(request)

        async def pump_out():
            # 10 ms poll like the reference (terminal_manager.py:170)
            while not ws.closed:
                data = session.read_nowait()
                if data:
                    await ws.send_str(data.decode("utf-8",
                                                  errors="replace"))
                await asyncio.sleep(0.01)

        out_task = asyncio.get_running_loop().create_task(pump_out())
        try:
            async for msg in ws:
                if msg.type == web.WSMsgType.TEXT:
                    session.write(msg.data.encode())
                elif msg.type == web.WSMsgType.BINARY:
                    session.write(msg.data)
        finally:
            out_task.cancel()
        return ws


def make_deployer_cli():
    import argparse

    def main(argv=None):
        ap = argparse.ArgumentParser()
        ap.add_argument("--host", default="0.0.0.0")
        ap.add_argument("--port", type=int, default=8002)
        ap.add_argument("--snapshot", default=None)
        args = ap.parse_args(argv)
        from ..common.app import run_service
        run_service(DeployerService(snapshot_path=args.snapshot),
                    host=args.host, port=args.port)

    return main


main = make_deployer_cli()

if __name__ == "__main__":
    main()
