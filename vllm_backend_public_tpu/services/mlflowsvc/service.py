"""MLflow-watcher service — model-release automation (port 8003).

Reimplements the reference's benchmark-mlflow (reference:
benchmark-mlflow/main.py, mlflow_manager.py, github_client.py): a
background poller watches a model registry; for each registered model's
latest version it (a) skips if the modelid already matches what's
committed (dedupe, mlflow_manager.py:162-172), (b) renders per-engine
model YAML through the processor strategy seam and commits it
(github_client.py:178-227), (c) optionally emits a deployment app doc
(the ArgoCD-app analog, :266-414, with the same idempotent same-content
skip), and (d) optionally POSTs to the eval service to trigger evaluation
(mlflow_manager.py:260-270).

Differences from the reference, by design: the poller is an asyncio task
(not a thread), the registry and the git remote are pluggable — MLflow
REST / local JSON registry, GitHub API / local directory — so the whole
loop runs in a no-egress environment.
"""

from __future__ import annotations

import asyncio
import json
import os
import time
from typing import Dict, List, Optional

import aiohttp
import yaml
from aiohttp import web

from ..common.app import ServiceApp, error_response, json_response, make_cli
from ..common.store import connect_store
from .processors import PROCESSORS, get_processor


class RegistrySource:
    async def list_models(self) -> List[dict]:
        """[{model_name, version, model_id, run_id, experiment_id}]"""
        raise NotImplementedError


class LocalFileRegistry(RegistrySource):
    """JSON file: [{"model_name": ..., "version": ..., "model_id": ...}]"""

    def __init__(self, path: str):
        self.path = path

    async def list_models(self) -> List[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return json.load(f)


class MLflowRegistry(RegistrySource):
    """MLflow REST API registry (used when MLFLOW_TRACKING_URI is set)."""

    def __init__(self, tracking_uri: str):
        self.uri = tracking_uri.rstrip("/")

    async def list_models(self) -> List[dict]:
        out = []
        async with aiohttp.ClientSession() as session:
            url = (f"{self.uri}/api/2.0/mlflow/registered-models/search")
            async with session.get(url) as r:
                if r.status != 200:
                    raise RuntimeError(f"mlflow search: HTTP {r.status}")
                data = await r.json()
            for rm in data.get("registered_models", []):
                versions = rm.get("latest_versions", [])
                if not versions:
                    continue
                latest = max(versions, key=lambda v: int(v["version"]))
                out.append({
                    "model_name": rm["name"],
                    "version": latest["version"],
                    "model_id": latest.get("source", ""),
                    "run_id": latest.get("run_id", ""),
                    "experiment_id": "",
                })
        return out


class GitSink:
    async def get(self, path: str) -> Optional[str]:
        raise NotImplementedError

    async def put(self, path: str, content: str, message: str) -> None:
        raise NotImplementedError


class LocalDirSink(GitSink):
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    async def get(self, path: str) -> Optional[str]:
        p = os.path.join(self.root, path)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read()

    async def put(self, path: str, content: str, message: str) -> None:
        p = os.path.join(self.root, path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(content)


class GitHubSink(GitSink):
    """GitHub contents-API writer (reference github_client.py:63-176)."""

    API = "https://api.github.com"

    def __init__(self, repo: str, token: str, branch: str = "main"):
        self.repo = repo
        self.token = token
        self.branch = branch

    def _headers(self):
        return {"Authorization": f"Bearer {self.token}",
                "Accept": "application/vnd.github+json"}

    async def get(self, path: str) -> Optional[str]:
        import base64

        async with aiohttp.ClientSession(headers=self._headers()) as s:
            url = f"{self.API}/repos/{self.repo}/contents/{path}"
            async with s.get(url, params={"ref": self.branch}) as r:
                if r.status != 200:
                    return None
                data = await r.json()
                return base64.b64decode(data["content"]).decode()

    async def put(self, path: str, content: str, message: str) -> None:
        import base64

        async with aiohttp.ClientSession(headers=self._headers()) as s:
            url = f"{self.API}/repos/{self.repo}/contents/{path}"
            sha = None
            async with s.get(url, params={"ref": self.branch}) as r:
                if r.status == 200:
                    sha = (await r.json())["sha"]
            body = {"message": message, "branch": self.branch,
                    "content": base64.b64encode(content.encode()).decode()}
            if sha:
                body["sha"] = sha
            async with s.put(url, json=body) as r:
                if r.status not in (200, 201):
                    raise RuntimeError(f"github put {path}: HTTP {r.status}")


class ArgoCDGenerator:
    """ArgoCD AppProject + per-(model, engine) Application generation.

    The reference commits these into a third ("argo") repo from
    str.format templates with an idempotent same-content skip
    (reference: benchmark-mlflow/github_client.py:266-414); ArgoCD then
    deploys the released model. Same flow here against a pluggable sink;
    the manifests follow the argoproj.io/v1alpha1 schema the reference's
    templates render.
    """

    def __init__(self, sink: GitSink, project_name: str, repo_url: str,
                 namespace: str):
        self.sink = sink
        self.project_name = project_name
        self.repo_url = repo_url
        self.namespace = namespace

    async def _put_if_changed(self, path: str, doc: dict,
                              message: str) -> bool:
        content = yaml.safe_dump(doc, sort_keys=False)
        existing = await self.sink.get(path)
        if existing is not None and existing.strip() == content.strip():
            return False  # idempotent same-content skip (:316-320)
        await self.sink.put(path, content, message)
        return True

    async def ensure_project(self) -> bool:
        doc = {
            "apiVersion": "argoproj.io/v1alpha1",
            "kind": "AppProject",
            "metadata": {"name": self.project_name,
                         "namespace": "argocd"},
            "spec": {
                "description": f"model releases for {self.project_name}",
                "sourceRepos": [self.repo_url],
                "destinations": [{"server":
                                  "https://kubernetes.default.svc",
                                  "namespace": self.namespace}],
                "clusterResourceWhitelist": [{"group": "*", "kind": "*"}],
            },
        }
        return await self._put_if_changed(
            f"projects/{self.project_name}.yaml", doc,
            f"Create ArgoCD AppProject {self.project_name}")

    async def upsert_application(self, model_name: str,
                                 engine: str) -> bool:
        app_name = f"{engine}-{model_name}".lower().replace("_", "-")
        doc = {
            "apiVersion": "argoproj.io/v1alpha1",
            "kind": "Application",
            "metadata": {"name": app_name, "namespace": "argocd"},
            "spec": {
                "project": self.project_name,
                "source": {
                    "repoURL": self.repo_url,
                    "targetRevision": "HEAD",
                    "path": engine,
                    "helm": {"valueFiles":
                             [f"models/{engine}/{model_name}.yaml"]},
                },
                "destination": {
                    "server": "https://kubernetes.default.svc",
                    "namespace": self.namespace,
                },
                "syncPolicy": {"automated": {"prune": True,
                                             "selfHeal": True}},
            },
        }
        return await self._put_if_changed(
            f"applications/{app_name}.yaml", doc,
            f"Update ArgoCD Application for {model_name}")


class MLflowWatcher(ServiceApp):
    name = "mlflow-watcher"

    def __init__(self, store=None, snapshot_path: Optional[str] = None,
                 registry: Optional[RegistrySource] = None,
                 sink: Optional[GitSink] = None,
                 engines: Optional[List[str]] = None,
                 eval_url: str = "", poll_interval: Optional[float] = None,
                 autostart: bool = True,
                 templates: Optional[Dict[str, dict]] = None,
                 argo: Optional[ArgoCDGenerator] = None):
        super().__init__(store or connect_store(
            db_name="manage_db", snapshot_path=snapshot_path))
        if registry is None:
            uri = os.environ.get("MLFLOW_TRACKING_URI", "")
            registry = (MLflowRegistry(uri) if uri else LocalFileRegistry(
                os.environ.get("LOCAL_REGISTRY_PATH",
                               "/tmp/vbpt-registry.json")))
        self.registry = registry
        if sink is None:
            repo = os.environ.get("GITHUB_MODELS_REPO", "")
            token = os.environ.get("GITHUB_TOKEN", "")
            sink = (GitHubSink(repo, token) if repo and token
                    else LocalDirSink(os.environ.get(
                        "LOCAL_GIT_DIR", "/tmp/vbpt-models-repo")))
        self.sink = sink
        engines_env = os.environ.get("ENGINE_TYPES", "tpu")
        self.engines = engines or [e.strip()
                                   for e in engines_env.split(",") if e]
        self.eval_url = eval_url or os.environ.get("EVAL_URL", "")
        self.poll_interval = (poll_interval if poll_interval is not None
                              else float(os.environ.get("POLL_INTERVAL",
                                                        "60")))
        self.autostart = autostart
        self.templates = templates or {}
        if argo is None and os.environ.get("ARGO_ENABLED") == "1":
            # third repo (reference's argo repo): own sink + settings
            argo_repo = os.environ.get("GITHUB_ARGO_REPO", "")
            token = os.environ.get("GITHUB_TOKEN", "")
            argo_sink = (GitHubSink(argo_repo, token)
                         if argo_repo and token else LocalDirSink(
                             os.environ.get("LOCAL_ARGO_DIR",
                                            "/tmp/vbpt-argo-repo")))
            argo = ArgoCDGenerator(
                argo_sink,
                project_name=os.environ.get("ARGO_PROJECT", "model-serving"),
                repo_url=os.environ.get("ARGO_REPO_URL",
                                        "https://example.local/models.git"),
                namespace=os.environ.get("ARGO_NAMESPACE", "serving"))
        self.argo = argo
        self.last_poll: Optional[dict] = None

    async def on_startup(self):
        if self.autostart:
            self.spawn(self._poll_loop())

    def routes(self):
        return [
            web.post("/poll", self.manual_poll),
            web.get("/connections", self.connections),
            web.get("/events", self.events),
        ]

    # ------------------------------------------------------------- polling

    async def _poll_loop(self):
        while True:
            try:
                await self.poll_once()
            except asyncio.CancelledError:
                return
            except Exception as e:
                self.last_poll = {"at": time.time(), "error": str(e)}
            await asyncio.sleep(self.poll_interval)

    async def poll_once(self) -> dict:
        models = await self.registry.list_models()
        processed, skipped = [], []
        for event in models:
            new = await self._handle_model(event)
            (processed if new else skipped).append(event["model_name"])
        self.last_poll = {"at": time.time(), "processed": processed,
                          "skipped": skipped}
        return self.last_poll

    async def _handle_model(self, event: dict) -> bool:
        handled_any = False
        for engine in self.engines:
            path = f"models/{engine}/{self._safe(event['model_name'])}.yaml"
            existing = await self.sink.get(path)
            if existing is not None:
                try:
                    doc = yaml.safe_load(existing)
                    if (doc.get("global", {}).get("modelid")
                            == event["model_id"]):
                        continue  # dedupe (mlflow_manager.py:162-172)
                except yaml.YAMLError:
                    pass
            template = self.templates.get(engine, {})
            rendered = get_processor(engine).process(template, event)
            content = yaml.safe_dump(rendered, sort_keys=False)
            if existing == content:
                continue  # idempotent same-content skip
            await self.sink.put(
                path, content,
                f"release: {event['model_name']} v{event.get('version')} "
                f"({engine})")
            await self.store["model_events"].insert_one({
                "model_name": event["model_name"], "engine": engine,
                "model_id": event["model_id"],
                "version": event.get("version"), "path": path,
                "at": time.time()})
            handled_any = True
            if self.argo is not None:
                # ArgoCD release: project (once) + per-(model, engine)
                # Application (reference mlflow_manager.py:219-239)
                await self.argo.ensure_project()
                await self.argo.upsert_application(
                    self._safe(event["model_name"]), engine)
        if handled_any and self.eval_url:
            await self._request_evaluation(event)
        return handled_any

    async def _request_evaluation(self, event: dict) -> None:
        engine_url = os.environ.get("EVAL_ENGINE_URL", "")
        if not engine_url:
            return
        try:
            async with aiohttp.ClientSession() as s:
                await s.post(f"{self.eval_url}/evaluate", json={
                    "model_name": event["model_name"],
                    "inference_engine_url": engine_url})
        except Exception:
            pass

    @staticmethod
    def _safe(name: str) -> str:
        return name.lower().replace("/", "-").replace("_", "-")

    # ------------------------------------------------------------ handlers

    async def manual_poll(self, request):
        return json_response(await self.poll_once())

    async def connections(self, request):
        return json_response({
            "registry": type(self.registry).__name__,
            "sink": type(self.sink).__name__,
            "engines": self.engines,
            "known_processors": sorted(PROCESSORS),
            "eval_url": self.eval_url or None,
            "last_poll": self.last_poll,
        })

    async def events(self, request):
        docs = await self.store["model_events"].find({}, sort=[("at", -1)],
                                                     limit=100)
        for d in docs:
            d.pop("_id", None)
        return json_response({"events": docs})


main = make_cli(MLflowWatcher, default_port=8003)

if __name__ == "__main__":
    main()
