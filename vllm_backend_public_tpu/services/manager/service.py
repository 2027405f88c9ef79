"""Manager service — project / config file sync (port 8001).

Reimplements the reference's benchmark-manager (reference:
benchmark-manager/main.py, project_manager.py, github_client.py,
file_manager.py):

- project CRUD with two project types: "benchmark" (config/ + job/ folders)
  and "engine" (custom-values*.yaml files) — mirroring the benchmark/vllm
  split at project_manager.py:170-175
- sync: fetch all files from the source, upsert by (project_id, file_path)
  preserving stable file_ids, delete vanished files, stamp last_sync
  (project_manager.py:155-257)
- modified-file overlay: user edits tracked apart from synced originals,
  merged listing (file_manager.py:124-160), project reset

Sources: GitHub contents API (token auth) or a local directory
(`file:///path`) so the full sync path runs without egress.
"""

from __future__ import annotations

import asyncio
import base64
import os
import time
import uuid
from typing import Dict, List, Optional

import aiohttp
from aiohttp import web

from ..common.app import ServiceApp, error_response, json_response, make_cli
from ..common.store import connect_store


class FileSource:
    """Fetch (path, content) pairs for a project."""

    async def fetch_files(self, project: dict) -> List[dict]:
        raise NotImplementedError


class LocalDirSource(FileSource):
    """file:///abs/path repositories — the no-egress dev/test source."""

    async def fetch_files(self, project: dict) -> List[dict]:
        root = project["repo_url"][len("file://"):]
        if not os.path.isdir(root):
            raise ValueError(f"local repo {root} not found")
        wanted: List[dict] = []
        if project["project_type"] == "engine":
            for name in sorted(os.listdir(root)):
                if name.startswith("custom-values") and name.endswith(
                        (".yaml", ".yml")):
                    wanted.append(self._read(root, name))
        else:
            for folder in (project.get("config_folder", "config"),
                           project.get("job_folder", "job")):
                d = os.path.join(root, folder)
                if os.path.isdir(d):
                    for name in sorted(os.listdir(d)):
                        p = os.path.join(folder, name)
                        if os.path.isfile(os.path.join(root, p)):
                            wanted.append(self._read(root, p))
        return wanted

    @staticmethod
    def _read(root: str, rel: str) -> dict:
        with open(os.path.join(root, rel)) as f:
            return {"file_path": rel, "content": f.read()}


class GitHubSource(FileSource):
    """GitHub contents API (reference: benchmark-manager/github_client.py)."""

    API = "https://api.github.com"

    async def fetch_files(self, project: dict) -> List[dict]:
        owner_repo = (project["repo_url"].rstrip("/")
                      .replace("https://github.com/", ""))
        headers = {"Accept": "application/vnd.github+json"}
        if project.get("github_token"):
            headers["Authorization"] = f"Bearer {project['github_token']}"
        async with aiohttp.ClientSession(headers=headers) as session:
            if project["project_type"] == "engine":
                listing = await self._ls(session, owner_repo, "")
                names = [e["path"] for e in listing
                         if e["type"] == "file"
                         and e["name"].startswith("custom-values")]
            else:
                names = []
                for folder in (project.get("config_folder", "config"),
                               project.get("job_folder", "job")):
                    try:
                        listing = await self._ls(session, owner_repo, folder)
                    except ValueError:
                        continue
                    names += [e["path"] for e in listing
                              if e["type"] == "file"]
            out = await asyncio.gather(
                *(self._get(session, owner_repo, p) for p in names))
            return list(out)

    async def _ls(self, session, owner_repo: str, path: str) -> list:
        url = f"{self.API}/repos/{owner_repo}/contents/{path}"
        async with session.get(url) as r:
            if r.status != 200:
                raise ValueError(f"github list {path}: HTTP {r.status}")
            return await r.json()

    async def _get(self, session, owner_repo: str, path: str) -> dict:
        url = f"{self.API}/repos/{owner_repo}/contents/{path}"
        async with session.get(url) as r:
            if r.status != 200:
                raise ValueError(f"github get {path}: HTTP {r.status}")
            data = await r.json()
            content = base64.b64decode(data.get("content", "")).decode(
                "utf-8", errors="replace")
            return {"file_path": path, "content": content}


def pick_source(project: dict) -> FileSource:
    if project["repo_url"].startswith("file://"):
        return LocalDirSource()
    return GitHubSource()


def _derive_meta(project_type: str, path: str) -> dict:
    """benchmark_type/file_name derivation (file_manager.py:124-160)."""
    parts = path.split("/")
    if project_type == "engine":
        return {"benchmark_type": "engine", "file_name": parts[-1]}
    return {"benchmark_type": parts[0] if len(parts) > 1 else "",
            "file_name": parts[-1]}


class ManagerService(ServiceApp):
    name = "manager"

    def __init__(self, store=None, snapshot_path: Optional[str] = None):
        super().__init__(store or connect_store(
            db_name="manage_db", snapshot_path=snapshot_path))

    def routes(self):
        return [
            web.post("/projects", self.create_project),
            web.get("/projects", self.list_projects),
            web.get("/projects/{pid}", self.get_project),
            web.delete("/projects/{pid}", self.delete_project),
            web.post("/projects/{pid}/sync", self.sync_project),
            web.post("/projects/sync-all", self.sync_all),
            web.get("/projects/{pid}/files", self.list_files),
            web.get("/projects/{pid}/files/{fid}", self.get_file),
            web.put("/projects/{pid}/files/{fid}", self.modify_file),
            web.delete("/projects/{pid}/files/{fid}", self.reset_file),
            web.post("/projects/{pid}/reset", self.reset_project),
        ]

    # ----------------------------------------------------------- projects

    async def create_project(self, request):
        body = await request.json()
        for f in ("name", "repo_url", "project_type"):
            if f not in body:
                raise KeyError(f)
        if body["project_type"] not in ("benchmark", "engine", "vllm"):
            raise ValueError("project_type must be benchmark|engine|vllm")
        if body["project_type"] == "vllm":  # reference-compatible alias
            body["project_type"] = "engine"
        project = {
            "project_id": uuid.uuid4().hex[:12],
            "name": body["name"],
            "repo_url": body["repo_url"],
            "project_type": body["project_type"],
            "github_token": body.get("github_token"),
            "config_folder": body.get("config_folder", "config"),
            "job_folder": body.get("job_folder", "job"),
            "created_at": time.time(),
            "last_sync": None,
        }
        await self.store["projects"].insert_one(project)
        project.pop("_id", None)
        return json_response({**project, "github_token": None}, status=201)

    async def list_projects(self, request):
        docs = await self.store["projects"].find({}, sort=[("created_at", 1)])
        for d in docs:
            d.pop("_id", None)
            d["github_token"] = None
        return json_response({"projects": docs})

    async def _project(self, pid: str) -> dict:
        doc = await self.store["projects"].find_one({"project_id": pid})
        if doc is None:
            raise web.HTTPNotFound(text=f"project {pid} not found")
        return doc

    async def get_project(self, request):
        doc = await self._project(request.match_info["pid"])
        doc.pop("_id", None)
        stats = {
            "num_files": await self.store["files"].count_documents(
                {"project_id": doc["project_id"]}),
            "num_modified": await self.store["modified_files"].count_documents(
                {"project_id": doc["project_id"]}),
        }
        return json_response({**doc, "stats": stats})

    async def delete_project(self, request):
        pid = request.match_info["pid"]
        await self._project(pid)
        await self.store["projects"].delete_one({"project_id": pid})
        await self.store["files"].delete_many({"project_id": pid})
        await self.store["modified_files"].delete_many({"project_id": pid})
        return json_response({"status": "deleted", "project_id": pid})

    # --------------------------------------------------------------- sync

    async def _sync(self, project: dict) -> dict:
        source = pick_source(project)
        fetched = await source.fetch_files(project)
        pid = project["project_id"]
        files = self.store["files"]
        seen_paths = set()
        created = updated = 0
        for item in fetched:
            seen_paths.add(item["file_path"])
            existing = await files.find_one(
                {"project_id": pid, "file_path": item["file_path"]})
            meta = _derive_meta(project["project_type"], item["file_path"])
            if existing is None:
                await files.insert_one({
                    "file_id": uuid.uuid4().hex[:12], "project_id": pid,
                    "file_path": item["file_path"],
                    "content": item["content"], **meta,
                    "synced_at": time.time()})
                created += 1
            elif existing["content"] != item["content"]:
                await files.update_one(
                    {"project_id": pid, "file_path": item["file_path"]},
                    {"$set": {"content": item["content"],
                              "synced_at": time.time()}})
                updated += 1
        stale = await files.find({"project_id": pid})
        deleted = 0
        for doc in stale:
            if doc["file_path"] not in seen_paths:
                await files.delete_one({"file_id": doc["file_id"]})
                deleted += 1
        await self.store["projects"].update_one(
            {"project_id": pid}, {"$set": {"last_sync": time.time()}})
        return {"project_id": pid, "created": created, "updated": updated,
                "deleted": deleted, "total": len(fetched)}

    async def sync_project(self, request):
        project = await self._project(request.match_info["pid"])
        return json_response(await self._sync(project))

    async def sync_all(self, request):
        projects = await self.store["projects"].find({})
        results = await asyncio.gather(
            *(self._sync(p) for p in projects), return_exceptions=True)
        out = []
        for p, r in zip(projects, results):
            if isinstance(r, Exception):
                out.append({"project_id": p["project_id"], "error": str(r)})
            else:
                out.append(r)
        return json_response({"synced": out})

    # -------------------------------------------------------------- files

    async def list_files(self, request):
        pid = request.match_info["pid"]
        await self._project(pid)
        originals = await self.store["files"].find({"project_id": pid})
        mods = {m["file_id"]: m for m in await self.store[
            "modified_files"].find({"project_id": pid})}
        out = []
        for f in originals:
            f.pop("_id", None)
            m = mods.get(f["file_id"])
            f["modified"] = m is not None
            if m is not None:
                f["content"] = m["content"]
            if request.query.get("include_content") != "true":
                f.pop("content", None)
            out.append(f)
        return json_response({"files": out})

    async def _file(self, pid: str, fid: str) -> dict:
        doc = await self.store["files"].find_one(
            {"project_id": pid, "file_id": fid})
        if doc is None:
            raise web.HTTPNotFound(text=f"file {fid} not found")
        return doc

    async def get_file(self, request):
        pid, fid = request.match_info["pid"], request.match_info["fid"]
        doc = await self._file(pid, fid)
        doc.pop("_id", None)
        mod = await self.store["modified_files"].find_one(
            {"project_id": pid, "file_id": fid})
        if mod is not None:
            doc["content"] = mod["content"]
            doc["modified"] = True
            doc["modified_at"] = mod.get("modified_at")
        else:
            doc["modified"] = False
        return json_response(doc)

    async def modify_file(self, request):
        pid, fid = request.match_info["pid"], request.match_info["fid"]
        await self._file(pid, fid)
        body = await request.json()
        content = body["content"]
        await self.store["modified_files"].update_one(
            {"project_id": pid, "file_id": fid},
            {"$set": {"content": content, "modified_at": time.time()}},
            upsert=True)
        return json_response({"status": "modified", "file_id": fid})

    async def reset_file(self, request):
        pid, fid = request.match_info["pid"], request.match_info["fid"]
        r = await self.store["modified_files"].delete_one(
            {"project_id": pid, "file_id": fid})
        return json_response({"status": "reset", "file_id": fid,
                              "had_modification": r.deleted_count > 0})

    async def reset_project(self, request):
        pid = request.match_info["pid"]
        await self._project(pid)
        r = await self.store["modified_files"].delete_many(
            {"project_id": pid})
        return json_response({"status": "reset", "project_id": pid,
                              "reset_count": r.deleted_count})


main = make_cli(ManagerService, default_port=8001)

if __name__ == "__main__":
    main()
