"""Results service — benchmark result store (port 8000).

Reimplements the reference's benchmark-results service surface
(reference: benchmark-results/main.py, results_manager.py): raw and
standardized result collections with composite-pk upsert
("{timestamp}-{benchmark_name}-{run_id}", results_manager.py:22,58) and
JSON-string auto-parsing (results_manager.py:26-30). The reference ships a
syntax error in its database.py (SURVEY.md §2.6); this is a from-scratch
implementation, not a copy.
"""

from __future__ import annotations

import json
import time
from typing import Optional

from aiohttp import web

from ..common.app import ServiceApp, error_response, json_response, make_cli
from ..common.store import connect_store


class ResultsService(ServiceApp):
    name = "results"

    def __init__(self, store=None, snapshot_path: Optional[str] = None):
        super().__init__(store or connect_store(
            db_name="result_db", snapshot_path=snapshot_path))

    def routes(self):
        return [
            web.post("/raw_input", self.post_raw),
            web.get("/raw_input", self.list_raw),
            web.get("/raw_input/{pk}", self.get_raw),
            web.post("/standardized_output", self.post_std),
            web.get("/standardized_output", self.list_std),
            web.get("/standardized_output/{pk}", self.get_std),
        ]

    # -------------------------------------------------------------- core

    @staticmethod
    def _pk(payload: dict) -> str:
        return (f"{payload['timestamp']}-{payload['benchmark_name']}-"
                f"{payload['run_id']}")

    @staticmethod
    def _normalize(payload: dict) -> dict:
        required = ("run_id", "benchmark_name", "timestamp")
        for field in required:
            if field not in payload:
                raise KeyError(field)
        data = payload.get("data")
        if isinstance(data, str):
            try:
                payload["data"] = json.loads(data)
            except json.JSONDecodeError:
                pass  # keep as string
        payload.setdefault("model_id", None)
        payload.setdefault("tokenizer_id", None)
        payload.setdefault("source", None)
        payload.setdefault("received_at", time.time())
        return payload

    async def _upsert(self, collection, request: web.Request) -> web.Response:
        payload = self._normalize(await request.json())
        pk = self._pk(payload)
        payload["pk"] = pk
        await collection.update_one({"pk": pk}, {"$set": payload},
                                    upsert=True)
        return json_response({"pk": pk, "status": "stored"})

    async def _list(self, collection, request: web.Request) -> web.Response:
        flt = {}
        for key in ("run_id", "benchmark_name", "model_id", "source"):
            if key in request.query:
                flt[key] = request.query[key]
        limit = int(request.query.get("limit", 100))
        docs = await collection.find(flt, sort=[("received_at", -1)],
                                     limit=limit)
        for d in docs:
            d.pop("_id", None)
        return json_response({"results": docs, "count": len(docs)})

    async def _get(self, collection, pk: str) -> web.Response:
        doc = await collection.find_one({"pk": pk})
        if doc is None:
            return error_response(404, f"result {pk} not found")
        doc.pop("_id", None)
        return json_response(doc)

    # ----------------------------------------------------------- handlers

    async def post_raw(self, request):
        return await self._upsert(self.store["raw"], request)

    async def list_raw(self, request):
        return await self._list(self.store["raw"], request)

    async def get_raw(self, request):
        return await self._get(self.store["raw"], request.match_info["pk"])

    async def post_std(self, request):
        return await self._upsert(self.store["standardized"], request)

    async def list_std(self, request):
        return await self._list(self.store["standardized"], request)

    async def get_std(self, request):
        return await self._get(self.store["standardized"],
                               request.match_info["pk"])


main = make_cli(ResultsService, default_port=8000)

if __name__ == "__main__":
    main()
