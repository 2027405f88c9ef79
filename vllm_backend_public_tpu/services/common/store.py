"""Async document store with a MongoDB-shaped API.

The reference keeps all control-plane state in a 3-node MongoDB replica set
accessed through Motor (reference: mongodb/mongo-cluster.yaml;
benchmark-*/database.py). This module provides the same collection API with
two backends:

- InMemoryStore: dict-backed, optional JSON snapshot persistence — the
  default in this image (motor isn't installed, no cluster to talk to) and
  for tests.
- MotorStore: thin adapter over motor when MONGO_URL is set and motor is
  importable, so production deployments can keep using a real replica set.

Supported filter operators: equality, $in, $ne, $lt, $lte, $gt, $gte,
$exists, $regex. Updates: $set, $inc, $push, $unset, plus whole-document
replacement. That covers every query the six services issue.
"""

from __future__ import annotations

import asyncio
import copy
import json
import os
import re
import time
from typing import Any, Dict, List, Optional


def _match(doc: dict, flt: dict) -> bool:
    for key, cond in flt.items():
        val = doc.get(key)
        if isinstance(cond, dict) and any(k.startswith("$") for k in cond):
            for op, arg in cond.items():
                if op == "$in":
                    if val not in arg:
                        return False
                elif op == "$ne":
                    if val == arg:
                        return False
                elif op == "$lt":
                    if not (val is not None and val < arg):
                        return False
                elif op == "$lte":
                    if not (val is not None and val <= arg):
                        return False
                elif op == "$gt":
                    if not (val is not None and val > arg):
                        return False
                elif op == "$gte":
                    if not (val is not None and val >= arg):
                        return False
                elif op == "$exists":
                    if (key in doc) != bool(arg):
                        return False
                elif op == "$regex":
                    if not (isinstance(val, str) and re.search(arg, val)):
                        return False
                else:
                    raise ValueError(f"unsupported operator {op}")
        else:
            if val != cond:
                return False
    return True


def _apply_update(doc: dict, update: dict) -> dict:
    if not any(k.startswith("$") for k in update):
        new = dict(update)
        if "_id" in doc:
            new.setdefault("_id", doc["_id"])
        return new
    for op, fields in update.items():
        if op == "$set":
            doc.update(fields)
        elif op == "$inc":
            for k, v in fields.items():
                doc[k] = doc.get(k, 0) + v
        elif op == "$push":
            for k, v in fields.items():
                doc.setdefault(k, []).append(v)
        elif op == "$unset":
            for k in fields:
                doc.pop(k, None)
        else:
            raise ValueError(f"unsupported update op {op}")
    return doc


class InMemoryCollection:
    def __init__(self, name: str, store: "InMemoryStore"):
        self.name = name
        self._store = store
        self._docs: Dict[str, dict] = {}
        self._next_id = 0

    # -- mongo-shaped API -------------------------------------------------

    async def insert_one(self, doc: dict) -> Any:
        doc = copy.deepcopy(doc)
        _id = doc.get("_id")
        if _id is None:
            self._next_id += 1
            _id = f"{self.name}-{self._next_id}"
            doc["_id"] = _id
        self._docs[str(_id)] = doc
        self._store._dirty()
        return type("R", (), {"inserted_id": _id})()

    async def find_one(self, flt: Optional[dict] = None,
                       sort: Optional[list] = None) -> Optional[dict]:
        res = await self.find(flt, sort=sort, limit=1)
        return res[0] if res else None

    async def find(self, flt: Optional[dict] = None, *,
                   sort: Optional[list] = None, limit: int = 0,
                   skip: int = 0) -> List[dict]:
        docs = [copy.deepcopy(d) for d in self._docs.values()
                if _match(d, flt or {})]
        if sort:
            for key, direction in reversed(sort):
                docs.sort(key=lambda d: (d.get(key) is None, d.get(key)),
                          reverse=(direction < 0))
        if skip:
            docs = docs[skip:]
        if limit:
            docs = docs[:limit]
        return docs

    async def update_one(self, flt: dict, update: dict,
                         upsert: bool = False):
        for _id, doc in self._docs.items():
            if _match(doc, flt):
                self._docs[_id] = _apply_update(copy.deepcopy(doc), update)
                self._store._dirty()
                return type("R", (), {"matched_count": 1,
                                      "modified_count": 1,
                                      "upserted_id": None})()
        if upsert:
            base = {k: v for k, v in flt.items()
                    if not (isinstance(v, dict))}
            doc = _apply_update(base, update)
            r = await self.insert_one(doc)
            return type("R", (), {"matched_count": 0, "modified_count": 0,
                                  "upserted_id": r.inserted_id})()
        return type("R", (), {"matched_count": 0, "modified_count": 0,
                              "upserted_id": None})()

    async def update_many(self, flt: dict, update: dict):
        n = 0
        for _id, doc in list(self._docs.items()):
            if _match(doc, flt):
                self._docs[_id] = _apply_update(copy.deepcopy(doc), update)
                n += 1
        if n:
            self._store._dirty()
        return type("R", (), {"matched_count": n, "modified_count": n})()

    async def delete_one(self, flt: dict):
        for _id, doc in list(self._docs.items()):
            if _match(doc, flt):
                del self._docs[_id]
                self._store._dirty()
                return type("R", (), {"deleted_count": 1})()
        return type("R", (), {"deleted_count": 0})()

    async def delete_many(self, flt: dict):
        n = 0
        for _id, doc in list(self._docs.items()):
            if _match(doc, flt):
                del self._docs[_id]
                n += 1
        if n:
            self._store._dirty()
        return type("R", (), {"deleted_count": n})()

    async def count_documents(self, flt: Optional[dict] = None) -> int:
        return len([1 for d in self._docs.values() if _match(d, flt or {})])

    async def distinct(self, key: str, flt: Optional[dict] = None) -> list:
        vals = []
        for d in self._docs.values():
            if _match(d, flt or {}) and d.get(key) not in vals:
                vals.append(d.get(key))
        return vals

    async def create_index(self, *a, **kw):
        return None


class InMemoryStore:
    """Database of collections; optional JSON snapshot persistence
    (control-plane state survives service restarts, mirroring the
    reference's reload-from-Mongo pattern, e.g. vllm_manager.py:61-76)."""

    def __init__(self, path: Optional[str] = None):
        self._collections: Dict[str, InMemoryCollection] = {}
        self._path = path
        self._save_task: Optional[asyncio.Task] = None
        if path and os.path.exists(path):
            self._load(path)

    def __getitem__(self, name: str) -> InMemoryCollection:
        if name not in self._collections:
            self._collections[name] = InMemoryCollection(name, self)
        return self._collections[name]

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]

    async def ping(self) -> bool:
        return True

    def _dirty(self):
        if self._path:
            self._save()

    def _save(self):
        data = {name: list(c._docs.values())
                for name, c in self._collections.items()}
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, default=str)
        os.replace(tmp, self._path)

    def _load(self, path: str):
        with open(path) as f:
            data = json.load(f)
        for name, docs in data.items():
            coll = self[name]
            for d in docs:
                coll._docs[str(d.get("_id"))] = d
                coll._next_id = len(coll._docs)


class MotorCollection:
    """Adapts a motor collection to the InMemoryCollection call shape.

    The services call `await store[c].find(flt, sort=..., limit=...)` and
    expect a list; motor's `find()` returns a cursor synchronously with
    chained `.sort()/.skip()/.limit()` and `await .to_list()`. Everything
    else (insert/update/delete/count/distinct/create_index) is coroutine-
    compatible and passes straight through.
    """

    def __init__(self, coll):
        self._coll = coll

    async def find(self, flt: Optional[dict] = None, *,
                   sort: Optional[list] = None, limit: int = 0,
                   skip: int = 0) -> List[dict]:
        cur = self._coll.find(flt or {})
        if sort:
            cur = cur.sort(sort)
        if skip:
            cur = cur.skip(skip)
        if limit:
            cur = cur.limit(limit)
        return await cur.to_list(length=None)

    async def find_one(self, flt: Optional[dict] = None,
                       sort: Optional[list] = None) -> Optional[dict]:
        res = await self.find(flt, sort=sort, limit=1)
        return res[0] if res else None

    def __getattr__(self, name: str):
        # insert_one, update_one/many, delete_one/many, count_documents,
        # distinct, create_index: motor's signatures already match
        return getattr(self._coll, name)


class MotorStore:
    """Database of MotorCollection adapters over one motor database.

    Reads prefer secondaries like the reference
    (benchmark-deployer/database.py:28 SECONDARY_PREFERRED against the
    3-replica rs0 set, mongodb/mongo-cluster.yaml)."""

    def __init__(self, client, db_name: str):
        self._client = client
        self._db = client[db_name]

    def __getitem__(self, name: str) -> MotorCollection:
        return MotorCollection(self._db[name])

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        return self[name]

    async def ping(self) -> bool:
        try:
            await self._client.admin.command("ping")
            return True
        except Exception:
            return False


def connect_store(mongo_url: Optional[str] = None,
                  db_name: str = "db",
                  snapshot_path: Optional[str] = None):
    """Return a store: Motor if configured and importable, else in-memory."""
    mongo_url = mongo_url or os.environ.get("MONGO_URL")
    if mongo_url:
        try:
            import motor.motor_asyncio as motor_asyncio
        except ImportError:
            pass
        else:
            pref = _secondary_preferred()
            kwargs = {"read_preference": pref} if pref is not None else {}
            client = motor_asyncio.AsyncIOMotorClient(mongo_url, **kwargs)
            return MotorStore(client, db_name)
    return InMemoryStore(path=snapshot_path)


def _secondary_preferred():
    try:
        from pymongo import ReadPreference

        return ReadPreference.SECONDARY_PREFERRED
    except ImportError:  # fake motor in tests has no pymongo
        return None
