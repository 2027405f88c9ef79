"""MotorStore adapter tests against a faithful fake `motor` module.

The image has no motor/pymongo/mongod (zero egress), so the adapter is
exercised against a fake that reproduces motor's *call shape* exactly:
`find()` returns a cursor synchronously with chained
`.sort()/.skip()/.limit()` and `await .to_list(length=...)`, while the
mutation methods are coroutines (reference data plane:
benchmark-deployer/database.py:28, mongodb/mongo-cluster.yaml). Document
matching/updating semantics reuse the in-memory store's operators — the
subject under test is the cursor-API translation layer in
services/common/store.py:MotorCollection, which round 1 shipped broken
(it returned a raw motor database whose find() is not awaitable).
"""

import asyncio
import sys
import types

import pytest

from vllm_backend_public_tpu.services.common import store as store_mod
from vllm_backend_public_tpu.services.common.store import (
    MotorStore, _apply_update, _match, connect_store)


# ------------------------------------------------------------ fake motor

class FakeCursor:
    def __init__(self, docs):
        self._docs = docs

    def sort(self, key_or_list, direction=None):
        spec = (key_or_list if isinstance(key_or_list, list)
                else [(key_or_list, direction or 1)])
        docs = list(self._docs)
        for key, d in reversed(spec):
            docs.sort(key=lambda x: (x.get(key) is None, x.get(key)),
                      reverse=(d < 0))
        return FakeCursor(docs)

    def skip(self, n):
        return FakeCursor(self._docs[n:])

    def limit(self, n):
        return FakeCursor(self._docs[:n] if n else self._docs)

    async def to_list(self, length=None):
        docs = self._docs if length is None else self._docs[:length]
        return [dict(d) for d in docs]


class FakeMotorCollection:
    def __init__(self):
        self._docs = []
        self._next = 0

    def find(self, flt=None):  # sync, returns cursor — the motor shape
        return FakeCursor([d for d in self._docs if _match(d, flt or {})])

    async def insert_one(self, doc):
        doc = dict(doc)
        if "_id" not in doc:
            self._next += 1
            doc["_id"] = f"oid-{self._next}"
        self._docs.append(doc)
        return types.SimpleNamespace(inserted_id=doc["_id"])

    async def update_one(self, flt, update, upsert=False):
        for i, d in enumerate(self._docs):
            if _match(d, flt):
                self._docs[i] = _apply_update(dict(d), update)
                return types.SimpleNamespace(matched_count=1,
                                             modified_count=1,
                                             upserted_id=None)
        if upsert:
            base = {k: v for k, v in flt.items() if not isinstance(v, dict)}
            r = await self.insert_one(_apply_update(base, update))
            return types.SimpleNamespace(matched_count=0, modified_count=0,
                                         upserted_id=r.inserted_id)
        return types.SimpleNamespace(matched_count=0, modified_count=0,
                                     upserted_id=None)

    async def delete_one(self, flt):
        for i, d in enumerate(self._docs):
            if _match(d, flt):
                del self._docs[i]
                return types.SimpleNamespace(deleted_count=1)
        return types.SimpleNamespace(deleted_count=0)

    async def delete_many(self, flt):
        keep = [d for d in self._docs if not _match(d, flt)]
        n = len(self._docs) - len(keep)
        self._docs = keep
        return types.SimpleNamespace(deleted_count=n)

    async def count_documents(self, flt=None):
        return len([1 for d in self._docs if _match(d, flt or {})])

    async def distinct(self, key, flt=None):
        out = []
        for d in self._docs:
            if _match(d, flt or {}) and d.get(key) not in out:
                out.append(d.get(key))
        return out

    async def create_index(self, *a, **kw):
        return "idx"


class FakeMotorDatabase:
    def __init__(self):
        self._colls = {}

    def __getitem__(self, name):
        return self._colls.setdefault(name, FakeMotorCollection())


class FakeAdmin:
    async def command(self, name):
        assert name == "ping"
        return {"ok": 1}


class FakeAsyncIOMotorClient:
    def __init__(self, url, **kwargs):
        self.url = url
        self.kwargs = kwargs
        self.admin = FakeAdmin()
        self._dbs = {}

    def __getitem__(self, name):
        return self._dbs.setdefault(name, FakeMotorDatabase())


@pytest.fixture()
def fake_motor(monkeypatch):
    motor = types.ModuleType("motor")
    motor_asyncio = types.ModuleType("motor.motor_asyncio")
    motor_asyncio.AsyncIOMotorClient = FakeAsyncIOMotorClient
    motor.motor_asyncio = motor_asyncio
    monkeypatch.setitem(sys.modules, "motor", motor)
    monkeypatch.setitem(sys.modules, "motor.motor_asyncio", motor_asyncio)
    yield motor_asyncio


def run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


# ----------------------------------------------------------------- tests

def test_connect_store_selects_motor(fake_motor, monkeypatch):
    monkeypatch.setenv("MONGO_URL", "mongodb://mongo-primary:27017")
    st = connect_store(db_name="result_db")
    assert isinstance(st, MotorStore)
    assert run(st.ping())


def test_connect_store_in_memory_without_url(monkeypatch):
    monkeypatch.delenv("MONGO_URL", raising=False)
    st = connect_store(db_name="x")
    assert not isinstance(st, MotorStore)


def test_motor_find_sort_limit_skip(fake_motor):
    st = MotorStore(FakeAsyncIOMotorClient("mongodb://x"), "db")

    async def go():
        c = st["queue"]
        for i, pr in enumerate(["low", "high", "medium"]):
            await c.insert_one({"n": i, "priority": pr})
        # the exact call shape every service issues: kwargs, list result
        docs = await c.find({}, sort=[("n", -1)])
        assert [d["n"] for d in docs] == [2, 1, 0]
        docs = await c.find({}, sort=[("n", 1)], limit=2, skip=1)
        assert [d["n"] for d in docs] == [1, 2]
        docs = await c.find({"priority": {"$in": ["high", "urgent"]}})
        assert len(docs) == 1 and docs[0]["n"] == 1
        one = await c.find_one({}, sort=[("n", -1)])
        assert one["n"] == 2
        assert await c.find_one({"n": 99}) is None

    run(go())


def test_motor_upsert_delete_count_distinct(fake_motor):
    st = MotorStore(FakeAsyncIOMotorClient("mongodb://x"), "db")

    async def go():
        c = st.deployments  # attribute access like the services use
        r = await c.update_one({"name": "d1"}, {"$set": {"status": "ready"}},
                               upsert=True)
        assert r.upserted_id is not None
        r = await c.update_one({"name": "d1"},
                               {"$set": {"status": "failed"}}, upsert=True)
        assert r.matched_count == 1
        assert (await c.find_one({"name": "d1"}))["status"] == "failed"
        await c.insert_one({"name": "d2", "status": "ready"})
        assert await c.count_documents({}) == 2
        assert sorted(await c.distinct("status")) == ["failed", "ready"]
        assert (await c.delete_one({"name": "d2"})).deleted_count == 1
        assert (await c.delete_many({})).deleted_count == 1
        await c.create_index("name", unique=True)

    run(go())


def test_results_service_against_motor(fake_motor, monkeypatch):
    """One full service runs end-to-end over the Motor path (the round-1
    failure mode: every service broke the moment MONGO_URL was set)."""
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_backend_public_tpu.services.results.service import \
        ResultsService

    monkeypatch.setenv("MONGO_URL", "mongodb://mongo-primary:27017")
    svc = ResultsService()
    assert isinstance(svc.store, MotorStore)

    async def go():
        async with TestClient(TestServer(svc.build_app())) as c:
            payload = {"run_id": "r1", "benchmark_name": "mmlu",
                       "timestamp": "t0", "data": '{"accuracy": 0.9}'}
            r = await c.post("/raw_input", json=payload)
            assert r.status == 200
            pk = (await r.json())["pk"]
            payload["data"] = '{"accuracy": 0.95}'
            await c.post("/raw_input", json=payload)  # upsert, same pk
            r = await c.get(f"/raw_input/{pk}")
            assert (await r.json())["data"] == {"accuracy": 0.95}
            r = await c.get("/raw_input")
            assert (await r.json())["count"] == 1
            r = await c.get("/health")
            assert r.status == 200

    run(go())
