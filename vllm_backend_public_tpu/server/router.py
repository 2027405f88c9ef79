"""Data-parallel request router: N engine replicas behind one endpoint.

The reference gets data parallelism for free from K8s — `replicaCount`
vLLM pods behind a Service (reference:
benchmark-vllm/vllm_manager.py:370). TPU-natively, DP replicas are
separate engine processes (each owns its chips; in-program DP would
shard the KV pool and block tables across chips for no serving benefit),
so the Service's job — spreading requests — needs an in-repo front door.

This router is that front door:
- least-outstanding-requests routing (better than round-robin when
  requests have wildly different decode lengths);
- health-checked replicas: a replica that fails /health (or errors
  mid-proxy) is taken out of rotation and re-admitted when it recovers
  (the reference's readiness-probe behavior, vllm_templates.py:182-201);
- streaming passthrough for /v1/completions SSE responses;
- /health reports aggregate + per-replica state so the engine-manager's
  readiness poll works unchanged against a DP deployment.

Run directly (`python -m vllm_backend_public_tpu.server.router
--replicas URL1,URL2`) or via `python -m vllm_backend_public_tpu.server
--dp-replicas N`, which spawns N single-replica servers and this router
in front.
"""

from __future__ import annotations

import argparse
import asyncio
import logging
from typing import List, Optional

from aiohttp import ClientSession, ClientTimeout, web

logger = logging.getLogger(__name__)

HOP_HEADERS = {"host", "content-length", "transfer-encoding", "connection"}


class Replica:
    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self.healthy = False
        self.inflight = 0
        self.consecutive_failures = 0

    def to_dict(self) -> dict:
        return {"url": self.url, "healthy": self.healthy,
                "inflight": self.inflight}


class DPRouter:
    def __init__(self, urls: List[str], health_interval: float = 2.0,
                 fail_threshold: int = 3):
        self.replicas = [Replica(u) for u in urls]
        self.health_interval = health_interval
        self.fail_threshold = fail_threshold
        self._session: Optional[ClientSession] = None
        self._health_task: Optional[asyncio.Task] = None
        self._rr = 0

    # ------------------------------------------------------------ routing

    def pick(self) -> Optional[Replica]:
        """Least outstanding requests among healthy replicas; round-robin
        among ties (otherwise sequential traffic starves all but the
        first replica)."""
        healthy = [r for r in self.replicas if r.healthy]
        if not healthy:
            return None
        lo = min(r.inflight for r in healthy)
        cands = [r for r in healthy if r.inflight == lo]
        self._rr += 1
        return cands[self._rr % len(cands)]

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        rep = self.pick()
        if rep is None:
            return web.json_response(
                {"error": "no healthy replicas"}, status=503)
        body = await request.read()
        headers = {k: v for k, v in request.headers.items()
                   if k.lower() not in HOP_HEADERS}
        rep.inflight += 1
        try:
            async with self._session.request(
                    request.method, rep.url + str(request.rel_url),
                    data=body or None, headers=headers) as upstream:
                resp = web.StreamResponse(status=upstream.status)
                for k, v in upstream.headers.items():
                    if k.lower() not in HOP_HEADERS:
                        resp.headers[k] = v
                await resp.prepare(request)
                async for chunk in upstream.content.iter_any():
                    await resp.write(chunk)
                await resp.write_eof()
                rep.consecutive_failures = 0
                return resp
        except Exception as exc:  # connection-level failure
            rep.consecutive_failures += 1
            if rep.consecutive_failures >= self.fail_threshold:
                rep.healthy = False
            logger.warning("proxy to %s failed: %s", rep.url, exc)
            return web.json_response(
                {"error": f"upstream failed: {exc}"}, status=502)
        finally:
            rep.inflight -= 1

    # ------------------------------------------------------------- health

    async def _check_one(self, rep: Replica) -> None:
        try:
            async with self._session.get(
                    rep.url + "/health",
                    timeout=ClientTimeout(total=5)) as r:
                ok = r.status == 200
        except Exception:
            ok = False
        if ok:
            if not rep.healthy:
                logger.info("replica %s is healthy", rep.url)
            rep.healthy = True
            rep.consecutive_failures = 0
        else:
            rep.consecutive_failures += 1
            if rep.consecutive_failures >= self.fail_threshold:
                rep.healthy = False

    async def _health_loop(self) -> None:
        while True:
            await asyncio.gather(*(self._check_one(r)
                                   for r in self.replicas))
            await asyncio.sleep(self.health_interval)

    async def health(self, request: web.Request) -> web.Response:
        n = sum(r.healthy for r in self.replicas)
        return web.json_response(
            {"status": "healthy" if n else "unhealthy",
             "replicas": [r.to_dict() for r in self.replicas]},
            status=200 if n else 503)

    # -------------------------------------------------------------- app

    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/health", self.health)
        app.router.add_route("*", "/{tail:.*}", self.proxy)

        async def on_startup(app):
            self._session = ClientSession(
                timeout=ClientTimeout(total=None, sock_connect=10))
            # one synchronous sweep so the first request after startup
            # can route immediately
            await asyncio.gather(*(self._check_one(r)
                                   for r in self.replicas))
            self._health_task = asyncio.ensure_future(self._health_loop())

        async def on_cleanup(app):
            if self._health_task:
                self._health_task.cancel()
            if self._session:
                await self._session.close()

        app.on_startup.append(on_startup)
        app.on_cleanup.append(on_cleanup)
        return app


def main(argv=None):
    ap = argparse.ArgumentParser("dp request router")
    ap.add_argument("--replicas", required=True,
                    help="comma-separated replica base URLs")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--health-interval", type=float, default=2.0)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    router = DPRouter(args.replicas.split(","),
                      health_interval=args.health_interval)
    web.run_app(router.build_app(), host=args.host, port=args.port)


if __name__ == "__main__":
    main()
