"""Shared aiohttp service scaffolding: json helpers, error middleware,
standard /health + /status endpoints, CLI runner.

Every reference service is a FastAPI app with the same shape (logging
setup, /health, lifespan-managed DB client — e.g. benchmark-results/main.py,
benchmark-vllm/main.py:20); this module is that shape once, on aiohttp.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
import traceback
from typing import Any, Callable, Optional

from aiohttp import web

logger = logging.getLogger(__name__)


def json_response(data: Any, status: int = 200) -> web.Response:
    return web.json_response(data, status=status, dumps=lambda d: json.dumps(
        d, default=str))


def error_response(status: int, message: str) -> web.Response:
    return web.json_response({"detail": message}, status=status)


@web.middleware
async def error_middleware(request: web.Request, handler):
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except json.JSONDecodeError:
        return error_response(400, "invalid JSON body")
    except KeyError as e:
        return error_response(422, f"missing field: {e}")
    except ValueError as e:
        return error_response(400, str(e))
    except Exception as e:
        logger.error("unhandled error on %s %s: %s\n%s", request.method,
                     request.path, e, traceback.format_exc())
        return error_response(500, f"internal error: {e}")


class ServiceApp:
    """Base class for the six control-plane services."""

    name = "service"

    def __init__(self, store=None):
        self.store = store
        self.start_time = time.time()
        self.background_tasks: list = []

    def routes(self) -> list:
        raise NotImplementedError

    def build_app(self) -> web.Application:
        app = web.Application(middlewares=[error_middleware])
        app.router.add_get("/health", self.health)
        app.router.add_get("/status", self.status)
        app.add_routes(self.routes())
        app.on_startup.append(self._startup)
        app.on_cleanup.append(self._cleanup)
        return app

    async def _startup(self, app):
        await self.on_startup()

    async def _cleanup(self, app):
        for t in self.background_tasks:
            t.cancel()
        await self.on_cleanup()

    async def on_startup(self):
        pass

    async def on_cleanup(self):
        pass

    def spawn(self, coro) -> asyncio.Task:
        t = asyncio.get_running_loop().create_task(coro)
        self.background_tasks.append(t)
        return t

    async def health(self, request: web.Request) -> web.Response:
        db_ok = True
        if self.store is not None:
            try:
                ping = getattr(self.store, "ping", None)
                if ping:
                    db_ok = bool(await ping())
            except Exception:
                db_ok = False
        status = "healthy" if db_ok else "degraded"
        return json_response({"status": status, "service": self.name,
                              "database": "connected" if db_ok else "down",
                              "timestamp": time.time()})

    async def status(self, request: web.Request) -> web.Response:
        return json_response({"service": self.name,
                              "uptime_s": time.time() - self.start_time})


def run_service(service: ServiceApp, host: str = "0.0.0.0",
                port: int = 8000):
    logging.basicConfig(level=logging.INFO)
    web.run_app(service.build_app(), host=host, port=port)


def make_cli(service_factory: Callable[..., ServiceApp], default_port: int):
    import argparse

    def main(argv=None):
        ap = argparse.ArgumentParser()
        ap.add_argument("--host", default="0.0.0.0")
        ap.add_argument("--port", type=int, default=default_port)
        ap.add_argument("--snapshot", default=None,
                        help="JSON snapshot path for the in-memory store")
        args = ap.parse_args(argv)
        svc = service_factory(snapshot_path=args.snapshot)
        run_service(svc, host=args.host, port=args.port)

    return main
