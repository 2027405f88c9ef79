"""Async bridge between the HTTP layer and the blocking engine step loop.

The engine's step() blocks on device execution, so it runs on a dedicated
thread; results cross back into asyncio via call_soon_threadsafe. This
replaces the reference's detached-monitoring pattern (deploy returns
immediately, status polled — reference benchmark-vllm/main.py:115-129) with
an event-driven stream per request.
"""

from __future__ import annotations

import asyncio
import logging
import queue
import threading
from dataclasses import dataclass
from typing import AsyncIterator, Dict, List, Optional, Sequence

from ..engine.engine import LLMEngine
from ..engine.outputs import RequestOutput
from ..engine.request import SamplingParams

logger = logging.getLogger(__name__)


class AsyncEngineRunner:
    def __init__(self, engine: LLMEngine):
        self.engine = engine
        self._submit_q: "queue.Queue" = queue.Queue()
        self._streams: Dict[str, asyncio.Queue] = {}
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="engine-loop")
        self._started = False

    def start(self, loop: asyncio.AbstractEventLoop) -> None:
        if not self._started:
            self._loop = loop
            self._thread.start()
            self._started = True

    def shutdown(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._started:
            self._thread.join(timeout=5)

    # ---- called from asyncio -------------------------------------------

    async def submit(self, prompt_ids: Sequence[int],
                     sampling: SamplingParams, priority: str = "medium",
                     request_id: Optional[str] = None
                     ) -> AsyncIterator[RequestOutput]:
        out_q: asyncio.Queue = asyncio.Queue()
        done = asyncio.Event()
        self._submit_q.put((list(prompt_ids), sampling, priority, request_id,
                            out_q))
        self._wake.set()
        while True:
            out = await out_q.get()
            if out is None:
                break
            yield out
            if out.finished:
                break

    def abort(self, request_id: str) -> None:
        self._submit_q.put(("abort", request_id))
        self._wake.set()

    async def score(self, prompt_ids: Sequence[int]):
        """Teacher-forced prompt logprobs (echo+logprobs), computed on the
        engine thread between steps."""
        fut = asyncio.get_running_loop().create_future()
        self._submit_q.put(("score", list(prompt_ids), fut))
        self._wake.set()
        return await fut

    def stats(self) -> dict:
        return self.engine.stats()

    # ---- engine thread --------------------------------------------------

    def _drain_submissions(self) -> None:
        while True:
            try:
                item = self._submit_q.get_nowait()
            except queue.Empty:
                return
            if item[0] == "abort":
                self.engine.abort_request(item[1])
                continue
            if item[0] == "score":
                _, ids, fut = item
                assert self._loop is not None
                try:
                    result = self.engine.score(ids)
                    self._loop.call_soon_threadsafe(fut.set_result, result)
                except Exception as e:
                    self._loop.call_soon_threadsafe(fut.set_exception, e)
                continue
            prompt_ids, sampling, priority, request_id, out_q = item
            try:
                rid = self.engine.add_request(prompt_ids, sampling, priority,
                                              request_id)
                self._streams[rid] = out_q
            except Exception as e:  # bad request (e.g. too long)
                logger.warning("rejecting request: %s", e)
                err = RequestOutput(request_id=request_id or "?",
                                    finished=True, finish_reason="abort")
                self._emit(out_q, err)

    def _emit(self, out_q: asyncio.Queue, out) -> None:
        assert self._loop is not None
        self._loop.call_soon_threadsafe(out_q.put_nowait, out)

    def _run(self) -> None:
        while not self._stop.is_set():
            self._drain_submissions()
            if not self.engine.has_unfinished():
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            try:
                outputs = self.engine.step()
            except Exception:
                logger.exception("engine step failed")
                for rid, q_ in list(self._streams.items()):
                    self._emit(q_, None)
                self._streams.clear()
                continue
            for out in outputs:
                q_ = self._streams.get(out.request_id)
                if q_ is None:
                    continue
                self._emit(q_, out)
                if out.finished:
                    del self._streams[out.request_id]
