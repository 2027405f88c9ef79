"""Process manager: the TPU-slice deployment substrate.

The reference's L2 is the Kubernetes API — Deployments/Jobs/Services
created by typed clients (reference: benchmark-deployer/kubernetes_client.py,
benchmark-vllm/kubernetes_client.py). Retargeted to TPU slices, a
"deployment" is an engine-server process bound to a set of TPU chips on
this host (or a slice-wide multi-host launch), and a "job" is a benchmark
client process. This module is that substrate: spawn, watch, logs, stop —
with the same status vocabulary (pending/running/succeeded/failed) the
reference reads off pod phases (kubernetes_client.py:342-433).
"""

from __future__ import annotations

import asyncio
import os
import signal
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class ManagedProcess:
    name: str
    kind: str                    # "engine" | "job"
    command: List[str]
    env: Dict[str, str] = field(default_factory=dict)
    cwd: Optional[str] = None
    log_path: str = ""
    proc: Optional[asyncio.subprocess.Process] = None
    created_at: float = field(default_factory=time.time)
    finished_at: Optional[float] = None
    returncode: Optional[int] = None
    # TPU resource accounting (the analog of GPU/MIG requests,
    # reference kubernetes_client.py:349-396)
    tpu_chips: int = 0

    @property
    def status(self) -> str:
        if self.proc is None:
            return "pending"
        if self.returncode is None:
            return "running"
        return "succeeded" if self.returncode == 0 else "failed"


class ProcessManager:
    def __init__(self, log_dir: str = "/tmp/vbpt-logs",
                 total_tpu_chips: Optional[int] = None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._procs: Dict[str, ManagedProcess] = {}
        if total_tpu_chips is None:
            total_tpu_chips = int(os.environ.get("TPU_CHIPS", "1"))
        self.total_tpu_chips = total_tpu_chips

    # ---------------------------------------------------------- resources

    def tpu_chips_in_use(self) -> int:
        return sum(p.tpu_chips for p in self._procs.values()
                   if p.status == "running")

    def tpu_conflict(self, chips_needed: int) -> bool:
        return (self.tpu_chips_in_use() + chips_needed
                > self.total_tpu_chips)

    # ---------------------------------------------------------- lifecycle

    async def spawn(self, name: str, kind: str, command: List[str],
                    env: Optional[Dict[str, str]] = None,
                    cwd: Optional[str] = None,
                    tpu_chips: int = 0) -> ManagedProcess:
        if name in self._procs and self._procs[name].status == "running":
            raise ValueError(f"process {name} already running")
        mp = ManagedProcess(name=name, kind=kind, command=command,
                            env=env or {}, cwd=cwd, tpu_chips=tpu_chips,
                            log_path=os.path.join(
                                self.log_dir, f"{name}.log"))
        full_env = dict(os.environ)
        full_env.update(mp.env)
        logf = open(mp.log_path, "ab")
        mp.proc = await asyncio.create_subprocess_exec(
            *command, env=full_env, cwd=cwd,
            stdout=logf, stderr=asyncio.subprocess.STDOUT,
            start_new_session=True)
        self._procs[name] = mp
        asyncio.get_running_loop().create_task(self._reap(mp, logf))
        return mp

    async def _reap(self, mp: ManagedProcess, logf) -> None:
        mp.returncode = await mp.proc.wait()
        mp.finished_at = time.time()
        logf.close()

    async def stop(self, name: str, grace_s: float = 5.0) -> bool:
        mp = self._procs.get(name)
        if mp is None or mp.proc is None or mp.returncode is not None:
            return False
        # kill the exact process group we started — never by pattern
        try:
            os.killpg(os.getpgid(mp.proc.pid), signal.SIGTERM)
        except ProcessLookupError:
            return False
        try:
            await asyncio.wait_for(mp.proc.wait(), timeout=grace_s)
        except asyncio.TimeoutError:
            try:
                os.killpg(os.getpgid(mp.proc.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass
        return True

    def remove(self, name: str) -> bool:
        return self._procs.pop(name, None) is not None

    # ------------------------------------------------------------- status

    def get(self, name: str) -> Optional[ManagedProcess]:
        return self._procs.get(name)

    def list(self, kind: Optional[str] = None) -> List[ManagedProcess]:
        return [p for p in self._procs.values()
                if kind is None or p.kind == kind]

    def logs(self, name: str, tail: Optional[int] = None) -> str:
        mp = self._procs.get(name)
        if mp is None or not os.path.exists(mp.log_path):
            return ""
        with open(mp.log_path, "rb") as f:
            data = f.read().decode("utf-8", errors="replace")
        if tail:
            data = "\n".join(data.splitlines()[-tail:])
        return data

    def describe(self, mp: ManagedProcess) -> dict:
        return {
            "name": mp.name, "kind": mp.kind, "status": mp.status,
            "command": mp.command, "tpu_chips": mp.tpu_chips,
            "created_at": mp.created_at, "finished_at": mp.finished_at,
            "returncode": mp.returncode, "log_path": mp.log_path,
        }
