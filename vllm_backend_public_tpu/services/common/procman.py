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
    # re-adoption across manager restarts (the reference's pods keep
    # running when the service restarts and are rehydrated from Mongo,
    # reference vllm_manager.py:61-76): pid survives in the state file,
    # adopted processes are watched by liveness poll instead of wait()
    pid: Optional[int] = None
    adopted: bool = False

    @property
    def status(self) -> str:
        if self.proc is None and not self.adopted:
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
        self._state_path = os.path.join(log_dir, "procman-state.json")

    # ------------------------------------------------------- re-adoption

    def _save_state(self) -> None:
        import json
        state = [{
            "name": p.name, "kind": p.kind, "command": p.command,
            "log_path": p.log_path, "tpu_chips": p.tpu_chips,
            "created_at": p.created_at,
            "pid": p.pid if p.returncode is None else None,
        } for p in self._procs.values() if p.returncode is None]
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path)

    @staticmethod
    def _pid_matches(pid: int, command: List[str]) -> bool:
        """Alive AND still the process we spawned (pid-reuse guard)."""
        try:
            os.kill(pid, 0)
        except (ProcessLookupError, PermissionError):
            return False
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                argv = [a for a in f.read().split(b"\0") if a]
            if not argv:
                # mid-exec: cmdline is transiently empty right after
                # fork — refusing here makes adoption flaky under load.
                # But kernel threads ALWAYS read empty (they'd be
                # adopted forever if the PID got reused) and zombies
                # stay empty until reaped, so rule those out first via
                # /proc/pid/stat: field after the comm ")" is the state
                # ('Z' = zombie); the next is ppid (kernel threads
                # parent to kthreadd, pid 2).
                try:
                    with open(f"/proc/{pid}/stat") as sf:
                        rest = sf.read().rsplit(")", 1)[1].split()
                    if rest[0] == "Z" or int(rest[1]) == 2 or pid == 2:
                        return False
                except (OSError, IndexError, ValueError):
                    pass
                return True
            return any(a.decode("utf-8", "replace") in command
                       for a in argv)
        except OSError:
            return True  # alive but unreadable: assume ours

    async def readopt(self) -> List[str]:
        """Re-adopt engine/job processes spawned by a previous manager
        instance (the reference's reload-deployments-from-Mongo pattern,
        vllm_manager.py:61-76 — here the pods are local processes that
        survive a service restart). Returns adopted names."""
        import json
        if not os.path.exists(self._state_path):
            return []
        try:
            with open(self._state_path) as f:
                state = json.load(f)
        except (OSError, ValueError):
            return []
        adopted = []
        for rec in state:
            name, pid = rec.get("name"), rec.get("pid")
            if not name or name in self._procs or not pid:
                continue
            if not self._pid_matches(pid, rec.get("command", [])):
                continue
            mp = ManagedProcess(
                name=name, kind=rec.get("kind", "engine"),
                command=rec.get("command", []),
                log_path=rec.get("log_path", ""),
                tpu_chips=int(rec.get("tpu_chips", 0)),
                created_at=rec.get("created_at", time.time()),
                pid=pid, adopted=True)
            self._procs[name] = mp
            asyncio.get_running_loop().create_task(self._watch_adopted(mp))
            adopted.append(name)
        self._save_state()
        return adopted

    async def _watch_adopted(self, mp: ManagedProcess,
                             poll_s: float = 2.0) -> None:
        """A re-adopted process isn't our child, so poll liveness
        instead of wait()."""
        while mp.returncode is None:
            try:
                os.kill(mp.pid, 0)
            except (ProcessLookupError, PermissionError):
                mp.returncode = -1  # exit status unknowable for non-child
                mp.finished_at = time.time()
                self._save_state()
                return
            await asyncio.sleep(poll_s)

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
        mp.pid = mp.proc.pid
        self._procs[name] = mp
        self._save_state()
        asyncio.get_running_loop().create_task(self._reap(mp, logf))
        return mp

    async def _reap(self, mp: ManagedProcess, logf) -> None:
        mp.returncode = await mp.proc.wait()
        mp.finished_at = time.time()
        logf.close()
        self._save_state()

    async def stop(self, name: str, grace_s: float = 5.0) -> bool:
        mp = self._procs.get(name)
        if mp is None or mp.returncode is not None or mp.pid is None:
            return False
        # kill the exact process group we started — never by pattern
        try:
            os.killpg(os.getpgid(mp.pid), signal.SIGTERM)
        except ProcessLookupError:
            return False
        if mp.proc is not None:
            try:
                await asyncio.wait_for(mp.proc.wait(), timeout=grace_s)
            except asyncio.TimeoutError:
                try:
                    os.killpg(os.getpgid(mp.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass
        else:
            # adopted (non-child): poll until the liveness watcher or a
            # hard kill settles it
            for _ in range(int(grace_s / 0.2)):
                try:
                    os.kill(mp.pid, 0)
                except (ProcessLookupError, PermissionError):
                    break
                await asyncio.sleep(0.2)
            else:
                try:
                    os.killpg(os.getpgid(mp.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass
            if mp.returncode is None:
                mp.returncode = -1
                mp.finished_at = time.time()
        self._save_state()
        return True

    def remove(self, name: str) -> bool:
        removed = self._procs.pop(name, None) is not None
        if removed:
            self._save_state()
        return removed

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
            "pid": mp.pid, "adopted": mp.adopted,
        }
