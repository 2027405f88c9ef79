"""Native library build + load (ctypes; no pybind11 in this image)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")

_lock = threading.Lock()
_cache: dict = {}


def build_and_load(name: str, sources: list[str],
                   extra_flags: Optional[list[str]] = None
                   ) -> Optional[ctypes.CDLL]:
    """Compile `sources` (paths relative to native/) into lib<name>.so and
    dlopen it. Rebuilds when any source is newer than the .so. Returns
    None if no C++ toolchain is available (callers fall back to Python)."""
    with _lock:
        if name in _cache:
            return _cache[name]
        os.makedirs(_BUILD_DIR, exist_ok=True)
        so_path = os.path.join(_BUILD_DIR, f"lib{name}.so")
        srcs = [os.path.join(_NATIVE_DIR, s) for s in sources]
        need = (not os.path.exists(so_path) or
                any(os.path.getmtime(s) > os.path.getmtime(so_path)
                    for s in srcs))
        if need:
            cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                   "-o", so_path, *srcs, *(extra_flags or [])]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired) as e:
                err = getattr(e, "stderr", b"")
                if err:
                    import logging
                    logging.getLogger(__name__).warning(
                        "native build failed: %s", err.decode()[:2000])
                _cache[name] = None
                return None
        lib = ctypes.CDLL(so_path)
        _cache[name] = lib
        return lib
