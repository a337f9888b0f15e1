"""Thread-safe on-demand builder for the native engine's shared objects.

First use auto-compiles the .so with g++.  Preprocessing runs thread pools
(8 IO threads per speaker; 8 analysis threads per WORLD speaker), so on a
fresh checkout many threads can race into the first build: the compile goes
to a unique temp path and lands with an atomic os.replace, serialized by a
process-wide lock, so concurrent callers either wait for the build or load
the completed file — never a half-written one.
"""

from __future__ import annotations

import os
import subprocess
import threading

_LOCK = threading.Lock()


def load_or_build(src_path: str, so_path: str):
    """ctypes.CDLL for so_path, compiling it from src_path on first use;
    None when the toolchain or load fails (callers fall back to the JAX
    path).  Shared by the three engine binding modules."""
    import ctypes

    if _stale(src_path, so_path) and not build_so(src_path, so_path):
        return None
    try:
        return ctypes.CDLL(so_path)
    except OSError:
        return None


def _stale(src_path: str, so_path: str) -> bool:
    """True when the .so is missing or older than its source or the shared
    header (a stale binary after a source update would load with a
    mismatched ABI)."""
    header = os.path.join(os.path.dirname(src_path), "dvc_common.h")
    try:
        newest_src = max(os.path.getmtime(p) for p in (src_path, header)
                         if os.path.exists(p))
        return os.path.getmtime(so_path) < newest_src
    except (OSError, ValueError):
        return True


def build_so(src_path: str, so_path: str, timeout: int = 240) -> bool:
    """Compile src -> so (atomic); returns True when so_path exists and is
    up to date with its source."""
    with _LOCK:
        if not _stale(src_path, so_path):
            return True
        tmp = f"{so_path}.tmp.{os.getpid()}.{threading.get_ident()}"
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                 "-std=c++17", "-pthread", "-o", tmp, src_path],
                check=True, capture_output=True, timeout=timeout)
            os.replace(tmp, so_path)
            return True
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return False
