"""On-demand compilation of the native C++ library with g++.

The shared library `libemdee_native.so` bundles the canonical-labeling and
chem-I/O codepaths.  It is compiled once into the package directory the first
time a native entry point is requested; failures (no compiler, sandboxed FS)
degrade gracefully to the pure-Python implementations.
"""

from __future__ import annotations

import os
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = [_HERE / "canon.cpp", _HERE / "chemio.cpp"]
_LIB = _HERE / "libemdee_native.so"
_lock = threading.Lock()
_failed = False


def library_path() -> Path | None:
    """Return the path to the compiled library, building it if necessary."""
    global _failed
    with _lock:
        if _failed:
            return None
        sources = [s for s in _SRC if s.exists()]
        if not sources:
            _failed = True
            return None
        if _LIB.exists() and all(_LIB.stat().st_mtime >= s.stat().st_mtime for s in sources):
            return _LIB
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O2",
            "-std=c++17",
            "-shared",
            "-fPIC",
            "-o",
            str(_LIB),
        ] + [str(s) for s in sources]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            _failed = True
            return None
        return _LIB
