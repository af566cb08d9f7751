"""On-demand g++ build of the native runtime pieces.

The .so is built once per source hash and cached; the Python layer
falls back to pure-numpy paths if no compiler is available.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_CACHE_DIR = os.environ.get(
    "GRAPH_TPU_NATIVE_CACHE", os.path.expanduser("~/.cache/graph_tpu")
)
_LOCK = threading.Lock()


def build_library(source_name: str) -> str:
    """Compile native/<source_name> to a cached shared library; returns path.

    Raises on compiler failure (callers catch and fall back).
    """
    src = os.path.join(_NATIVE_DIR, source_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    base = source_name.rsplit(".", 1)[0]
    out = os.path.join(_CACHE_DIR, f"{base}-{digest}.so")
    if os.path.exists(out):
        return out
    with _LOCK:
        if os.path.exists(out):
            return out
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = out + f".tmp{os.getpid()}"
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", "-pthread", src, "-o", tmp,
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, out)
    return out
