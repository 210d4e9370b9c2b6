"""Native library build (g++ → shared objects, loaded via ctypes).

The reference's native layer is CMake-built MatterSim + vendored pybind11
(ss_baselines/savi/dialog/speaker/CMakeLists.txt); here the native pieces
have a flat C ABI so a plain g++ -shared build and ctypes suffice (no
pybind11 in this image). Libraries are built once into
avlen_tpu/native/_build/ on first use.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_THIS_DIR, "_build")

SOURCES = {
    "graph_engine": "graph_engine.cpp",
    "frame_server": "frame_server.cpp",
}


def native_lib_path(name: str) -> str:
    return os.path.join(_BUILD_DIR, f"lib{name}.so")


def build_native(name: Optional[str] = None, force: bool = False) -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    targets = [name] if name else list(SOURCES)
    for t in targets:
        src = os.path.join(_THIS_DIR, SOURCES[t])
        out = native_lib_path(t)
        if not force and os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
            continue
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
        subprocess.run(cmd, check=True, capture_output=True)


def load_library(name: str):
    import ctypes

    build_native(name)
    return ctypes.CDLL(native_lib_path(name))
