"""Build the native library (g++, no pybind11 — plain C ABI + ctypes)."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = [os.path.join(HERE, f) for f in ("ccl.cpp", "quant.cpp")]
LIB = os.path.join(HERE, "libplumekit_native.so")
# build.py itself counts as an input: flag changes must trigger a rebuild
_INPUTS = SOURCES + [os.path.abspath(__file__)]


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= max(os.path.getmtime(s)
                                         for s in _INPUTS)
    ):
        return LIB
    # unlink first so the rebuilt library gets a NEW inode — dlopen of an
    # in-place-truncated file can hand back the already-mapped old image,
    # which defeats the rebuild-and-reload fallback in __init__._load
    if os.path.exists(LIB):
        os.remove(LIB)
    # -march=native: the .so is always built on the host it runs on
    # (first-use auto-build, never shipped). NO -ffast-math: the quantizer
    # is bit-exact against the numpy codec (quant.cpp header note).
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", LIB, *SOURCES,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
