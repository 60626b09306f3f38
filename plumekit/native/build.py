"""Build the native library (g++, no pybind11 — plain C ABI + ctypes)."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ccl.cpp")
LIB = os.path.join(HERE, "libplumekit_native.so")


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", LIB, SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
