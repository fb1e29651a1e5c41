"""Build the native WAV decoder shared library (g++, no external deps).

Invoked lazily by wavloader on first use (or explicitly:
``python -m anuraxla.native.build``). The .so is cached next to the sources
and rebuilt when wavio.cpp is newer.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

SRC = Path(__file__).parent / "wavio.cpp"
LIB = Path(__file__).parent / "libavldwav.so"


def build(force: bool = False, quiet: bool = True) -> Path:
    if not force and LIB.exists() and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-Wall", "-Wextra",
        str(SRC), "-o", str(LIB),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if not quiet:
        print(f"built {LIB}")
    return LIB


if __name__ == "__main__":
    build(force=True, quiet=False)
