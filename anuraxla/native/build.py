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
    base = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-Wall", "-Wextra",
        str(SRC), "-o", str(LIB),
    ]
    # The .so is always built lazily on the host that runs it, so -march=native
    # is safe and lets the compiler auto-vectorize the PCM decode/mixdown
    # loops with whatever SIMD the host has (AVX2/AVX-512). Falls back to the
    # baseline ISA if the toolchain rejects the flag.
    res = subprocess.run(base + ["-march=native"], capture_output=True, text=True)
    if res.returncode != 0:
        res = subprocess.run(base, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if not quiet:
        print(f"built {LIB}")
    return LIB


if __name__ == "__main__":
    build(force=True, quiet=False)
