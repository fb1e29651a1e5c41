"""ctypes binding for the native WAV batch decoder (wavio.cpp).

Drop-in for pipeline.dataset.load_wav_batch's hot path; the pure-Python
reader remains the fallback and the behavioral oracle (tests compare both).
Disable with ANURAXLA_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_ERR_STRIDE = 160
_lib = None
_load_failed = False


def _get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("ANURAXLA_NO_NATIVE"):
        _load_failed = True
        return None
    try:
        from anuraxla.native.build import build

        lib = ctypes.CDLL(str(build()))
        lib.avld_load_wav_batch_strided.restype = ctypes.c_int
        lib.avld_load_wav_batch_strided.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        if lib.avld_abi_version() != 2:
            raise RuntimeError("native ABI mismatch")
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def load_batch(
    paths: Sequence[Path], *, sr: int, num_samples: int, num_threads: int = 16,
    layout: Optional[tuple] = None,
):
    """Decode a batch. ``layout=(row_len, col_offset)`` writes each file's
    samples at that offset in a zeroed row of ``row_len`` floats — the
    pre-padded phase-kernel layout (ops.pallas_frontend.phase_padded_layout)
    at zero extra host cost."""
    from anuraxla.pipeline.dataset import LoadedBatch

    lib = _get_lib()
    if lib is None:
        raise RuntimeError(
            "native WAV loader unavailable (ANURAXLA_NO_NATIVE set, or the "
            "g++ build failed) — check wavloader.available() and use the "
            "pure-Python reader (pipeline.dataset does this automatically)"
        )
    n = len(paths)
    row_len, col_offset = layout if layout is not None else (num_samples, 0)
    if col_offset < 0 or col_offset + num_samples > row_len:
        raise ValueError(f"layout {layout} cannot hold {num_samples} samples")
    audio = np.zeros((n, row_len), np.float32)
    ok = np.zeros(n, np.uint8)
    errbuf = ctypes.create_string_buffer(n * _ERR_STRIDE)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])

    if n:
        lib.avld_load_wav_batch_strided(
            c_paths,
            n,
            sr,
            num_samples,
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            row_len,
            col_offset,
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            errbuf,
            _ERR_STRIDE,
            num_threads,
        )

    errors: List[Optional[str]] = []
    for i in range(n):
        if ok[i]:
            errors.append(None)
        else:
            raw = errbuf.raw[i * _ERR_STRIDE : (i + 1) * _ERR_STRIDE].split(b"\0", 1)[0]
            errors.append(raw.decode(errors="replace") or "decode failed")
    return LoadedBatch(audio, ok.astype(bool), errors)
