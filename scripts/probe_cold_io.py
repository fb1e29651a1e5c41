"""Cold-cache IO probe for the native WAV loader (ROADMAP open item 1).

The loader replaces the reference's librosa.load hot loop
(ref:08_fit_radial_detector.py:488-506) with an mmap + thread-pool C++
decoder; its warm-cache rate is pinned (~1,700 files/s) but cold-cache
behavior — the first pass over a freshly mounted field-recording drive —
was never measured, and "use O_DIRECT" was the standing hypothesis for
making that first pass faster.

This probe settles it on real numbers:

1. generate N small PCM16 WAVs (the benchmark chunk shape);
2. raw-IO legs over the set, page cache EVICTED between legs via
   posix_fadvise(DONTNEED) (verified with mincore): buffered read(2),
   mmap touch (the loader's access pattern), O_DIRECT aligned pread;
3. decoder legs: native batch decode warm vs cold.

Interpretation: if O_DIRECT does not beat cold buffered/mmap reads here,
an O_DIRECT read path in wavio.cpp buys nothing on this class of storage
(it disables readahead, which is exactly what sequential ~0.5 MB files
want) and the item closes as a measured negative.

Usage: python scripts/probe_cold_io.py [--files 256] [--seconds 5] [--threads 4]
"""

from __future__ import annotations

import argparse
import ctypes
import json
import mmap
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PAGE = 4096


def evict(path: Path) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)


def resident_fraction(path: Path) -> float:
    """Fraction of the file's pages in the page cache (mincore)."""
    # raw mmap/mincore/munmap through libc: the mmap module can't hand
    # ctypes a stable address without exporting a buffer it then refuses
    # to close over
    libc = ctypes.CDLL(None, use_errno=True)
    libc.mmap.restype = ctypes.c_void_p
    libc.mmap.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
                          ctypes.c_int, ctypes.c_int, ctypes.c_long]
    fd = os.open(path, os.O_RDONLY)
    try:
        size = os.fstat(fd).st_size
        addr = libc.mmap(None, size, mmap.PROT_READ, mmap.MAP_SHARED, fd, 0)
        if addr in (None, ctypes.c_void_p(-1).value):
            return float("nan")
        try:
            npages = (size + PAGE - 1) // PAGE
            vec = (ctypes.c_ubyte * npages)()
            rc = libc.mincore(ctypes.c_void_p(addr), ctypes.c_size_t(size), vec)
            if rc != 0:
                return float("nan")
            return sum(v & 1 for v in vec) / npages
        finally:
            libc.munmap(ctypes.c_void_p(addr), ctypes.c_size_t(size))
    finally:
        os.close(fd)


def leg_buffered(paths) -> float:
    t0 = time.perf_counter()
    total = 0
    for p in paths:
        with open(p, "rb", buffering=0) as f:
            total += len(f.read())
    return total / (time.perf_counter() - t0)


def leg_mmap(paths) -> float:
    t0 = time.perf_counter()
    total = 0
    acc = 0
    for p in paths:
        fd = os.open(p, os.O_RDONLY)
        size = os.fstat(fd).st_size
        with mmap.mmap(fd, size, prot=mmap.PROT_READ) as m:
            # touch every page like the decoder's sequential sweep
            acc += sum(m[i] for i in range(0, size, PAGE))
        os.close(fd)
        total += size
    dt = time.perf_counter() - t0
    if acc < 0:  # keep the sum alive
        print(acc)
    return total / dt


def leg_odirect(paths, block: int = 1 << 20) -> float | None:
    """Aligned O_DIRECT pread sweep; None if the fs rejects O_DIRECT."""
    raw = ctypes.create_string_buffer(block + PAGE)
    addr = (ctypes.addressof(raw) + PAGE - 1) & ~(PAGE - 1)
    libc = ctypes.CDLL(None, use_errno=True)
    t0 = time.perf_counter()
    total = 0
    for p in paths:
        try:
            fd = os.open(p, os.O_RDONLY | os.O_DIRECT)
        except OSError:
            return None
        try:
            off = 0
            while True:
                n = libc.pread(fd, ctypes.c_void_p(addr),
                               ctypes.c_size_t(block), ctypes.c_long(off))
                if n <= 0:
                    break
                off += n
            total += off
        finally:
            os.close(fd)
    return total / (time.perf_counter() - t0)


def leg_native_decode(paths, sr: int, num_samples: int, threads: int) -> float:
    from anuraxla.native.wavloader import load_batch

    t0 = time.perf_counter()
    batch = load_batch(paths, sr=sr, num_samples=num_samples,
                       num_threads=threads)
    dt = time.perf_counter() - t0
    assert int(batch.ok.sum()) == len(paths)
    return len(paths) / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--root", type=str, default="/tmp/cold_io_probe")
    args = ap.parse_args()

    from anuraxla.utils.wavio import write_wav

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    n_samp = int(args.seconds * args.sr)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(args.files):
        p = root / f"f{i:04d}.wav"
        if not p.exists():
            write_wav(p, (0.1 * rng.standard_normal(n_samp)).astype(np.float32),
                      args.sr)
        paths.append(p)
    total_mb = sum(p.stat().st_size for p in paths) / 1e6
    print(f"# {len(paths)} files, {total_mb:.0f} MB total", flush=True)

    def evict_all():
        for p in paths:
            evict(p)
        return resident_fraction(paths[0])

    results = {"files": len(paths), "total_mb": round(total_mb, 1)}

    # raw-IO legs (cold each time; eviction verified)
    for name, fn in (("buffered", leg_buffered), ("mmap", leg_mmap),
                     ("odirect", leg_odirect)):
        rf = evict_all()
        rate = fn(paths)
        results[f"cold_{name}_mb_s"] = (
            None if rate is None else round(rate / 1e6, 1))
        results.setdefault("evicted_resident_frac", round(rf, 4))
        print(f"cold {name}: "
              f"{'unsupported' if rate is None else f'{rate / 1e6:.1f} MB/s'}",
              flush=True)
    # warm raw baseline for scale
    leg_buffered(paths)
    results["warm_buffered_mb_s"] = round(leg_buffered(paths) / 1e6, 1)

    # decoder legs
    warm = leg_native_decode(paths, args.sr, n_samp, args.threads)
    results["warm_decode_files_s"] = round(warm, 1)
    evict_all()
    cold = leg_native_decode(paths, args.sr, n_samp, args.threads)
    results["cold_decode_files_s"] = round(cold, 1)
    results["cold_warm_ratio"] = round(cold / warm, 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
