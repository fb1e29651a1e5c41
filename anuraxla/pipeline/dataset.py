"""Folder scanning and batched WAV loading.

The reference's data layer is a Python for-loop calling librosa.load per file
(``08_fit_radial_detector.py:488-506``, ``10:387-418``). Here loading is a
prefetching, multithreaded batch reader that fills fixed-shape [B, L] float32
arrays ready for the jit frontend — decode on host threads (or the C++ native
loader when built), DSP/encode on TPU, overlapped.
"""

from __future__ import annotations

import random as pyrandom
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from anuraxla.utils.wavio import crop_or_pad_samples, read_wav


def scan_species_tree(root: Path, species: Optional[Sequence[str]] = None) -> Dict[str, List[Path]]:
    """root/<Species>/*.wav -> {species: sorted wav paths}.

    With an explicit species list, only those subdirs are read (fit scripts);
    otherwise every non-hidden subdir is a class (benchmark ground truth from
    folder names, ``10:380-388``). Recurses like the benchmark's rglob and
    accepts .wav/.WAV.
    """
    root = Path(root)
    out: Dict[str, List[Path]] = {}
    if species is None:
        dirs = sorted(d for d in root.iterdir() if d.is_dir() and not d.name.startswith("."))
        names = [d.name for d in dirs]
    else:
        names = list(species)
    for name in names:
        sp_dir = root / name
        if not sp_dir.exists():
            out[name] = []
            continue
        wavs = sorted(p for p in sp_dir.rglob("*") if p.is_file() and p.suffix in (".wav", ".WAV"))
        out[name] = wavs
    return out


def subsample_paths(
    wavs: List[Path], max_per_class: int, rng: pyrandom.Random
) -> List[Path]:
    """Reference subsampling semantics (``08:483-484``): random.sample of the
    sorted list when it exceeds max_per_class; caller seeds the RNG once per
    run so successive species draws consume sequential state."""
    if max_per_class and len(wavs) > max_per_class:
        return rng.sample(wavs, max_per_class)
    return wavs


class LoadedBatch(NamedTuple):
    audio: np.ndarray  # [B, L] float32 (failed rows zeroed)
    ok: np.ndarray  # [B] bool
    errors: List[Optional[str]]  # per-row error message or None


_native_loader = None
_native_checked = False


def _get_native_loader():
    """The C++ batch decoder (anuraxla/native), if built. Falls back to the
    pure-Python reader transparently."""
    global _native_loader, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from anuraxla.native import wavloader

            _native_loader = wavloader if wavloader.available() else None
        except Exception:
            _native_loader = None
    return _native_loader


def load_wav_batch(
    paths: Sequence[Path],
    *,
    sr: int,
    num_samples: int,
    num_threads: int = 16,
    use_native: bool = True,
    layout: Optional[Tuple[int, int]] = None,
) -> LoadedBatch:
    """Decode a list of WAVs into a fixed [len(paths), num_samples] array.

    Failures (missing/corrupt files) zero their row and set ok=False —
    the batched analogue of the reference's per-file try/except failure
    counters (``08:503-506``) and benchmark ERROR rows (``10:409-418``).

    ``layout=(row_len, col_offset)``: decode into zeroed rows of
    ``row_len`` samples with the file's samples at ``col_offset`` — the
    pre-padded phase-kernel layout (free for the host: the decoder memcpys
    into a preallocated row either way; saves the device-side signal pad).
    """
    n = len(paths)
    row_len, col_off = layout if layout is not None else (num_samples, 0)
    if col_off < 0 or col_off + num_samples > row_len:
        raise ValueError(f"layout {layout} cannot hold {num_samples} samples")
    audio = np.zeros((n, row_len), np.float32)
    ok = np.zeros(n, bool)
    errors: List[Optional[str]] = [None] * n

    native = _get_native_loader() if use_native else None
    if native is not None:
        return native.load_batch(
            paths, sr=sr, num_samples=num_samples, num_threads=num_threads,
            layout=layout,
        )

    def work(i: int):
        try:
            y, _ = read_wav(paths[i], sr=sr, mono=True)
            audio[i, col_off : col_off + num_samples] = crop_or_pad_samples(
                y, num_samples
            )
            ok[i] = True
        except Exception as e:  # noqa: BLE001 — per-file isolation by design
            errors[i] = f"{type(e).__name__}: {e}"

    if n:
        with ThreadPoolExecutor(max_workers=min(num_threads, max(n, 1))) as ex:
            list(ex.map(work, range(n)))
    return LoadedBatch(audio, ok, errors)


def iter_batches(
    paths: Sequence[Path],
    *,
    sr: int,
    num_samples: int,
    batch_size: int,
    num_threads: int = 16,
    prefetch: bool = True,
    layout: Optional[Tuple[int, int]] = None,
    transform=None,
) -> Iterator[Tuple[LoadedBatch, int]]:
    """Yield (batch, n_valid_rows) with the last batch zero-padded to
    ``batch_size`` (static shapes keep one XLA executable). Decodes the next
    batch on a background thread while the caller computes on the current one.
    ``layout``: see :func:`load_wav_batch`. ``transform(audio, start, n_valid)
    -> audio`` (optional) runs on the prefetch thread — host-side per-batch
    work (e.g. robustness noise injection) overlaps device compute instead of
    serializing between dispatches; ``start`` is the batch's global row
    offset in ``paths``.
    """
    chunks = [list(paths[i : i + batch_size]) for i in range(0, len(paths), batch_size)]
    row_len = layout[0] if layout is not None else num_samples

    def load(chunk: List[Path], start: int) -> Tuple[LoadedBatch, int]:
        b = load_wav_batch(chunk, sr=sr, num_samples=num_samples,
                           num_threads=num_threads, layout=layout)
        n_valid = len(chunk)
        if n_valid < batch_size:
            pad = batch_size - n_valid
            audio = np.concatenate([b.audio, np.zeros((pad, row_len), np.float32)])
            okp = np.concatenate([b.ok, np.zeros(pad, bool)])
            b = LoadedBatch(audio, okp, b.errors + [None] * pad)
        if transform is not None:
            b = b._replace(audio=transform(b.audio, start, n_valid))
        return b, n_valid

    starts = range(0, len(paths), batch_size)
    if not prefetch or len(chunks) <= 1:
        for c, s in zip(chunks, starts):
            yield load(c, s)
        return

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(load, chunks[0], 0)
        for nxt, s in zip(chunks[1:], list(starts)[1:]):
            cur = fut.result()
            fut = ex.submit(load, nxt, s)
            yield cur
        yield fut.result()
