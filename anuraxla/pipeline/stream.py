"""Streaming soundscape detection: windowed chunking of long recordings into
fixed [B, num_samples] batches, encoded and decided on device.

Capability target: the reference hard-caps every input at ``chunk_seconds``
(long recordings are simply truncated — ``map_detector_core.py:212-217``,
SURVEY.md §5.7); processing a multi-hour soundscape required pre-splitting
into chunk files. Here a recording of any length is scanned in place:
overlapping analysis windows stream through the batched pipeline
(optionally sharded over a mesh), producing per-window detections — the
"streaming multi-hour soundscape" configuration of BASELINE.json.
"""

from __future__ import annotations

import csv
import dataclasses
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

from anuraxla.config import priority_ranks
from anuraxla.detect.gaussian_map import map_decide
from anuraxla.detect.radial import radial_decide
from anuraxla.pipeline.session import EncoderSession
from anuraxla.utils.timing import stage_timer
from anuraxla.utils.wavio import WavStream


@dataclasses.dataclass
class Detection:
    t_start: float
    t_end: float
    detected: bool
    species: Optional[str]
    score: float  # best_distance (radial) or best_score (map)


def _rms_normalize_rows(batch: np.ndarray) -> None:
    """In-place host-thread normalization — the SAME implementation as the
    jit path (ops.frontend._rms_normalize_impl via rms_normalize_np), just
    on numpy arrays, so the two can never drift."""
    from anuraxla.ops.frontend import rms_normalize_np

    out, _ = rms_normalize_np(batch)
    np.copyto(batch, out)


def window_batches(
    stream: WavStream,
    *,
    num_samples: int,
    hop_samples: int,
    batch_size: int,
    target_sr: int,
    normalize: bool = False,
    prefetch: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray, int]]:
    """Yield ([B, num_samples] float32, start_frames [B], n_valid). The last
    batch is zero-padded to the fixed size. Resamples (and optionally RMS
    normalizes) per window when preparing the batch. With ``prefetch`` the
    next batch is extracted on a background thread while the caller computes
    on the current one — same overlap structure as dataset.iter_batches."""
    from anuraxla.utils.wavio import resample

    scale = stream.sr / target_sr
    src_win = int(round(num_samples * scale))
    src_hop = int(round(hop_samples * scale))
    starts = list(range(0, max(stream.num_frames - 1, 1), src_hop))
    chunks = [starts[i : i + batch_size] for i in range(0, len(starts), batch_size)]

    def load(chunk: List[int]) -> tuple[np.ndarray, np.ndarray, int]:
        batch = np.zeros((batch_size, num_samples), np.float32)
        for j, s in enumerate(chunk):
            y = stream.read(s, src_win)
            if stream.sr != target_sr:
                y = resample(y, stream.sr, target_sr)
                y = y[:num_samples]
                if y.shape[0] < num_samples:
                    y = np.pad(y, (0, num_samples - y.shape[0]))
            batch[j] = y
        if normalize:
            _rms_normalize_rows(batch)
        return batch, np.asarray(chunk), len(chunk)

    if not prefetch or len(chunks) <= 1:
        for c in chunks:
            yield load(c)
        return

    # single worker: all WavStream reads stay on one thread, in order
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(load, chunks[0])
        for nxt in chunks[1:]:
            cur = fut.result()
            fut = ex.submit(load, nxt)
            yield cur
        yield fut.result()


def scan_soundscape(
    wav_path: Path,
    session: EncoderSession,
    *,
    detector: str,
    config: dict,
    hop_seconds: Optional[float] = None,
    normalize: bool = True,
    log=print,
) -> List[Detection]:
    """Scan one long recording; returns per-window detections."""
    from anuraxla.config import read_map, read_radial

    if detector == "radial":
        species, centroids, thresholds, chunk_seconds = read_radial(config)
    elif detector == "map":
        species, means, precs, lds, priors, tau, chunk_seconds = read_map(config)
    else:
        raise ValueError(f"unknown detector: {detector}")

    session.reconfigure(duration=chunk_seconds)

    mel = session.mel
    hop_seconds = hop_seconds if hop_seconds is not None else chunk_seconds
    hop_samples = max(1, int(mel.sr * hop_seconds))
    ranks = priority_ranks(species)

    # decide on device, chained onto the (async) encode dispatch — the host
    # never syncs between encode and decide
    import jax.numpy as jnp

    if detector == "radial":
        cents_d, thr_d, ranks_d = map(jnp.asarray, (centroids, thresholds, ranks))

        def decide(Z):
            return radial_decide(Z, cents_d, thr_d, ranks_d)
    else:
        tau_arr = jnp.asarray(np.nan if tau is None else tau, jnp.float32)
        means_d, precs_d, lds_d, priors_d = map(jnp.asarray, (means, precs, lds, priors))

        def decide(Z):
            return map_decide(Z, means_d, precs_d, lds_d, priors_d, tau_arr)

    stream = WavStream(wav_path)
    out: List[Detection] = []
    n_windows = 0

    def emit(res, starts, n_valid):
        det, win, best = (np.asarray(x) for x in res)
        for j in range(n_valid):
            t0 = float(starts[j]) / stream.sr
            out.append(
                Detection(
                    t_start=t0,
                    t_end=t0 + chunk_seconds,
                    detected=bool(det[j]),
                    species=(species[int(win[j])] if det[j] and win[j] >= 0 else None),
                    score=float(best[j]),
                )
            )

    # three-way overlap, same structure as EncoderSession.encode_paths:
    # prefetch thread extracts+normalizes window batch i+1, the device runs
    # encode+decide for batch i, the host fetches batch i-1's decisions.
    # When the session fuses normalization into the mel op
    # (normalize_on_device), the prefetch thread only extracts — the
    # per-window RMS runs on device, freeing this (single-core) host.
    host_norm = normalize and not getattr(session, "normalize_on_device", False)
    if not normalize and getattr(session, "normalize_on_device", False):
        raise ValueError(
            "normalize=False but the session was built with "
            "normalize_on_device=True — its compute() would normalize anyway; "
            "build the session without normalize_on_device instead"
        )
    pending = None
    with stage_timer("scan", log=None) as t:
        for batch, starts, n_valid in window_batches(
            stream,
            num_samples=mel.num_samples,
            hop_samples=hop_samples,
            batch_size=session.batch_size,
            target_sr=mel.sr,
            normalize=host_norm,
        ):
            res = decide(session._dispatch(batch))
            if pending is not None:
                emit(*pending)
            pending = (res, starts, n_valid)
            n_windows += n_valid
        if pending is not None:
            emit(*pending)
    rate = n_windows / t.seconds if t.seconds > 0 else float("nan")
    log(
        f"✅ scanned {stream.duration_seconds / 3600:.2f} h in {t.seconds:.1f}s "
        f"({n_windows} windows, {rate:.1f} windows/s, "
        f"{stream.duration_seconds / max(t.seconds, 1e-9):.0f}x realtime)"
    )
    return out


def extract_detected_chunks(
    wav_path: Path,
    dets: List[Detection],
    out_root: Path,
    *,
    sr: int,
    log=print,
) -> int:
    """Write each detected window as a per-species chunk WAV under
    ``out_root/<Species>/`` — turning a raw field recording into the labeled
    chunk-tree layout every fit/benchmark tool consumes. This is the chunk
    *generation* step the reference explicitly leaves out of scope
    (REPRODUCE guide: "Raw WAV-to-chunk generation is not included")."""
    from anuraxla.utils.wavio import write_wav

    stream = WavStream(wav_path)
    stem = Path(wav_path).stem
    n = 0
    for d in dets:
        if not d.detected or d.species is None:
            continue
        out_dir = Path(out_root) / d.species
        out_dir.mkdir(parents=True, exist_ok=True)
        src_start = int(round(d.t_start * stream.sr))
        src_len = int(round((d.t_end - d.t_start) * stream.sr))
        y = stream.read(src_start, src_len)
        if stream.sr != sr:
            from anuraxla.utils.wavio import resample

            y = resample(y, stream.sr, sr)
        ms = int(round(d.t_start * 1000))
        write_wav(out_dir / f"{stem}_t{ms:09d}ms.wav", y, sr, subtype="PCM_16")
        n += 1
    log(f"💾 extracted {n} detected chunks under {out_root}")
    return n


def write_detections_csv(dets: List[Detection], path: Path, score_name: str) -> None:
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["t_start", "t_end", "detected", "species", score_name])
        for d in dets:
            w.writerow([f"{d.t_start:.3f}", f"{d.t_end:.3f}", d.detected, d.species or "NO_DETECT", f"{d.score:.6f}"])
