"""``evaluate-wav`` — detect species in one WAV with the radial detector
(reference ``09_evaluate_wav_detection.py``: accept iff ||z-mu_k|| <= rk,
priority tie-break; exit code 0 = detected, 2 = not).

Also exposes ``detect_species()`` for library use — unlike the reference's
version, it takes a reusable session so the encoder is never reloaded per call
(the cold path SURVEY.md flags at 09:400).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from anuraxla.cli.common import (
    add_device_arg,
    add_encoder_args,
    add_mel_args,
    apply_device,
    mel_from_args,
    project_root_here,
    resolve_config,
)
from anuraxla.config import load_config, priority_ranks, read_radial
from anuraxla.detect.radial import radial_decide
from anuraxla.pipeline.dataset import load_wav_batch
from anuraxla.pipeline.session import EncoderSession


def detect_species(
    wav_path: str | Path,
    session: EncoderSession,
    config_path: str | Path,
) -> Tuple[bool, Optional[str], float]:
    """-> (detected, species|None, best_distance)."""
    cfg = load_config(Path(config_path))
    species, centroids, thresholds, chunk_seconds = read_radial(cfg)
    session.reconfigure(duration=chunk_seconds)
    batch = load_wav_batch([Path(wav_path)], sr=session.mel.sr, num_samples=session.mel.num_samples)
    if not batch.ok[0]:
        raise FileNotFoundError(f"cannot read WAV: {wav_path} ({batch.errors[0]})")
    Z = session.encode_array(batch.audio)
    det, win, best = radial_decide(Z, centroids, thresholds, priority_ranks(species))
    detected = bool(np.asarray(det)[0])
    sp = species[int(np.asarray(win)[0])] if detected else None
    return detected, sp, float(np.asarray(best)[0])


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav", required=True, type=str)
    p.add_argument("--config", type=str, default=None)
    add_device_arg(p)
    add_mel_args(p)
    add_encoder_args(p)
    return p


def main() -> None:
    args = build_parser().parse_args()
    apply_device(args.device)
    project_root = project_root_here()
    cfg_path = resolve_config(args.config or "config.json", project_root)

    wav = Path(args.wav).expanduser()
    if not wav.is_absolute():
        wav = (Path.cwd() / wav).resolve()
    if not wav.exists():
        raise SystemExit(f"❌ WAV not found: {wav}")

    # read chunk_seconds before building the session so the frontend compiles
    # exactly once with the calibrated duration
    from anuraxla.config import get_chunk_seconds, load_config

    chunk_seconds = get_chunk_seconds(load_config(cfg_path))
    session = EncoderSession(
        mel=mel_from_args(args, duration=chunk_seconds),
        encoder_dir=Path(args.encoder) if args.encoder else None,
        project_root=project_root,
        batch_size=1,
    ).load()

    detected, sp, best_d = detect_species(wav, session, cfg_path)
    if detected:
        print(f"✅ DETECTED: {sp} | best_distance={best_d:.6f}")
        sys.exit(0)
    print(f"❌ NO DETECT | best_distance={best_d:.6f}")
    sys.exit(2)


if __name__ == "__main__":
    main()
