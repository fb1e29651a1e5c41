"""Generate a synthetic labeled chunk tree (train/val/test) for tests, bench,
and end-to-end drives. Each species gets a distinct band-limited "call"
(FM tone burst + noise) so latent clusters separate even under an untrained
encoder. Not a reference component — the reference assumes pre-extracted
chunks exist; this makes the framework self-exercising.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from anuraxla.constants import SPECIES
from anuraxla.utils.wavio import write_wav


def synth_call(rng: np.random.Generator, sr: int, seconds: float, f0: float, fm: float) -> np.ndarray:
    n = int(sr * seconds)
    t = np.arange(n) / sr
    # pulsed FM carrier: species-specific base freq + pulse rate
    carrier = np.sin(2 * np.pi * (f0 * t + 20.0 * np.sin(2 * np.pi * fm * t)))
    pulses = (np.sin(2 * np.pi * (fm / 3.0) * t) > 0).astype(np.float32)
    call = 0.25 * carrier * pulses
    noise = 0.02 * rng.standard_normal(n)
    return (call + noise).astype(np.float32)


def make_tree(
    root: Path,
    *,
    sr: int = 48000,
    seconds: float = 5.0,
    per_species: int = 12,
    splits=("train_chunks", "val_chunks", "test_chunks"),
    species=SPECIES,
    seed: int = 0,
) -> None:
    rng = np.random.default_rng(seed)
    base_freqs = np.linspace(400, 6000, len(species))
    pulse_rates = np.linspace(4, 16, len(species))
    for split in splits:
        for k, sp in enumerate(species):
            d = Path(root) / split / sp
            d.mkdir(parents=True, exist_ok=True)
            for i in range(per_species):
                y = synth_call(rng, sr, seconds, float(base_freqs[k]), float(pulse_rates[k]))
                write_wav(d / f"audio{i:03d}_chunk0.wav", y, sr, subtype="PCM_16")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, type=str)
    p.add_argument("--sr", type=int, default=48000)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--per-species", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    make_tree(
        Path(args.root), sr=args.sr, seconds=args.seconds,
        per_species=args.per_species, seed=args.seed,
    )
    # a config.json seed so fit scripts can run immediately
    import json

    cfg_path = Path(args.root) / "config.json"
    if not cfg_path.exists():
        cfg_path.write_text(json.dumps({"species": list(SPECIES), "chunk_seconds": args.seconds}, indent=2))
    print(f"✅ synthetic tree at {args.root} ({args.per_species}/species/split, {args.seconds}s @ {args.sr}Hz)")


if __name__ == "__main__":
    main()
