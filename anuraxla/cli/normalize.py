"""``normalize`` — RMS-normalize chunk datasets (reference
``00_normalize_dataset_rms.py``): clone ``{train,val,test}_chunks/`` to
``*_norm/`` with RMS→0.05, silence gate 1e-4 (silent files copied unscaled),
clip to [-1,1]. Batched: whole species folders are normalized as one [B, L]
device op instead of one librosa.load per file.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from anuraxla.ops.frontend import rms_normalize_batch
from anuraxla.pipeline.dataset import scan_species_tree
from anuraxla.utils.timing import stage_timer
from anuraxla.utils.wavio import read_wav, write_wav
from anuraxla.cli.common import apply_device


def process_split(src: Path, dst: Path, sr: int, batch_size: int, log=print) -> int:
    tree = scan_species_tree(src)
    n_done = 0
    for sp, wavs in tree.items():
        sp_src = src / sp

        def out_path(w: Path) -> Path:
            # preserve nested structure: the scanner recurses, so bare names
            # from different subdirs must not collide in the output
            rel = w.relative_to(sp_src)
            p = dst / sp / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            return p
        # variable-length files: batch equal-length runs; fall back per-file
        n_fail = 0
        for i in range(0, len(wavs), batch_size):
            chunk = wavs[i : i + batch_size]
            ys, good = [], []
            for w in chunk:
                try:
                    y, _ = read_wav(w, sr=sr, mono=True)
                    ys.append(y)
                    good.append(w)
                except Exception as e:  # per-file isolation, like every stage
                    n_fail += 1
                    log(f"  ⚠️ {w.name}: {type(e).__name__}: {e}")
            if not good:
                continue
            lens = {len(y) for y in ys}
            if len(lens) == 1:
                batch = np.stack(ys)
                out, _ = rms_normalize_batch(batch)
                out = np.asarray(out)
                for j, w in enumerate(good):
                    write_wav(out_path(w), out[j], sr, subtype="PCM_16")
            else:
                for j, w in enumerate(good):
                    out, _ = rms_normalize_batch(ys[j][None])
                    write_wav(out_path(w), np.asarray(out)[0], sr, subtype="PCM_16")
            n_done += len(good)
        suffix = f" (failed={n_fail})" if n_fail else ""
        log(f"  {src.name}/{sp}: {len(wavs)} files{suffix}")
    return n_done


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base-dir", type=str, default="latent_space_exploration")
    p.add_argument("--sr", type=int, default=48000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--sets", nargs="*", default=["train_chunks", "val_chunks", "test_chunks"])
    p.add_argument("--device", type=str, default="auto")
    args = p.parse_args()
    apply_device(args.device)

    base = Path(args.base_dir).resolve()
    total = 0
    for s in args.sets:
        src, dst = base / s, base / f"{s}_norm"
        if not src.exists():
            print(f"⚠ missing {src}")
            continue
        print(f"\nnormalizing {s} → {s}_norm")
        with stage_timer(f"normalize[{s}]"):
            total += process_split(src, dst, args.sr, args.batch_size)
    print(f"\n✅ normalized dataset ready ({total} files).")


if __name__ == "__main__":
    main()
