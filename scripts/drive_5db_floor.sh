#!/usr/bin/env bash
# The 5 dB radial floor (VERDICT r4 item 4, second half): MAP holds 100% at
# 5 dB, radial dies (5.2%/94.8 even on the aug-14,8 fit). Does extending the
# augmented fit with a 5 dB leg move the floor?
#   1. fit radial --augment-noise-db 14,8,5 at two q_in settings;
#   2. SNR-sweep clean,14,8,5 after each fit;
#   3. diagnostic: per-class distance stats of the 5 dB-noised val latents
#      under the final fit (is the miss a threshold problem — distances just
#      past rk — or a geometry problem — noise collapses class separation?).
# Either outcome is recorded in docs/ROBUSTNESS.md + BASELINE.md.
# Usage: cd <fitted project dir>; bash ../scripts/drive_5db_floor.sh
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
# shellcheck source=_env.sh
source "$HERE/_env.sh"

VAL=latent_space_exploration/val_chunks
TRAIN=latent_space_exploration/train_chunks
PERF=(--serving-tier balanced --transfer-int16)

for QI in 0.95 0.99; do
  echo "=== aug-14,8,5 fit at q_in=$QI ==="
  python -m anuraxla fit-radial --root "$TRAIN" --q-in "$QI" --q-out 0.10 \
      --cache --augment-noise-db 14,8,5 "${PERF[@]}"
  python -m anuraxla benchmark-folder --root "$VAL" \
      --snr-sweep clean,14,8,5 --out-dir "outputs/snr_radial_aug5_qi$QI" \
      "${PERF[@]}"
  echo "--- curve (q_in=$QI) ---"
  cat "outputs/snr_radial_aug5_qi$QI/snr_curve.csv"
done

echo "=== 5 dB distance diagnostic under the final fit ==="
python - <<'EOF'
import json
from pathlib import Path

import numpy as np

from anuraxla.config import load_json
from anuraxla.constants import MelConfig
from anuraxla.pipeline.session import EncoderSession, encode_species_tree

cfg = load_json(Path("config.json"))
rd = cfg["radial_detector"]
species = list(rd["centroids"])
mel = MelConfig(duration=cfg["chunk_seconds"])
sess = EncoderSession(mel=mel, encoder_dir=None, project_root=Path("."),
                      parity=True, backend="pallas",
                      encoder_dtype="bfloat16", transfer_int16=True).load()
sess.add_noise_db = 5.0
Z_by, _, _ = encode_species_tree(
    sess, Path("latent_space_exploration/val_chunks"), species,
    cache=False, cache_dir=None, max_per_class=0, seed=0,
    log=lambda *a: None)
print(f"{'species':34s} {'rk':>7s} {'d_own p50':>10s} {'p10':>8s} "
      f"{'d_best-other p50':>17s}")
cents = {sp: np.asarray(rd["centroids"][sp], np.float32) for sp in species}
for sp in species:
    Z = np.asarray(Z_by[sp])
    d_own = np.linalg.norm(Z - cents[sp], axis=1)
    d_other = np.min(np.stack([
        np.linalg.norm(Z - cents[o], axis=1)
        for o in species if o != sp]), axis=0)
    rk = rd["thresholds"][sp]
    print(f"{sp:34s} {rk:7.3f} {np.median(d_own):10.3f} "
          f"{np.percentile(d_own, 10):8.3f} {np.median(d_other):17.3f}")
print("\nreading: if d_own p10 >> rk for every class, no radius fits 5 dB "
      "(geometry, not threshold); if d_own ~ d_best-other, the classes have "
      "merged at this SNR and only covariance-shaped decisions (MAP) survive.")
EOF
echo "✅ 5 dB floor drive complete"
