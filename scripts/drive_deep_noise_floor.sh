#!/usr/bin/env bash
# Deep-noise floor probe (round 5): the radial floor is closed at 5 dB
# (aug-14,8,5 q_in 0.99 -> 95.3%) and MAP holds 100% there — but NOBODY has
# measured where MAP's own floor is. Sweep both detectors at clean,5,2,0 dB:
#   1. MAP fitted with --augment-noise-db 14,8,5 (small-n preset), tau off;
#   2. radial on the existing aug-14,8,5 q_in 0.99 fit (refit here for
#      reproducibility from a bare tree).
# 0 dB means noise power == signal power. Either outcome is recorded in
# docs/ROBUSTNESS.md + BASELINE.md.
# Usage: cd <fitted project dir>; bash ../scripts/drive_deep_noise_floor.sh
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
# shellcheck source=_env.sh
source "$HERE/_env.sh"
export ANURAXLA_COMPILE_CACHE=1

VAL=latent_space_exploration/val_chunks
TRAIN=latent_space_exploration/train_chunks
PERF=(--serving-tier balanced --transfer-int16)

echo "=== MAP aug-14,8,5 small-n fit ==="
python -m anuraxla fit-map --root "$TRAIN" --preset small-n \
    --augment-noise-db 14,8,5 --cache "${PERF[@]}"
echo "=== MAP sweep clean,5,2,0 ==="
python -m anuraxla benchmark-folder-map --root "$VAL" \
    --snr-sweep clean,5,2,0 --out-dir outputs/snr_map_deep "${PERF[@]}"
echo "--- MAP curve ---"
cat outputs/snr_map_deep/snr_curve.csv

echo "=== radial aug-14,8,5 q_in 0.99 fit ==="
python -m anuraxla fit-radial --root "$TRAIN" --q-in 0.99 --q-out 0.10 \
    --cache --augment-noise-db 14,8,5 "${PERF[@]}"
echo "=== radial sweep clean,5,2,0 ==="
python -m anuraxla benchmark-folder --root "$VAL" \
    --snr-sweep clean,5,2,0 --out-dir outputs/snr_radial_deep "${PERF[@]}"
echo "--- radial curve ---"
cat outputs/snr_radial_deep/snr_curve.csv
echo "✅ deep-noise floor drive complete"
