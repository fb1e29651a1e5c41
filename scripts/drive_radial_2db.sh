#!/usr/bin/env bash
# Radial 2 dB floor probe (round 5): drive_deep_noise_floor.sh located the
# radial floor between 5 dB (95.3%) and 2 dB (2.6%, NO_DETECT-driven) under
# the aug-14,8,5 q_in 0.99 fit. The 5 dB collapse was pure threshold
# tightness and a 5 dB augmentation leg fixed it — test whether the same
# lever works one octave deeper: fit radial with --augment-noise-db
# 14,8,5,2 and re-sweep clean,5,2,0. Two risks this measures: (a) the
# 2 dB-noised training latents may inflate rk enough to cost clean/5 dB
# accuracy, (b) at some SNR the noised cluster spread swallows the
# inter-class margin and no single radius works. Either outcome lands in
# docs/ROBUSTNESS.md + BASELINE.md.
# Usage: cd <fitted project dir>; bash ../scripts/drive_radial_2db.sh
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
# shellcheck source=_env.sh
source "$HERE/_env.sh"
export ANURAXLA_COMPILE_CACHE=1

VAL=latent_space_exploration/val_chunks
TRAIN=latent_space_exploration/train_chunks
PERF=(--serving-tier balanced --transfer-int16)

echo "=== radial aug-14,8,5,2 q_in 0.99 fit ==="
python -m anuraxla fit-radial --root "$TRAIN" --q-in 0.99 --q-out 0.10 \
    --cache --augment-noise-db 14,8,5,2 "${PERF[@]}"
echo "=== radial sweep clean,5,2,0 ==="
python -m anuraxla benchmark-folder --root "$VAL" \
    --snr-sweep clean,5,2,0 --out-dir outputs/snr_radial_2db "${PERF[@]}"
echo "--- radial aug-2 curve ---"
cat outputs/snr_radial_2db/snr_curve.csv
echo "✅ radial 2 dB floor drive complete"
