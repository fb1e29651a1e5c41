#!/usr/bin/env bash
# Tiers x augmented fit composition drive (round 5): re-drive the
# aug-14,8,5 q_in 0.99 operating point (fit by drive_5db_floor.sh) through
# BOTH serving tiers to show tier choice is a pure speed knob there:
#   1. planted-call soundscape scans (14 dB and 8 dB, call at t=600 s)
#      under `balanced` and `fast`;
#   2. fast-tier SNR sweep (clean,14,8,5) on the val tree.
# Expects the 0.5 h soundscapes from drive_fast_tier.sh's make-synth-data
# step at /tmp/fast_tier_scape_{14,8}db.wav and the aug-14,8,5 fit already
# in config.json. Measured results: BASELINE.md (round 5) and
# docs/ROBUSTNESS.md "The serving tiers compose with the augmented fit".
# Usage: cd <fitted project dir>; bash ../scripts/drive_tier_scans.sh
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
# shellcheck source=_env.sh
source "$HERE/_env.sh"
export ANURAXLA_COMPILE_CACHE=1

for TIER in balanced fast; do
  for SNR in 14 8; do
    echo "=== scan ${SNR}dB tier=${TIER} ==="
    python -m anuraxla scan-soundscape --wav "/tmp/fast_tier_scape_${SNR}db.wav" \
        --serving-tier "$TIER" --out "outputs/scan_${SNR}db_${TIER}_aug5.csv" \
        --transfer-int16
  done
done

echo "=== fast-tier SNR sweep at the aug-14,8,5 q_in=0.99 fit ==="
python -m anuraxla benchmark-folder --root latent_space_exploration/val_chunks \
    --serving-tier fast --snr-sweep clean,14,8,5 \
    --out-dir outputs/snr_radial_fast_aug5 --transfer-int16

echo "--- curve ---"
cat outputs/snr_radial_fast_aug5/snr_curve.csv
for f in outputs/scan_14db_balanced_aug5.csv outputs/scan_14db_fast_aug5.csv \
         outputs/scan_8db_balanced_aug5.csv outputs/scan_8db_fast_aug5.csv; do
  echo "--- $f t=600 row + detection count ---"
  grep '^600' "$f" || echo "no 600 row"
  awk -F, 'NR>1 && $3=="True"' "$f" | wc -l
done
echo "DONE tier scans"
