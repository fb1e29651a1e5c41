#!/usr/bin/env bash
# Fast-tier end-to-end quality characterization (VERDICT r4 item 3):
# the `--serving-tier fast` operating point (crop-first frontend + bf16 mel
# dots + bf16 encoder trunk, bench.py's value_fast_tier ~61k chunks/s/chip)
# is 1.5x the parity headline — this drive measures what relaxing exactness
# costs END TO END with all knobs composed, not per-knob:
#   1. decision equivalence: benchmark the val tree under `balanced` and
#      `fast` and diff the per-file decisions;
#   2. SNR sweep under the fast tier (radial + MAP) vs the balanced curves;
#   3. planted-call soundscape scans (14 dB and 8 dB) under the fast tier
#      at the noise-augmented fit.
# Usage: cd <fitted project dir>; bash ../scripts/drive_fast_tier.sh
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
# shellcheck source=_env.sh
source "$HERE/_env.sh"

VAL=latent_space_exploration/val_chunks
TRAIN=latent_space_exploration/train_chunks
COMMON=(--transfer-int16)

echo "=== [1/3] decision equivalence: balanced vs fast on the val tree ==="
python -m anuraxla benchmark-folder --root "$VAL" --serving-tier balanced \
    --out-dir outputs/tier_balanced "${COMMON[@]}"
python -m anuraxla benchmark-folder --root "$VAL" --serving-tier fast \
    --out-dir outputs/tier_fast "${COMMON[@]}"
python - <<'EOF'
import csv

def decisions(path):
    with open(path) as f:
        return {r["file"]: (r["pred_species"], r["detected"])
                for r in csv.DictReader(f)}

bal = decisions("outputs/tier_balanced/results.csv")
fast = decisions("outputs/tier_fast/results.csv")
assert bal.keys() == fast.keys()
diff = {k for k in bal if bal[k] != fast[k]}
n = len(bal)
print(f"decision equivalence: {n - len(diff)}/{n} identical "
      f"({100 * (n - len(diff)) / n:.2f}%)")
for k in sorted(diff):
    print(f"  DIFFERS {k}: balanced={bal[k]} fast={fast[k]}")
EOF

echo "=== [2/3] SNR sweep under the fast tier (radial + MAP) ==="
python -m anuraxla benchmark-folder --root "$VAL" --serving-tier fast \
    --snr-sweep clean,20,14,8 --out-dir outputs/snr_radial_fast "${COMMON[@]}"
python -m anuraxla benchmark-folder-map --root "$VAL" --serving-tier fast \
    --snr-sweep clean,20,14,8 --out-dir outputs/snr_map_fast "${COMMON[@]}"

echo "=== [3/3] planted-call scans (14 dB + 8 dB) under the fast tier ==="
for SNR in 14 8; do
  SCAPE=/tmp/fast_tier_scape_${SNR}db.wav
  [ -f "$SCAPE" ] || python -m anuraxla make-synth-data --soundscape "$SCAPE" \
      --minutes 30 --plant 0@600 --snr-db "$SNR"
  python -m anuraxla scan-soundscape --wav "$SCAPE" --serving-tier fast \
      --out outputs/scan_${SNR}db_fast.csv "${COMMON[@]}"
done

echo "=== summary ==="
echo "--- snr curves: radial fast / map fast ---"
cat outputs/snr_radial_fast/snr_curve.csv
cat outputs/snr_map_fast/snr_curve.csv
echo "--- planted windows (t=600 s) ---"
head -1 outputs/scan_14db_fast.csv
grep '^600' outputs/scan_14db_fast.csv || echo "14 dB: no detection at 600s"
grep '^600' outputs/scan_8db_fast.csv || echo "8 dB: no detection at 600s"
echo "✅ fast-tier characterization complete"
