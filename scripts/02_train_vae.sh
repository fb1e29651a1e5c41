#!/bin/bash
# Train the conv VAE and export the encoder artifact.
# (The reference's 02_train_vae.sh was an empty TODO stub; this one is real.)
set -euo pipefail
source "$(dirname "$0")/_env.sh"
# Training runs on-chip by default with the persistent compilation cache:
# the conv-transpose backward's remote compile (151-852 s measured) is paid
# once per architecture and drops to ~6 s on every later fresh process
# (BASELINE.md round-5 row), after which the chip trains ~700x faster than
# a 1-core host (~17 ms/step vs ~15 s/step at batch 64). Worst case (cold
# cache, slow relay phase) is on par with the CPU fallback; override with
# TRAIN_DEVICE=cpu when no TPU is attached.
export ANURAXLA_COMPILE_CACHE="${ANURAXLA_COMPILE_CACHE:-1}"
$ANURAXLA train-vae \
  --root "$TRAIN_CHUNKS" \
  --out "$ENCODER_DIR" \
  --steps "${TRAIN_STEPS:-$TRAIN_STEPS_DEFAULT}" \
  --batch-size "${TRAIN_BATCH:-64}" \
  --device "${TRAIN_DEVICE:-auto}" \
  "$@"
