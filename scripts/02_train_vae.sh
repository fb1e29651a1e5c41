#!/bin/bash
# Train the conv VAE and export the encoder artifact.
# (The reference's 02_train_vae.sh was an empty TODO stub; this one is real.)
set -euo pipefail
source "$(dirname "$0")/_env.sh"
# Training defaults to host CPU: at this model size the conv-transpose
# backward's TPU compile (minutes under remote compile) dwarfs the train
# time, and the exported artifact is device-agnostic. Serving/encode
# scripts keep DEVICE_DEFAULT (auto -> TPU). Override with TRAIN_DEVICE.
$ANURAXLA train-vae \
  --root "$TRAIN_CHUNKS" \
  --out "$ENCODER_DIR" \
  --steps "${TRAIN_STEPS:-$TRAIN_STEPS_DEFAULT}" \
  --batch-size "${TRAIN_BATCH:-64}" \
  --device "${TRAIN_DEVICE:-cpu}" \
  "$@"
