#!/bin/bash
# Batch-encode the chunk trees to JSONL latents.
# (The reference's 03 passed --root to a tool that only accepted --wav and
# could not run; encode-wav supports --root natively here.)
set -euo pipefail
source "$(dirname "$0")/_env.sh"
mkdir -p "$OUTPUTS_DIR/latents"
for split in train val test; do
  dir_var="$(echo "${split}" | tr '[:lower:]' '[:upper:]')_CHUNKS"
  dir="${!dir_var}"
  [ -d "$dir" ] || { echo "skip $split ($dir missing)"; continue; }
  $ANURAXLA encode-wav --root "$dir" --jsonl --device "$DEVICE_DEFAULT" \
    > "$OUTPUTS_DIR/latents/${split}_latents.jsonl"
  echo "wrote $OUTPUTS_DIR/latents/${split}_latents.jsonl"
done
