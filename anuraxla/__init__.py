"""anuraxla — TPU-native amphibian bioacoustic detection framework.

A brand-new JAX/XLA/Pallas/pjit rebuild of the capabilities of
``vpobleteacustica/amphibian-vae-latent-detector``: RMS normalization,
STFT/log-mel frontend, conv-VAE latent encoding, radial + Gaussian-MAP
detectors in latent space, on-device q_in/q_out calibration sweeps, and
folder-level detection benchmarks — all batched, jit-compiled, and sharded
over a TPU device mesh instead of per-file librosa/NumPy/Torch script steps.

Layer map (mirrors SURVEY.md §1 of this repo):
  L0 audio I/O + DSP     -> anuraxla.utils.wavio, anuraxla.ops
  L1/L2 model + encoding -> anuraxla.models
  L3 detector fitting    -> anuraxla.detect
  L4 detection           -> anuraxla.detect, anuraxla.pipeline.session
  L5 benchmark/metrics   -> anuraxla.pipeline.benchmark
  L6 calibration         -> anuraxla.detect.calibrate, anuraxla.pipeline.grid
  L7 pipeline driver     -> anuraxla.cli, scripts/
"""

__version__ = "0.1.0"

from anuraxla.constants import (  # noqa: F401
    DEFAULT_MEL,
    PRIORITY_ORDER,
    SPECIES,
)
