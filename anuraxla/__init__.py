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

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt IN: ANURAXLA_COMPILE_CACHE=1).

    Measured through a remote-compile TPU relay (round 5, BASELINE.md): TPU
    executables round-trip the cache correctly — the full VAE train step's
    compile drops 151 s -> 6.1 s across fresh processes with identical
    losses, and the encoder forward 377 s -> 1.4 s. scripts/02_train_vae.sh
    turns it on to train the demo on-chip.

    Still opt-in rather than default: on remote-compile hosts the cache can
    also retain CPU AOT artifacts built for a different machine's CPU
    features, which XLA then warns may SIGILL when loaded locally — the TPU
    entries are safe, the cross-machine CPU entries are the hazard. Enable
    it wherever processes repeat the same jits (normal single-machine TPU
    hosts always qualify)."""
    # explicit opt-out values must win: scripts export the flag with a
    # default-on (e.g. 02_train_vae.sh's ${ANURAXLA_COMPILE_CACHE:-1}), so
    # a user-supplied "0" reaches us as the string "0", which is truthy
    if _os.environ.get("ANURAXLA_COMPILE_CACHE", "").strip().lower() in (
            "", "0", "false", "off", "no"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "ANURAXLA_COMPILE_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "anuraxla_xla"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement


_enable_compilation_cache()

from anuraxla.constants import (  # noqa: F401
    DEFAULT_MEL,
    PRIORITY_ORDER,
    SPECIES,
)
