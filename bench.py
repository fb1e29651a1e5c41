"""Headline benchmark: audio chunks encoded+detected per second per chip.

Measures the full production path on the default device (TPU when present):
RMS normalize -> STFT/mel/dB/standardize (parity mode) -> conv VAE encode ->
radial detect, as ONE jit-compiled batched function over 5 s 48 kHz chunks —
the metric BASELINE.json names ("audio chunks encoded/sec/chip").

vs_baseline compares against a reference-style implementation measured on
this host's CPU: the same math as the upstream pipeline's hot loop
(NumPy FFT mel frontend + torch conv encoder, one chunk at a time, exactly
how ``08_fit_radial_detector.py:461-521`` iterates). The reference itself
ships no numbers and can't run here (no librosa / private weights), so its
architecture is reproduced faithfully and timed (SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


BATCH_CANDIDATES = (1024, 512, 256)  # largest that compiles wins
SECONDS_PER_CHUNK = 5.0
MEASURE_SECONDS = 6.0
BASELINE_CHUNKS = 6


def make_audio(batch: int, num_samples: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(num_samples) / 48_000
    base = 0.2 * np.sin(2 * np.pi * 2000.0 * t)
    out = np.empty((batch, num_samples), np.float32)
    for i in range(batch):
        out[i] = base + 0.02 * rng.standard_normal(num_samples)
    return out


def bench_tpu_pipeline(audio: np.ndarray, batch: int, backend: str = "pallas") -> float:
    import jax
    import jax.numpy as jnp

    from anuraxla.constants import DEFAULT_MEL
    from anuraxla.detect.radial import radial_decide
    from anuraxla.models.vae import VAEConfig, init_encoder
    from anuraxla.ops.frontend import log_mel_batch, mel_to_encoder_input, rms_normalize_batch

    vcfg = VAEConfig()
    enc, params = init_encoder(vcfg, seed=0)
    K = 4
    rngk = np.random.default_rng(1)
    centroids = jnp.asarray(rngk.standard_normal((K, vcfg.latent_dim)), jnp.float32)
    thresholds = jnp.asarray(np.full(K, 3.0), jnp.float32)
    ranks = jnp.asarray(np.arange(K), jnp.float32)

    @jax.jit
    def pipeline(params, audio):
        y, _ = rms_normalize_batch(audio)
        # backend="pallas" = the fused in-VMEM Cooley–Tukey mel kernel in
        # exact (true-f32) mode — same librosa-parity math as "matmul"
        # (agreement ~3e-7 rel; decision-identical), ~2.8x faster end to end
        mels = log_mel_batch(y, DEFAULT_MEL, parity=True, backend=backend)
        z = enc.apply(params, mel_to_encoder_input(mels))["mu"]
        detected, winner, best = radial_decide(z, centroids, thresholds, ranks)
        # scalar digest so each timed iteration does a real device->host
        # roundtrip (async dispatch otherwise just queues work)
        return jnp.sum(best) + jnp.sum(winner)

    a = jnp.asarray(audio[:batch])
    float(pipeline(params, a))  # compile + warm

    # 2-deep pipelined serving: dispatch batch i+1 before fetching batch i's
    # scalar digest, so device compute overlaps the host roundtrip (each
    # digest is still a real device->host fetch — async dispatch alone would
    # just queue work and lie)
    iters = 0
    t0 = time.perf_counter()
    prev = pipeline(params, a)
    while True:
        cur = pipeline(params, a)
        float(prev)
        prev = cur
        iters += 1
        if time.perf_counter() - t0 >= MEASURE_SECONDS and iters >= 3:
            break
    float(prev)
    iters += 1
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_reference_style_cpu(audio: np.ndarray, n_chunks: int) -> float:
    """Single-file loop, NumPy mel + torch conv encoder on CPU — the
    reference's execution architecture timed on this host."""
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
    from reference_dsp import wav_to_mel_np  # independent numpy librosa-math oracle

    import torch

    from anuraxla.models.ingest import torch_twin_encoder
    from anuraxla.models.vae import VAEConfig

    twin = torch_twin_encoder(VAEConfig()).eval()
    t0 = time.perf_counter()
    with torch.no_grad():
        for i in range(n_chunks):
            mel = wav_to_mel_np(
                audio[i], 48_000, SECONDS_PER_CHUNK, 64, 150.0, 15_000.0, 384, 2048, 192
            )  # [M, T]
            x = torch.from_numpy(np.ascontiguousarray(mel.T, dtype=np.float32))[None, :, :, None]
            twin(x.permute(0, 3, 1, 2))
    return n_chunks / (time.perf_counter() - t0)


def main() -> None:
    from anuraxla.constants import DEFAULT_MEL

    audio = make_audio(BATCH_CANDIDATES[0], DEFAULT_MEL.num_samples)

    tpu_rate = None
    for batch in BATCH_CANDIDATES:
        for backend in ("pallas", "matmul"):  # pallas kernel first; XLA fallback
            try:
                tpu_rate = bench_tpu_pipeline(audio, batch, backend=backend)
                break
            except Exception as e:  # HBM/compile limits -> fallback
                print(
                    f"# batch {batch} backend {backend} failed ({type(e).__name__}), "
                    "retrying", file=sys.stderr,
                )
        if tpu_rate is not None:
            break
    if tpu_rate is None:
        raise SystemExit("all batch sizes failed")

    try:
        base_rate = bench_reference_style_cpu(audio, BASELINE_CHUNKS)
    except Exception:
        base_rate = float("nan")

    vs = tpu_rate / base_rate if base_rate == base_rate and base_rate > 0 else None
    print(
        json.dumps(
            {
                "metric": "chunks_encoded_detected_per_sec_per_chip",
                "value": round(tpu_rate, 1),
                "unit": "chunks/s",
                "vs_baseline": (round(vs, 1) if vs is not None else None),
            }
        )
    )


if __name__ == "__main__":
    main()
