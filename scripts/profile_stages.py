"""Current stage split of the parity pipeline on the real chip.

Times, in ONE process with the same grouped-fetch pipelining as bench.py
(8 dispatches per device->host digest fetch, 2-deep pipelined), each stage
of the production path at B=1024:

    full      rms_scale -> phase-CT mel (fused scale) -> dB/std/crop ->
              encoder -> radial detect       (bench.py's jit)
    melpow    fused-scale phase-CT mel power kernel only
    frontend  melpow + dB/standardize/crop epilogue (log_mel_batch)
    encoder   conv VAE encode on a precomputed mel batch
    detect    radial decide on a precomputed latent batch

Prints one JSON line per stage: ms/batch and chunks/s. The differences
between lines are the per-stage device costs (the relay RTT amortizes to
~RTT/8 and cancels in differences).

Usage: python scripts/profile_stages.py [--batch 1024] [--measure-s 4]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _probe_common import measure_ms  # noqa: E402  (adds repo root to sys.path)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--measure-s", type=float, default=4.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from anuraxla.constants import DEFAULT_MEL
    from anuraxla.detect.radial import radial_decide
    from anuraxla.models.vae import VAEConfig, init_encoder
    from anuraxla.ops.frontend import (
        log_mel_batch,
        mel_to_encoder_input,
        rms_scale_batch,
    )
    from anuraxla.ops.pallas_frontend import mel_power_pallas

    cfg = DEFAULT_MEL
    B = args.batch
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (0.1 * rng.standard_normal((B, cfg.num_samples))).astype(np.float32)
    )
    print(f"# device={jax.devices()[0]} B={B}", flush=True)

    vcfg = VAEConfig()
    enc, params = init_encoder(vcfg, seed=0)
    K = 4
    rngk = np.random.default_rng(1)
    centroids = jnp.asarray(rngk.standard_normal((K, vcfg.latent_dim)), jnp.float32)
    thresholds = jnp.asarray(np.full(K, 3.0), jnp.float32)
    ranks = jnp.asarray(np.arange(K), jnp.float32)

    @jax.jit
    def full(y):
        scale = rms_scale_batch(y)
        mels = log_mel_batch(y, cfg, parity=True, backend="pallas", rms_scale=scale)
        z = enc.apply(params, mel_to_encoder_input(mels))["mu"]
        detected, winner, best = radial_decide(z, centroids, thresholds, ranks)
        return jnp.sum(best) + jnp.sum(winner)

    @jax.jit
    def melpow(y):
        scale = rms_scale_batch(y)
        S = mel_power_pallas(
            y, cfg, num_frames=cfg.total_frames, exact=True, algorithm="ct",
            rms_scale=scale,
        )
        return jnp.sum(S)

    @jax.jit
    def frontend(y):
        scale = rms_scale_batch(y)
        mels = log_mel_batch(y, cfg, parity=True, backend="pallas", rms_scale=scale)
        return jnp.sum(mels)

    mels_const = jax.block_until_ready(
        log_mel_batch(audio, cfg, parity=True, backend="pallas")
    )
    x_const = jax.block_until_ready(mel_to_encoder_input(mels_const))
    z_const = jax.block_until_ready(enc.apply(params, x_const)["mu"])

    @jax.jit
    def encoder(x):
        return jnp.sum(enc.apply(params, x)["mu"])

    @jax.jit
    def detect(z):
        detected, winner, best = radial_decide(z, centroids, thresholds, ranks)
        return jnp.sum(best) + jnp.sum(winner)

    for name, fn, arg in (
        ("full", full, audio),
        ("melpow", melpow, audio),
        ("frontend", frontend, audio),
        ("encoder", encoder, x_const),
        ("detect", detect, z_const),
    ):
        ms = measure_ms(fn, arg, args.measure_s)
        print(
            json.dumps(
                {"stage": name, "ms_per_batch": round(ms, 2),
                 "chunks_per_s": round(B / ms * 1e3, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
