"""On-chip probes: where does the encoder's ~5 ms/batch go, and what would
the full pipeline gain from encoder compute-dtype / norm changes.

Variants (B=1024, [B,192,64,1] NHWC input):
    f32            VAEConfig() as benched (GroupNorm, f32 compute)
    bf16           dtype=bfloat16 compute (params stay f32)
    f32-nonorm     norm='none' (isolates GroupNorm's HBM passes)
    bf16-nonorm    both
    full-bf16enc   the bench.py pipeline with the bf16-compute encoder

Usage: python scripts/probe_encoder.py [--batch 1024] [--measure-s 4]
"""

from __future__ import annotations

import argparse
import dataclasses
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

    B = args.batch
    cfg = DEFAULT_MEL
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (0.1 * rng.standard_normal((B, cfg.num_samples))).astype(np.float32)
    )
    x = jax.block_until_ready(
        mel_to_encoder_input(log_mel_batch(audio, cfg, parity=True, backend="pallas"))
    )
    print(f"# device={jax.devices()[0]} B={B}", flush=True)

    variants = {
        "f32": VAEConfig(),
        "bf16": VAEConfig(dtype=jnp.bfloat16),
        "f32-nonorm": VAEConfig(norm="none"),
        "bf16-nonorm": VAEConfig(dtype=jnp.bfloat16, norm="none"),
    }
    z_ref = None
    for name, vcfg in variants.items():
        enc, params = init_encoder(dataclasses.replace(vcfg), seed=0)

        @jax.jit
        def encf(x, enc=enc, params=params):
            return jnp.sum(enc.apply(params, x)["mu"].astype(jnp.float32))

        ms = measure_ms(encf, x, args.measure_s)
        # latent drift vs the f32 GroupNorm baseline (same seed/params where
        # comparable — nonorm variants have different param trees, skip)
        drift = None
        if name in ("f32", "bf16"):
            z = np.asarray(
                jax.jit(lambda x, e=enc, p=params: e.apply(p, x)["mu"].astype(jnp.float32))(x[:64])
            )
            if z_ref is None:
                z_ref = z
            drift = float(
                np.abs(z - z_ref).max() / (np.abs(z_ref).max() + 1e-30)
            )
        print(
            json.dumps(
                {"variant": name, "ms_per_batch": round(ms, 2),
                 "chunks_per_s": round(B / ms * 1e3, 1),
                 "max_rel_drift_vs_f32": drift}
            ),
            flush=True,
        )

    # full pipeline with the bf16-compute encoder — the headline effect
    vcfg = VAEConfig(dtype=jnp.bfloat16)
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
        z = enc.apply(params, mel_to_encoder_input(mels))["mu"].astype(jnp.float32)
        detected, winner, best = radial_decide(z, centroids, thresholds, ranks)
        return jnp.sum(best) + jnp.sum(winner)

    ms = measure_ms(full, audio, args.measure_s)
    print(
        json.dumps(
            {"variant": "full-bf16enc", "ms_per_batch": round(ms, 2),
             "chunks_per_s": round(B / ms * 1e3, 1)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
