"""On-chip A/B: staged vs interleaved inner/outer emission in the CT mel
kernels, plus the resulting full-pipeline headline.

Usage: python scripts/probe_interleave.py [--batch 1024] [--measure-s 4]
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

    ref = None
    for il in (False, True):
        @jax.jit
        def melpow(y, il=il):
            scale = rms_scale_batch(y)
            S = mel_power_pallas(
                y, cfg, num_frames=cfg.total_frames, exact=True,
                algorithm="ct", rms_scale=scale, interleave=il,
            )
            return jnp.sum(S)

        # bitwise agreement check (same math, different emission order —
        # f32 adds reassociate nowhere, so results must be identical)
        @jax.jit
        def melfull(y, il=il):
            return mel_power_pallas(
                y, cfg, num_frames=cfg.total_frames, exact=True,
                algorithm="ct", interleave=il,
            )

        small = np.asarray(melfull(audio[:16]))
        if ref is None:
            ref = small
            agree = True
        else:
            agree = bool(np.array_equal(ref, small))
        ms = measure_ms(melpow, audio, args.measure_s)
        print(
            json.dumps(
                {"variant": f"melpow-interleave={il}", "ms_per_batch": round(ms, 2),
                 "chunks_per_s": round(B / ms * 1e3, 1), "bitwise_vs_staged": agree}
            ),
            flush=True,
        )

    # full parity pipeline with the (default) interleaved kernel
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

    ms = measure_ms(full, audio, args.measure_s)
    print(
        json.dumps(
            {"variant": "full-interleaved", "ms_per_batch": round(ms, 2),
             "chunks_per_s": round(B / ms * 1e3, 1)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
