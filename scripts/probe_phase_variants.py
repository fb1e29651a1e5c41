"""On-chip sweep of phase-kernel variants under the pre-padded regime:
fused_dots x row_block, melpow-only (pre-padded input, fused RMS slice-scale).

Usage: python scripts/probe_phase_variants.py [--batch 1024] [--measure-s 4]
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
    from anuraxla.ops.frontend import rms_scale_batch
    from anuraxla.ops.pallas_frontend import mel_power_pallas, phase_padded_layout

    cfg = DEFAULT_MEL
    B = args.batch
    T = cfg.total_frames
    rng = np.random.default_rng(0)
    raw = (0.1 * rng.standard_normal((B, cfg.num_samples))).astype(np.float32)
    L_pad, pad_l = phase_padded_layout(cfg, T)
    host = np.zeros((B, L_pad), np.float32)
    host[:, pad_l : pad_l + cfg.num_samples] = raw
    y = jnp.asarray(host)
    print(f"# device={jax.devices()[0]} B={B} pre_padded", flush=True)

    ref = None
    for fused in (False, True):
        for rb in (2, 4, 8):
            def mk(fused=fused, rb=rb):
                @jax.jit
                def melpow(y):
                    valid = jax.lax.slice_in_dim(
                        y, pad_l, pad_l + cfg.num_samples, axis=1
                    )
                    scale = rms_scale_batch(valid)
                    S = mel_power_pallas(
                        y, cfg, num_frames=T, exact=True, algorithm="ct",
                        rms_scale=scale, pre_padded=True,
                        fused_dots=fused, row_block=rb,
                    )
                    return jnp.sum(S)

                @jax.jit
                def melfull(y):
                    return mel_power_pallas(
                        y, cfg, num_frames=T, exact=True, algorithm="ct",
                        pre_padded=True, fused_dots=fused, row_block=rb,
                    )

                return melpow, melfull

            try:
                melpow, melfull = mk()
                small = np.asarray(melfull(y[:16]))
                if ref is None:
                    ref = small
                err = float(
                    np.abs(small - ref).max() / (np.abs(ref).max() + 1e-30)
                )
                ms = measure_ms(melpow, y, args.measure_s)
                print(json.dumps({
                    "variant": f"fused={fused} rb={rb}",
                    "ms_per_batch": round(ms, 2),
                    "chunks_per_s": round(B / ms * 1e3, 1),
                    "max_rel_err_vs_first": err,
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "variant": f"fused={fused} rb={rb}",
                    "error": f"{type(e).__name__}: {str(e)[:120]}",
                }), flush=True)


if __name__ == "__main__":
    main()
