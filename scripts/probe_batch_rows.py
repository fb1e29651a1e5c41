"""On-chip A/B for the batched-rows phase kernel (r4): ONE inner+outer
stage over all row_block rows ([rb*128,128] MXU dots) vs the per-r_i loop
([128,128] dots, rb weight reloads per grid step).

The r4 ablation probe showed the kernel is MXU-pass-bound (mxu-floor
skeleton ~7.8 ms vs ~21.5 baseline at B=1024, docs/KERNELS.md), so
weight-load amortization via taller LHS tiles is the identified lever. Output is bitwise identical by
construction (row-independent math); this probe re-verifies that on real
Mosaic before timing.

Protocol: the plain rb=8 production baseline is measured FIRST and LAST
(relay drift brackets every batched variant); each variant reports vs the
mean of the two.

Usage: python scripts/probe_batch_rows.py [--batch 1024] [--measure-s 4]
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
    print(f"# device={jax.devices()[0]} B={B} pre_padded fused-RMS", flush=True)

    def mk(batch_rows, rb):
        @jax.jit
        def melpow(y):
            valid = jax.lax.slice_in_dim(y, pad_l, pad_l + cfg.num_samples, axis=1)
            scale = rms_scale_batch(valid)
            S = mel_power_pallas(
                y, cfg, num_frames=T, exact=True, algorithm="ct",
                rms_scale=scale, pre_padded=True, row_block=rb,
                batch_rows=batch_rows,
            )
            return jnp.sum(S)

        @jax.jit
        def melfull(y):
            return mel_power_pallas(
                y, cfg, num_frames=T, exact=True, algorithm="ct",
                pre_padded=True, row_block=rb, batch_rows=batch_rows,
            )

        return melpow, melfull

    # warm leg: absorb process/link warmup outside any reported number
    warm, _ = mk(False, 8)
    measure_ms(warm, y, 1.0)

    ref = None
    results = {}
    variants = [
        ("plain rb=8 (open)", False, 8),
        ("batched rb=2", True, 2),
        ("batched rb=4", True, 4),
        ("batched rb=8", True, 8),
        ("plain rb=8 (close)", False, 8),
    ]
    for name, batched, rb in variants:
        try:
            melpow, melfull = mk(batched, rb)
            small = np.asarray(melfull(y[:16]))
            if ref is None:
                ref = small
            bitwise = bool(np.array_equal(small, ref))
            ms = measure_ms(melpow, y, args.measure_s)
            results[name] = ms
            print(json.dumps({
                "variant": name,
                "ms_per_batch": round(ms, 2),
                "chunks_per_s": round(B / ms * 1e3, 1),
                "bitwise_vs_plain": bitwise,
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "variant": name,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)

    opens = results.get("plain rb=8 (open)")
    close = results.get("plain rb=8 (close)")
    if opens and close:
        base = (opens + close) / 2
        for name, ms in results.items():
            if name.startswith("batched"):
                print(json.dumps({
                    "variant": name + " vs bracketed baseline",
                    "speedup": round(base / ms, 3),
                }), flush=True)


if __name__ == "__main__":
    main()
