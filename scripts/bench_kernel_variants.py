"""Sweep mel-kernel grid-step amortization variants on the real chip.

The r2 stage split put the CT mel kernel at ~35 ms of the 41 ms parity
pipeline at B=1024, with per-step cost ≈ 7 µs ≈ MXU 2.9 + VPU 1.7 + ~2.4
fixed (docs/KERNELS.md "Where the remaining time goes"). The knobs here
attack the fixed term: bigger frame tiles (tile_t — 626 real frames make
320 the padding-free sweet spot: 2 tiles of 320 = 640 = same 2% waste as
5×128) and batch-row blocking (row_block — pure amortization, no padding).

Usage (ONE process; first compile through the relay is slow):
    python scripts/bench_kernel_variants.py [--batch 1024] [--measure-s 4]

Prints one JSON line per variant: config, ms/batch, chunks/s, and max
relative error vs the (128,1) baseline kernel on a shared small input.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--measure-s", type=float, default=4.0)
    p.add_argument("--exact", action="store_true", default=True)
    p.add_argument("--bf16", action="store_true", help="also run exact=False per variant")
    p.add_argument(
        "--variants", type=str,
        default="128x1x0,128x1x1,128x4x0,128x4x1,128x8x1,128x2x1",
        help="comma list of tile_tXrow_blockXfused(0/1); fused defaults 1 "
        "when the third field is omitted",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from anuraxla.constants import DEFAULT_MEL
    from anuraxla.ops.pallas_frontend import mel_power_pallas

    cfg = DEFAULT_MEL
    T = cfg.total_frames  # 626 at defaults — the librosa-parity frame count
    B = args.batch
    rng = np.random.default_rng(0)
    audio = jnp.asarray((0.1 * rng.standard_normal((B, cfg.num_samples))).astype(np.float32))
    small = audio[:16]
    print(f"# device={jax.devices()[0]} B={B} frames={T}", flush=True)

    def build(tile_t, rb, fused, exact):
        @jax.jit
        def fn(y):
            S = mel_power_pallas(
                y, cfg, num_frames=T, exact=exact, algorithm="ct",
                tile_t=tile_t, row_block=rb, fused_dots=fused,
            )
            return jnp.sum(S)  # scalar digest -> real device->host fetch

        return fn

    @jax.jit
    def ref_small(y):
        return mel_power_pallas(y, cfg, num_frames=T, exact=True, algorithm="ct",
                                fused_dots=False)

    ref = np.asarray(ref_small(small))
    scale = np.abs(ref).max()

    def measure(fn):
        float(fn(audio))  # compile + warm
        iters = 0
        t0 = time.perf_counter()
        prev = fn(audio)
        while True:
            cur = fn(audio)
            float(prev)
            prev = cur
            iters += 1
            if time.perf_counter() - t0 >= args.measure_s and iters >= 3:
                break
        float(prev)
        iters += 1
        dt = time.perf_counter() - t0
        return dt / iters * 1e3, B * iters / dt

    for spec in args.variants.split(","):
        parts = [int(v) for v in spec.strip().split("x")]
        tile_t, rb = parts[0], parts[1]
        fused = bool(parts[2]) if len(parts) > 2 else True
        modes = [True] + ([False] if args.bf16 else [])
        for exact in modes:
            try:
                fn = build(tile_t, rb, fused, exact)
                # correctness vs baseline on the shared small input
                got = np.asarray(
                    jax.jit(
                        lambda y, tt=tile_t, r=rb, fu=fused, e=exact: mel_power_pallas(
                            y, cfg, num_frames=T, exact=e, algorithm="ct",
                            tile_t=tt, row_block=r, fused_dots=fu,
                        )
                    )(small)
                )
                err = float(np.abs(got - ref).max() / scale)
                ms, rate = measure(fn)
                print(json.dumps({
                    "tile_t": tile_t, "row_block": rb, "fused": fused,
                    "exact": exact,
                    "ms_per_batch": round(ms, 2), "chunks_per_s": round(rate, 1),
                    "max_rel_err_vs_baseline": err,
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "tile_t": tile_t, "row_block": rb, "fused": fused,
                    "exact": exact,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }), flush=True)


if __name__ == "__main__":
    main()
