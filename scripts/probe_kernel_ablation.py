"""On-chip op-class cost study for the phase-assembled CT mel kernel.

The round-3 hand count attributed the kernel's 4.5 us/step (vs a ~2.9 us
3-pass MXU floor) to ~240 VPU [128x128]-block-ops per grid step: inner DFT
~111, bf16 splits ~75, window+power ~43. This probe replaces that arithmetic
with hardware evidence: it measures melpow time with ONE op class ablated at
a time (mel_power_pallas(ablate=...) — PROFILING ONLY, wrong output) so each
class's cost is a measured delta against the intact kernel in the SAME
process (relay variance cancels in the deltas).

Classes: splits (bf16 hi/lo split converts), dots (3-pass -> 1-pass MXU),
power (square-add), fb (filterbank split+dots), inner (inner-DFT combines),
window (Hann multiply). 'mxu-floor' = dots+splits+power+fb+inner+window:
one bf16 pass per logical matmul and nothing else — the empirical issue
floor of the matmul skeleton.

Usage: python scripts/probe_kernel_ablation.py [--batch 1024] [--measure-s 4]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _probe_common import measure_ms  # noqa: E402  (adds repo root to sys.path)

VARIANTS = [
    ("baseline", ()),
    ("no-splits", ("splits",)),
    ("no-dots(1-pass)", ("dots",)),
    ("no-power", ("power",)),
    ("no-fb", ("fb",)),
    ("no-inner", ("inner",)),
    ("no-window", ("window",)),
    ("no-shifts", ("shifts",)),
    ("mxu-floor", ("splits", "dots", "power", "fb", "inner", "window")),
    ("baseline-close", ()),
]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--measure-s", type=float, default=4.0)
    p.add_argument("--row-block", type=int, default=8)
    p.add_argument("--bf16", action="store_true", help="exact=False variants")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from anuraxla.constants import DEFAULT_MEL
    from anuraxla.ops.pallas_frontend import mel_power_pallas, phase_padded_layout

    cfg = DEFAULT_MEL
    B = args.batch
    T = cfg.total_frames
    exact = not args.bf16
    rng = np.random.default_rng(0)
    raw = (0.1 * rng.standard_normal((B, cfg.num_samples))).astype(np.float32)
    L_pad, pad_l = phase_padded_layout(cfg, T)
    host = np.zeros((B, L_pad), np.float32)
    host[:, pad_l : pad_l + cfg.num_samples] = raw
    y = jnp.asarray(host)
    print(
        f"# device={jax.devices()[0]} B={B} rb={args.row_block} "
        f"exact={exact} pre_padded",
        flush=True,
    )

    def mk(ablate):
        @jax.jit
        def melpow(y):
            S = mel_power_pallas(
                y, cfg, num_frames=T, exact=exact, algorithm="ct",
                pre_padded=True, row_block=args.row_block, ablate=ablate,
            )
            return jnp.sum(S)

        return melpow

    # warm leg: the first measured variant otherwise absorbs process/link
    # warmup (the r4 first run's baseline read 454 ms against a true ~23)
    measure_ms(mk(()), y, 1.0)

    measured = []
    for name, ablate in VARIANTS:
        try:
            ms = measure_ms(mk(ablate), y, args.measure_s)
            measured.append((name, ms))
            print(json.dumps({"variant": name, "ms_per_batch": round(ms, 2)}),
                  flush=True)
        except Exception as e:
            print(
                json.dumps(
                    {"variant": name, "error": f"{type(e).__name__}: {str(e)[:160]}"}
                ),
                flush=True,
            )

    # deltas vs the open/close baseline bracket (relay drift shows up as
    # the spread between the two)
    base = [ms for n, ms in measured if n.startswith("baseline")]
    if len(base) == 2:
        bm = sum(base) / 2
        print(json.dumps({"baseline_bracket_ms": [round(b, 2) for b in base]}),
              flush=True)
        for name, ms in measured:
            if not name.startswith("baseline"):
                print(json.dumps({
                    "variant": name,
                    "delta_ms_vs_baseline": round(bm - ms, 2),
                    "pct_of_baseline": round((bm - ms) / bm * 100, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
