"""On-chip VAE TRAIN-step throughput probe (round 4).

Everything serving-side is benchmarked to death (bench.py, the stage
probes); training throughput on the chip was never measured — the demo
trains on the 1-core host because the conv-transpose backward's REMOTE
compile costs minutes through the relay (verify-skill note). This probe
pays that compile once per batch size and then times the steady state,
so a deployment can decide where training belongs.

Protocol: state threads through the jitted step (donated — training is
in-place on device), so steps serialize on-device by data dependence;
we fetch one loss scalar per GROUP steps (the relay's ~28 ms RTT
amortizes, same scheme as scripts/_probe_common.py). Compile time is
reported separately — through the relay it is minutes and would swamp
any steps/s number it was averaged into.

Usage: python scripts/probe_train.py [--batches 64,256] [--steps 40]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GROUP = 8


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="64,256")
    p.add_argument("--steps", type=int, default=40, help="timed steps per batch size")
    p.add_argument("--cpu", action="store_true", help="force CPU (smoke test)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from anuraxla.models.train import TrainConfig, create_train_state, make_train_step
    from anuraxla.models.vae import VAEConfig

    cfg, tc = VAEConfig(), TrainConfig()
    T, M = cfg.input_hw
    dev = jax.devices()[0]
    print(f"# device={dev} arch={cfg.widths} latent={cfg.latent_dim}", flush=True)

    rng_np = np.random.default_rng(0)
    for B in [int(b) for b in args.batches.split(",")]:
        vae, state = create_train_state(cfg, tc)
        step = jax.jit(
            make_train_step(vae, tc.beta, tc.kl_warmup_steps, tc.kl_delay_steps),
            donate_argnums=0,
        )
        batch = jnp.asarray(rng_np.standard_normal((B, T, M, 1)).astype(np.float32))
        rng = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        try:
            state, metrics = step(state, batch, rng)
            first_loss = float(metrics["loss"])  # forces the full compile + step
        except Exception as e:  # noqa: BLE001 — report OOM/compile failure as data
            print(json.dumps({"batch": B, "error": f"{type(e).__name__}: {e}"[:300]}))
            continue
        compile_s = time.perf_counter() - t0

        n = args.steps
        t0 = time.perf_counter()
        done = 0
        while done < n:
            g = min(GROUP, n - done)
            for _ in range(g):
                state, metrics = step(state, batch, rng)
            float(metrics["loss"])  # one fetch per group: serializes the chain
            done += g
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "batch": B,
                    "ms_per_step": round(1e3 * dt / n, 2),
                    "steps_per_s": round(n / dt, 2),
                    "chunks_per_s": round(B * n / dt, 1),
                    "compile_s": round(compile_s, 1),
                    "first_loss": round(first_loss, 4),
                    "final_loss": round(float(metrics["loss"]), 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
