"""Worker process for the 2-process jax.distributed CPU cluster test
(tests/test_parallel.py::test_multihost_two_process_cpu_cluster).

Modes:
    python tests/multihost_worker.py cluster <port> <pid> <nprocs> <out.json>
        Initialize jax.distributed against a localhost coordinator and run
        the REAL multihost helpers + sharded fits over the cross-process
        global mesh; dump results as JSON for the parent to compare.
    python tests/multihost_worker.py degrade <out.json>
        Call initialize_multihost() with no arguments off-cluster — the
        documented single-host degrade path (broad except -> False) that the
        in-suite tests could never reach before.

Forces the CPU backend post-import (this container's axon TPU plugin must
not have two processes racing to claim the one chip; JAX_PLATFORMS env is
ignored once the plugin registers — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def encode_fixture():
    """Deterministic tiny serving fixture shared by the cluster workers and
    the parent test's single-process oracle: (mel, encoder, params, audio).
    The audio batch is sized 2 rows per process at the largest cluster the
    suite spawns (4), so the 'data' axis always divides it."""
    import jax  # noqa: F401  (flax init needs an initialized backend)

    from anuraxla.constants import MelConfig
    from anuraxla.models.vae import VAEConfig, init_encoder

    mel = MelConfig(duration=0.25, target_frames=32, n_mels=32, sr=16000,
                    fmax=7000)
    cfg = VAEConfig(latent_dim=16, widths=(8, 16), dense_width=32, groups=4,
                    input_hw=(32, 32))
    enc, params = init_encoder(cfg, seed=0)
    audio = 0.1 * np.random.default_rng(1).standard_normal(
        (8, mel.num_samples)).astype(np.float32)
    return mel, enc, params, audio


def run_degrade(out_path: str) -> None:
    jax = _force_cpu()
    from anuraxla.parallel.multihost import initialize_multihost

    ok = initialize_multihost()  # no coordinator, no cluster env -> False
    with open(out_path, "w") as f:
        json.dump(
            {"initialized": bool(ok), "process_count": jax.process_count()}, f
        )


def run_cluster(port: int, pid: int, nprocs: int, out_path: str) -> None:
    jax = _force_cpu()
    from jax.sharding import NamedSharding, PartitionSpec as P

    from anuraxla.parallel.fit import fit_map_sharded, fit_radial_sharded
    from anuraxla.parallel.multihost import (
        global_mesh,
        initialize_multihost,
        shard_paths_for_host,
    )

    ok = initialize_multihost(
        f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    res: dict = {
        "initialized": bool(ok),
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "num_global_devices": len(jax.devices()),
        "num_local_devices": len(jax.local_devices()),
    }
    mesh = global_mesh()
    res["mesh_shape"] = {k: int(v) for k, v in mesh.shape.items()}
    res["shard"] = [str(p) for p in shard_paths_for_host([f"f{i:03d}.wav" for i in range(11)])]

    def fetch(x):
        # force full replication over the global mesh so every process can
        # read the value (np.asarray on a partially-addressable array fails)
        return np.asarray(
            jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))(x)
        )

    # deterministic pool, identical on both processes; the fits shard it
    # over the cross-process 'data' axis, so the Gram/count psums and the
    # quantile sort really cross the process boundary
    rng = np.random.default_rng(7)
    K, N, D = 3, 32, 6
    Z = rng.normal(size=(K, N, D)).astype(np.float32)
    mask = np.ones((K, N), bool)
    mask[1, 28:] = False

    mfit = fit_map_sharded(
        Z, mask, mesh=mesh, cov_type="lda", cov_structure="full",
        priors_mode="empirical", eps=1e-6, shrink=0.0, tau_q=0.1,
    )
    res["map_means"] = fetch(mfit.means).tolist()
    res["map_logdets"] = fetch(mfit.logdets).tolist()
    res["map_priors"] = fetch(mfit.priors).tolist()
    res["map_tau"] = float(fetch(mfit.tau))

    rfit = fit_radial_sharded(Z, mask, 0.9, 0.2, mesh=mesh)
    res["radial_centroids"] = fetch(rfit.centroids).tolist()
    res["radial_rk"] = fetch(rfit.rk).tolist()
    res["radial_rk_in"] = fetch(rfit.rk_in).tolist()
    res["radial_rk_out"] = fetch(rfit.rk_out).tolist()

    # the SERVING path across real process boundaries: mesh-sharded raw
    # audio -> log-mel -> encoder forward (parallel/encode.make_sharded_encode
    # — the --data-parallel production path). Each process feeds the same
    # global batch; jit shards it over the cross-process 'data' axis, so the
    # rows this process computes live on its device and the rows it reads
    # back were computed by its peers.
    from anuraxla.parallel.encode import make_sharded_encode

    smel, senc, sparams, audio = encode_fixture()
    sharded_encode = make_sharded_encode(mesh, senc.apply, smel)
    # multi-process jit refuses numpy args under a non-trivial sharding
    # (it cannot know the host copies agree); make_array_from_callback
    # builds the global batch-sharded array from the identical host copy
    batch_sh = NamedSharding(mesh, P("data"))
    g_audio = jax.make_array_from_callback(
        audio.shape, batch_sh, lambda idx: audio[idx]
    )
    z = sharded_encode(sparams, g_audio)
    res["encode_z"] = fetch(z).tolist()

    with open(out_path, "w") as f:
        json.dump(res, f)


def main() -> None:
    mode = sys.argv[1]
    if mode == "degrade":
        run_degrade(sys.argv[2])
    elif mode == "cluster":
        run_cluster(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
