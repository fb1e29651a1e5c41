"""``run-qout-grid`` — the q_out calibration grid with per-run snapshots
(reference ``run_qout_grid.sh`` + ``9200_run_qout_grid_with_snapshot.py`` +
``scripts/04_calibrate_qout_grid.sh`` rolled into one in-process tool).

Per q_out value it: refits the radial detector on the train tree, benchmarks
the val tree, and writes the full reference artifact set into
<grid_root>/qout_<q>/ — run.log, summary.txt, results.csv, the 4 PNGs,
config_used.json, config_snapshot.json. Then (optionally) runs the Spearman
analysis.

Two execution modes:
- default: encode ONCE, then every grid point is an on-device rethreshold +
  batched re-decision — no re-encoding, no subprocesses, no log scraping
  (the reference's 4 full pipeline re-runs collapse into one jit sweep).
- --subprocess-compat: spawn the actual fit/benchmark CLIs per point, byte-
  identical to the reference's operational flow (useful for auditing).
"""

from __future__ import annotations

import argparse
import io
import shutil
import subprocess
import sys
from datetime import datetime
from pathlib import Path

from anuraxla.cli.common import (
    session_kwargs,
    add_batch_args,
    add_device_arg,
    add_encoder_args,
    add_mel_args,
    apply_device,
    mel_from_args,
    project_root_here,
    resolve_config,
    resolve_root_dir,
    resolve_tier_knobs,
)
from anuraxla.config import get_chunk_seconds
from anuraxla.constants import CACHE_DIR_NAME
from anuraxla.pipeline.fit import fit_radial_tree
from anuraxla.pipeline.benchmark import run_folder_benchmark
from anuraxla.pipeline.session import EncoderSession
from anuraxla.utils.io import load_json
from anuraxla.utils.timing import stage_timer


def subprocess_shared_args(args, cfg_path) -> list:
    """The flag set forwarded to every spawned fit/benchmark subprocess in
    --subprocess-compat mode — every parameter that changes results. Kept as
    a function so a test can pin it against add_batch_args/add_mel_args
    (the forwarding silently drifted from the flag surface once already).
    The tier knobs are forwarded RESOLVED (resolve_tier_knobs), so children
    reproduce the parent's operating point exactly regardless of how it was
    spelled (tier vs individual flags)."""
    knobs = resolve_tier_knobs(args)
    shared = [
        "--config", str(cfg_path), "--device", args.device,
        "--sr", str(args.sr), "--n-mels", str(args.n_mels),
        "--target-frames", str(args.target_frames),
        "--fmin", str(args.fmin), "--fmax", str(args.fmax),
        "--hop-length", str(args.hop_length), "--n-fft", str(args.n_fft),
        "--batch-size", str(args.batch_size), "--io-threads", str(args.io_threads),
        "--frontend-backend", knobs["frontend_backend"],
        "--encoder-dtype", knobs["encoder_dtype"],
        "--serving-tier", getattr(args, "serving_tier", "custom"),
    ]
    for flag, on in (
        ("--fast-frontend", knobs["fast_frontend"]),
        ("--transfer-int16", args.transfer_int16),
        ("--quantize-serving", args.quantize_serving),
        ("--data-parallel", args.data_parallel),
    ):
        if on:
            shared.append(flag)
    if args.encoder:
        shared += ["--encoder", args.encoder]
    return shared


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="config.json")
    p.add_argument("--train-root", type=str, default="train_chunks")
    p.add_argument("--val-root", type=str, default="val_chunks")
    p.add_argument("--q-in", type=float, default=0.95)
    p.add_argument("--q-out-grid", type=float, nargs="*", default=[0.10, 0.15, 0.20, 0.25])
    p.add_argument("--max-per-class", type=int, default=400)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--grid-root", type=str, default=None,
                   help="default: <project>/outputs/qout_grid_<YYYYMMDD>")
    p.add_argument("--subprocess-compat", action="store_true")
    p.add_argument("--analyze", action="store_true", help="run spearman analysis at the end")
    p.add_argument("--device-sweep", action="store_true",
                   help="additionally evaluate the FULL (q_in x q_out) grid as "
                   "one on-device sweep (detect.calibrate.radial_qgrid) and "
                   "write grid_metrics.csv — no re-encoding, no per-point refits")
    p.add_argument("--q-in-grid", type=float, nargs="*", default=None,
                   help="q_in values for --device-sweep (default: just --q-in)")
    p.add_argument("--noise-margin-db", type=float, default=None,
                   help="with --device-sweep: also evaluate the grid on "
                   "noise-injected val latents at this SNR (dB) and recommend "
                   "the operating point with the best NOISED accuracy whose "
                   "CLEAN accuracy is within 2 points of the clean optimum — "
                   "q_out calibration with a noise margin")
    p.add_argument("--augment-noise-db", type=str, default=None,
                   help="comma list of SNRs (dB): every fit in this grid "
                   "(per-point refits AND the --device-sweep fit) runs on the "
                   "noise-augmented latent pool, so --noise-margin-db "
                   "rethresholding composes with augmented fits in ONE "
                   "calibration pass (docs/ROBUSTNESS.md)")
    p.add_argument("--noise-seed", type=int, default=0,
                   help="seed for --augment-noise-db / --noise-margin-db injection")
    add_device_arg(p)
    add_mel_args(p)
    add_encoder_args(p)
    add_batch_args(p)
    return p


class Tee(io.TextIOBase):
    def __init__(self, *sinks):
        self.sinks = sinks

    def write(self, s):
        for k in self.sinks:
            k.write(s)
        return len(s)

    def flush(self):
        for k in self.sinks:
            k.flush()


def main() -> None:
    args = build_parser().parse_args()
    apply_device(args.device)
    project_root = project_root_here()
    cfg_path = resolve_config(args.config, project_root)
    train_dir = resolve_root_dir(args.train_root, project_root)
    val_dir = resolve_root_dir(args.val_root, project_root)

    grid_root = (
        Path(args.grid_root).expanduser().resolve()
        if args.grid_root
        else project_root / "outputs" / f"qout_grid_{datetime.now().strftime('%Y%m%d')}"
    )
    grid_root.mkdir(parents=True, exist_ok=True)
    bench_out = project_root / "outputs" / "detection_benchmark"

    print(f"📌 project root: {project_root}")
    print(f"📁 grid root:   {grid_root}")
    print(f"🎯 q_in={args.q_in} | grid={args.q_out_grid} | max_per_class={args.max_per_class}")

    from anuraxla.cli.fit_radial import parse_augment

    augment_db = parse_augment(args.augment_noise_db)
    session = None
    if not args.subprocess_compat:
        cfg0 = load_json(cfg_path)
        session = EncoderSession(
            mel=mel_from_args(args, get_chunk_seconds(cfg0)),
            encoder_dir=Path(args.encoder) if args.encoder else None,
            project_root=project_root,
            noise_seed=args.noise_seed,
            **session_kwargs(args),
        ).load()

    for q_out in args.q_out_grid:
        outdir = grid_root / f"qout_{q_out:.2f}"
        outdir.mkdir(parents=True, exist_ok=True)
        runlog = outdir / "run.log"
        print("=" * 40)
        print(f"▶ q_out={q_out} (q_in={args.q_in}) -> {outdir}")

        with stage_timer(f"grid point q_out={q_out}"):
            if args.subprocess_compat:
                # forward every parameter that changes results, so this mode
                # really reproduces the in-process grid point
                shared = subprocess_shared_args(args, cfg_path)
                fit_extra = (
                    ["--augment-noise-db", args.augment_noise_db,
                     "--noise-seed", str(args.noise_seed)]
                    if args.augment_noise_db else []
                )
                with open(runlog, "w", encoding="utf-8") as lf:
                    for cmd in (
                        [sys.executable, "-m", "anuraxla", "fit-radial",
                         "--root", str(train_dir), "--q-in", str(args.q_in), "--q-out", str(q_out),
                         "--max-per-class", str(args.max_per_class), "--cache",
                         "--seed", str(args.seed)] + fit_extra + shared,
                        [sys.executable, "-m", "anuraxla", "benchmark-folder",
                         "--root", str(val_dir), "--out-dir", str(bench_out)] + shared,
                    ):
                        import os

                        env = dict(os.environ)
                        repo_root = str(Path(__file__).resolve().parents[2])
                        env["PYTHONPATH"] = repo_root + (
                            ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
                        )
                        r = subprocess.run(
                            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True, env=env,
                        )
                        lf.write(r.stdout)
                        sys.stdout.write(r.stdout)
                        if r.returncode != 0:
                            raise SystemExit(f"❌ grid step failed: {' '.join(cmd)}")
            else:
                with open(runlog, "w", encoding="utf-8") as lf:
                    tee = Tee(sys.stdout, lf)
                    log = lambda *a: print(*a, file=tee)  # noqa: E731
                    cfg = load_json(cfg_path)
                    fit_radial_tree(
                        cfg_path=cfg_path, cfg=cfg, chunks_dir=train_dir, session=session,
                        q_in=args.q_in, q_out=q_out, cache=True,
                        cache_dir=project_root / CACHE_DIR_NAME,
                        max_per_class=args.max_per_class, seed=args.seed,
                        augment_noise_db=augment_db, log=log,
                    )
                    run_folder_benchmark(
                        root=val_dir, config_path=cfg_path, detector="radial",
                        session=session, out_dir=bench_out, log=log,
                    )

        # collect artifacts like run_qout_grid.sh:42-50
        for name in ("summary.txt", "results.csv", "confusion_matrix.png",
                     "accuracy_by_class.png", "no_detect_rate_by_class.png",
                     "global_counts.png"):
            src = bench_out / name
            if src.exists():
                shutil.copyfile(src, outdir / name)
        shutil.copyfile(cfg_path, outdir / "config_used.json")

        from anuraxla.cli.snapshot_from_log import write_snapshot

        snap = write_snapshot(runlog, outdir / "config_snapshot.json", args.q_in, q_out)
        if not snap["rk_per_species"]:
            print("⚠️ snapshot has no rk values — fit log format changed?")
        print(f"✅ saved -> {outdir}")

    if args.device_sweep:
        if args.subprocess_compat:
            print("⚠️ --device-sweep needs the in-process session; skipping")
        else:
            _device_sweep(args, session, cfg_path, train_dir, val_dir, grid_root, project_root)

    if args.analyze:
        from anuraxla.cli.spearman_analysis import analyze_grid

        analyze_grid(grid_root)


def _device_sweep(args, session, cfg_path, train_dir, val_dir, grid_root, project_root):
    """Encode train (cached) + val once, then evaluate every (q_in, q_out)
    pair in a single jit — the sweep the reference approximates with one full
    pipeline re-run per point."""
    import csv

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anuraxla.cli.fit_radial import parse_augment
    from anuraxla.config import priority_ranks, require_species
    from anuraxla.detect.calibrate import radial_qgrid
    from anuraxla.pipeline.fit import _fit_radial_dispatch, encode_augmented_tree
    from anuraxla.pipeline.session import (
        concat_species_latents,
        encode_species_tree,
        pad_species_latents,
    )

    cfg = load_json(cfg_path)
    species_all = require_species(cfg)
    # the sweep's fit pool honors --augment-noise-db, so the noise-margin
    # recommendation below operates over AUGMENTED fits — the two robustness
    # tools compose in one calibration pass (VERDICT r4 item 4)
    augment_db = parse_augment(args.augment_noise_db)
    Z_by, _, _ = encode_augmented_tree(
        session, train_dir, species_all, augment_noise_db=augment_db,
        cache=True, cache_dir=project_root / CACHE_DIR_NAME,
        max_per_class=args.max_per_class, seed=args.seed, log=lambda *a: None,
    )
    species, Z, mask = pad_species_latents(Z_by)
    # sample-sharded fit when the session is data-parallel (parallel.fit)
    fit = _fit_radial_dispatch(session, Z, mask, args.q_in, args.q_out_grid[0])

    Zv_by, _, _ = encode_species_tree(
        session, val_dir, species, cache=False, cache_dir=None,
        max_per_class=0, seed=args.seed, log=lambda *a: None,
    )
    Zv, true_idx = concat_species_latents(Zv_by, species)

    # data-parallel serving: the sweep's decide stage runs SPMD with the val
    # latents batch-sharded over the mesh (pad rows masked out of the metrics)
    valid = None
    if session.data_parallel and len(jax.devices()) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from anuraxla.parallel.mesh import make_mesh, pad_to_multiple

        mesh = make_mesh()
        n_data = mesh.shape["data"]
        B = Zv.shape[0]
        Zv, _ = pad_to_multiple(Zv, n_data)
        true_idx, _ = pad_to_multiple(true_idx, n_data)
        valid = jax.device_put(
            np.arange(Zv.shape[0]) < B, NamedSharding(mesh, P("data"))
        )
        Zv = jax.device_put(Zv, NamedSharding(mesh, P("data")))
        true_idx = jax.device_put(true_idx, NamedSharding(mesh, P("data")))
        print(f"🕸️ device sweep sharded over {n_data} chips (B={B})")

    q_in_grid = args.q_in_grid if args.q_in_grid else [args.q_in]
    ranks = jnp.asarray(priority_ranks(species))
    with stage_timer(f"device sweep {len(q_in_grid)}x{len(args.q_out_grid)} grid"):
        gm = radial_qgrid(
            fit, jnp.asarray(Zv), jnp.asarray(true_idx),
            ranks,
            np.asarray(q_in_grid, np.float32), np.asarray(args.q_out_grid, np.float32),
            valid,
        )
    acc = np.asarray(gm.accuracy)
    nod = np.asarray(gm.no_detect_rate)
    accp = np.asarray(gm.acc_per_class)
    nodp = np.asarray(gm.no_detect_per_class)

    acc_nz = nod_nz = None
    if args.noise_margin_db is not None:
        # same fit, noised evaluation latents: the noise-margin half of the
        # operating-point recipe (docs/ROBUSTNESS: pick (q_in, q_out) by
        # noised accuracy subject to clean accuracy within 2 points)
        noise_db = float(args.noise_margin_db)
        session.add_noise_db = noise_db
        session._fingerprint = None
        Zn_by, _, _ = encode_species_tree(
            session, val_dir, species, cache=False, cache_dir=None,
            max_per_class=0, seed=args.seed, log=lambda *a: None,
        )
        session.add_noise_db = None
        session._fingerprint = None
        Zn, true_n = concat_species_latents(Zn_by, species)
        gmn = radial_qgrid(
            fit, jnp.asarray(Zn), jnp.asarray(true_n), ranks,
            np.asarray(q_in_grid, np.float32),
            np.asarray(args.q_out_grid, np.float32),
            None,
        )
        acc_nz = np.asarray(gmn.accuracy)
        nod_nz = np.asarray(gmn.no_detect_rate)

    out = grid_root / "grid_metrics.csv"
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        header = ["q_in", "q_out", "val_accuracy", "val_no_detect_rate"]
        if acc_nz is not None:
            header += [f"val_accuracy_snr{args.noise_margin_db:g}db",
                       f"val_no_detect_rate_snr{args.noise_margin_db:g}db"]
        header += [f"acc_{sp}" for sp in species] + [f"no_detect_{sp}" for sp in species]
        w.writerow(header)
        for i, qi in enumerate(q_in_grid):
            for j, qo in enumerate(args.q_out_grid):
                row = [qi, qo, float(acc[i, j]), float(nod[i, j])]
                if acc_nz is not None:
                    row += [float(acc_nz[i, j]), float(nod_nz[i, j])]
                row += [float(v) for v in accp[i, j]] + [float(v) for v in nodp[i, j]]
                w.writerow(row)
    print(f"💾 on-device grid metrics: {out}")

    if acc_nz is not None:
        qi, qo = recommend_operating_point(acc, acc_nz, q_in_grid, args.q_out_grid)
        print(
            f"🎯 noise-margin operating point (SNR {args.noise_margin_db:g} dB): "
            f"q_in={qi:g} q_out={qo:g} — best noised accuracy within 2 points "
            "of the clean optimum; refit with these to adopt it"
        )


def recommend_operating_point(acc_clean, acc_noise, q_in_grid, q_out_grid,
                              margin: float = 0.02):
    """(q_in, q_out) maximizing NOISED accuracy among points whose CLEAN
    accuracy is within ``margin`` of the clean optimum (ties -> higher clean
    accuracy). The documented noise-margin calibration recipe: the reference
    grid (ref:run_qout_grid.sh:6-13) trades NO_DETECT against accuracy; this
    adds 'and survives noise at the stated SNR' as the constraint."""
    import numpy as np

    acc_clean = np.asarray(acc_clean)
    acc_noise = np.asarray(acc_noise)
    eligible = acc_clean >= acc_clean.max() - margin
    score = np.where(eligible, acc_noise + 1e-6 * acc_clean, -1.0)
    i, j = np.unravel_index(int(score.argmax()), score.shape)
    return float(q_in_grid[i]), float(q_out_grid[j])


if __name__ == "__main__":
    main()
