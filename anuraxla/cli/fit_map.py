"""``fit-map`` — fit the Gaussian MAP (LDA/QDA) detector (reference
``08b_fit_map_detector.py`` CLI contract: same flags and config block).
"""

from __future__ import annotations

import argparse
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
)
from anuraxla.config import get_chunk_seconds
from anuraxla.constants import CACHE_DIR_NAME
from anuraxla.pipeline.fit import fit_map_tree
from anuraxla.pipeline.session import EncoderSession
from anuraxla.utils.io import load_json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, default="config.json")
    p.add_argument("--root", type=str, required=True)
    add_device_arg(p)
    add_mel_args(p)
    add_encoder_args(p)
    add_batch_args(p)
    p.add_argument("--max-per-class", type=int, default=0)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--cache", action="store_true")
    p.add_argument("--cache-dir", type=str, default=None)
    p.add_argument("--cov-type", type=str, default="lda", choices=["lda", "qda"])
    # None sentinels so --preset can tell "user said full/0.0" from "default"
    p.add_argument("--cov-structure", type=str, default=None, choices=["full", "diag"])
    p.add_argument("--priors", type=str, default="empirical", choices=["empirical", "uniform"])
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--shrink", type=float, default=None)
    p.add_argument("--set-tau-q", type=float, default=None,
                   help="e.g. 0.01 => tau = quantile(train true-class scores, 0.01)")
    p.add_argument("--augment-noise-db", type=str, default=None,
                   help="comma list of SNRs (dB): also fit on noise-injected "
                   "training latents (docs/ROBUSTNESS.md)")
    p.add_argument("--noise-seed", type=int, default=0,
                   help="seed for --augment-noise-db injection")
    p.add_argument(
        "--preset", type=str, default=None, choices=["small-n"],
        help="small-n: diag covariance + shrink 0.1 — the regularization the "
        "reference's knobs (ref:08b_fit_map_detector.py:60-81) exist for. Use "
        "when classes have fewer samples than latent dims (n_k < D): a full "
        "pooled covariance then overfits so hard that a train-score tau "
        "rejects every val chunk (100%% NO_DETECT). Explicit --cov-structure/"
        "--shrink flags override the preset values.",
    )
    return p


def resolve_preset(args) -> tuple[str, float, list[str]]:
    """(cov_structure, shrink, notes) after applying --preset small-n.
    Explicit user flags always win over preset values."""
    notes: list[str] = []
    cov_structure = args.cov_structure
    shrink = args.shrink
    if args.preset == "small-n":
        if cov_structure is None:
            cov_structure = "diag"
            notes.append("preset small-n: cov_structure=diag")
        if shrink is None:
            shrink = 0.1
            notes.append("preset small-n: shrink=0.1")
        if args.set_tau_q is None:
            notes.append(
                "preset small-n: consider --set-tau-q 0.01 — without tau the "
                "detector never rejects (NO_DETECT disabled)"
            )
    return (
        cov_structure if cov_structure is not None else "full",
        shrink if shrink is not None else 0.0,
        notes,
    )


def main() -> None:
    args = build_parser().parse_args()
    cov_structure, shrink, preset_notes = resolve_preset(args)
    if not (0.0 <= shrink <= 1.0):
        raise SystemExit("❌ --shrink must be in [0,1].")
    if args.set_tau_q is not None and not (0.0 < float(args.set_tau_q) < 1.0):
        raise SystemExit("❌ --set-tau-q must be in (0,1).")
    apply_device(args.device)

    project_root = project_root_here()
    cfg_path = resolve_config(args.config, project_root)
    cfg = load_json(cfg_path)
    chunks_dir = resolve_root_dir(args.root, project_root)
    chunk_seconds = get_chunk_seconds(cfg)

    print(f"📌 project root: {project_root}")
    print(f"🧾 config: {cfg_path}")
    print(f"📁 chunks dir: {chunks_dir}")
    print(
        f"🎯 cov_type={args.cov_type} | cov_structure={cov_structure} | "
        f"priors={args.priors} | eps={args.eps} | shrink={shrink}"
    )
    print(f"🎯 max_per_class={args.max_per_class} | cache={args.cache}")
    for note in preset_notes:
        print(f"🧩 {note}")
    print()

    session = EncoderSession(
        mel=mel_from_args(args, chunk_seconds),
        encoder_dir=Path(args.encoder) if args.encoder else None,
        project_root=project_root,
        noise_seed=args.noise_seed,
        **session_kwargs(args),
    ).load()

    from anuraxla.cli.fit_radial import parse_augment

    cache_dir = Path(args.cache_dir) if args.cache_dir else (project_root / CACHE_DIR_NAME)
    fit_map_tree(
        cfg_path=cfg_path, cfg=cfg, chunks_dir=chunks_dir, session=session,
        cov_type=args.cov_type, cov_structure=cov_structure, priors_mode=args.priors,
        eps=args.eps, shrink=shrink, tau_q=args.set_tau_q,
        cache=args.cache, cache_dir=cache_dir,
        max_per_class=args.max_per_class, seed=args.seed,
        augment_noise_db=parse_augment(args.augment_noise_db),
    )


if __name__ == "__main__":
    main()
