"""``ingest-encoder`` — convert a reference-style torch encoder artifact
(checkpoint .pt + optional Hydra YAML) into a native anuraxla encoder
artifact, discovering the architecture and target_frames from the weights.

This is the migration path for the reference's external model
(``ref:map_detector_core.py:150-179`` loads it via hydra-instantiate of a
private package; ``ref:07:355-409`` discovers target_frames with a forward
hook). Here: shape-based ingest (models.hydra_ingest), closed-form
auto-frames, and an artifact that records its input shape so every other
tool just works. ``--verify`` rebuilds the torch module from the YAML's
_target_ tree (torch.nn vocabulary) and pins latent parity before saving.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pt", required=True, help="torch checkpoint (.pt)")
    p.add_argument("--yaml", default=None, help="Hydra YAML sidecar (optional)")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("--n-mels", type=int, default=64)
    p.add_argument("--groups", type=int, default=None,
                   help="GroupNorm groups (default: from YAML, else 8)")
    p.add_argument("--verify", action="store_true",
                   help="rebuild the torch module from the YAML _target_ tree "
                   "and require latent parity before saving")
    p.add_argument("--tol", type=float, default=1e-4)
    p.add_argument("--downsample", choices=["auto", "stride", "avgpool"],
                   default="auto",
                   help="force the downsampling reading for ambiguous bare "
                   "state_dicts (repeated-width avgpool chains can also parse "
                   "as stride pairs; pickled runnable modules disambiguate "
                   "themselves via the forward-hook probe)")
    return p


def main() -> None:
    args = build_parser().parse_args()
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.hydra_ingest import ingest_foreign_checkpoint

    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cfg, params, meta = ingest_foreign_checkpoint(
            args.pt, args.yaml, n_mels=args.n_mels, groups=args.groups,
            downsample=None if args.downsample == "auto" else args.downsample,
        )
    for w in caught:
        print(f"⚠️ {w.message}")
    print(f"🔍 inferred: widths={list(cfg.widths)} dense={cfg.dense_width} "
          f"latent={cfg.latent_dim} groups={cfg.groups}")
    print(f"🔍 auto-frames: target_frames={cfg.input_hw[0]} (n_mels={cfg.input_hw[1]})")

    if args.verify:
        if not args.yaml:
            raise SystemExit("❌ --verify needs --yaml (to rebuild the torch module)")
        err = verify_against_torch(args.pt, args.yaml, cfg, params)
        if err > args.tol:
            raise SystemExit(f"❌ latent mismatch vs torch module: max|Δ|={err:.3e} > {args.tol}")
        print(f"✅ verified vs torch module: max|Δ|={err:.3e}")

    out = save_encoder(Path(args.out), cfg, params)
    print(f"💾 artifact: {out} (use with --encoder {out})")


def verify_against_torch(pt_path, yaml_path, cfg, params) -> float:
    """Max abs latent difference between the ingested flax encoder and the
    torch module rebuilt from the YAML _target_ tree, on random mel input."""
    import torch

    import jax.numpy as jnp

    from anuraxla.models.hydra_ingest import (
        build_nn_module,
        instantiate_target_tree,
        load_yaml_cfg,
        pick_encoder_cfg,
        split_model_and_state,
    )
    from anuraxla.models.vae import ConvVAEEncoder

    module = build_nn_module(instantiate_target_tree(pick_encoder_cfg(load_yaml_cfg(yaml_path))))
    ckpt = torch.load(str(pt_path), map_location="cpu", weights_only=False)
    sd = split_model_and_state(ckpt)
    # the reference loads strict=False (ref:map_detector_core.py:176) — but a
    # verification oracle left at random init is worse than no oracle, so
    # require every checkpoint tensor to land somewhere
    result = module.load_state_dict(sd, strict=False)
    n_loaded = len(sd) - len(result.unexpected_keys)
    if n_loaded == 0 or result.missing_keys:
        raise SystemExit(
            "❌ --verify could not rebuild the torch oracle: the YAML-built "
            f"module loaded {n_loaded}/{len(sd)} checkpoint tensors "
            f"(missing={result.missing_keys[:3]}, "
            f"unexpected={result.unexpected_keys[:3]}). The shape-based "
            "ingest itself does not need matching names — drop --verify, or "
            "provide a YAML whose module names match the checkpoint's."
        )
    module.eval()

    t, m = cfg.input_hw
    x = np.random.default_rng(0).standard_normal((2, 1, t, m)).astype(np.float32)
    with torch.no_grad():
        out = module(torch.from_numpy(x))
    z_torch = _extract_latent(out)

    enc = ConvVAEEncoder(cfg)
    z_flax = np.asarray(
        enc.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))["mu"]
    )
    return float(np.abs(z_torch - z_flax).max())


def _extract_latent(out) -> np.ndarray:
    """Reference output-key probing order z/latent/mu/mean/embedding
    (``ref:map_detector_core.py:279-288``); tensors/tuples taken as-is."""
    import torch

    if isinstance(out, dict):
        for k in ("z", "latent", "mu", "mean", "embedding"):
            if k in out and isinstance(out[k], torch.Tensor):
                return out[k].numpy()
        raise ValueError(f"no latent key in module output: {list(out)}")
    if isinstance(out, (tuple, list)):
        out = out[0]
    return out.numpy()


if __name__ == "__main__":
    main()
