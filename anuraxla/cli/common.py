"""Shared CLI plumbing: the mel/encoder/config flags every reference script
duplicates (e.g. ``08:340-362``), defined once."""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

from anuraxla.constants import MelConfig
from anuraxla.utils.io import find_project_root, load_json, resolve_root_dir


def add_mel_args(p: argparse.ArgumentParser, duration_default: Optional[float] = None) -> None:
    p.add_argument("--sr", type=int, default=48000)
    p.add_argument("--n-mels", type=int, default=64)
    p.add_argument("--target-frames", type=int, default=192)
    p.add_argument("--fmin", type=float, default=150.0)
    p.add_argument("--fmax", type=float, default=15000.0)
    p.add_argument("--hop-length", type=int, default=384)
    p.add_argument("--n-fft", type=int, default=2048)
    if duration_default is not None:
        p.add_argument("--duration", type=float, default=duration_default)


def add_device_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--device", type=str, default="auto",
        help="'auto' uses the best available backend (TPU if present); "
        "'cpu' forces CPU. (The reference defaulted to cpu; a TPU framework "
        "defaults to the accelerator.)",
    )


def add_encoder_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--encoder", type=str, default=None,
        help="encoder artifact dir (encoder.msgpack + encoder.json); defaults "
        "to <project_root>/models/anuraxla_vae_encoder_v0, falling back to a "
        "deterministic init if absent",
    )
    p.add_argument(
        "--allow-init-encoder", action="store_true", default=True,
        help=argparse.SUPPRESS,
    )


def add_batch_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--batch-size", type=int, default=64, help="device batch size")
    p.add_argument("--io-threads", type=int, default=16, help="host decode threads")
    p.add_argument(
        "--serving-tier", type=str, default="custom",
        choices=["custom", "parity", "balanced", "fast"],
        help="named operating point bundling the frontend/encoder knobs "
        "(individual flags below override a tier's choice when set away "
        "from their defaults). "
        "'parity' = exact-f32 mel (Pallas CT kernel on TPU; identical "
        "librosa-parity math) + f32 encoder — torch-checkpoint bit-parity "
        "serving, bench.py's value_f32_encoder leg. "
        "'balanced' = exact-f32 mel + bf16-trunk encoder — the headline "
        "benchmark config (~1e-2 latent drift, decisions preserved). "
        "'fast' = crop-first frontend + bf16 mel dots + bf16 encoder — "
        "~1.5x 'balanced' (bench value_fast_tier; ~61k chunks/s/chip), "
        "latent drift <=6.5e-2, decision-equivalent on the on-chip goldens "
        "and SNR-sweep-characterized in docs/ROBUSTNESS.md. "
        "'custom' (default) = exactly the individual flags",
    )
    # the three tier-controlled knobs default to None so resolve_tier_knobs
    # can tell "user typed the flag" from "flag absent" — an explicit value
    # must beat the tier even when it equals the built-in default (e.g.
    # `--serving-tier fast --encoder-dtype float32`)
    p.add_argument(
        "--fast-frontend", action="store_true", default=None,
        help="crop-first mel frontend (~3.3x fewer STFT FLOPs for 5s clips); "
        "statistically equivalent for detection, not bit-identical to librosa",
    )
    p.add_argument(
        "--frontend-backend", type=str, default=None,
        choices=["matmul", "ct", "fft", "pallas", "pallas-bf16"],
        help="STFT/mel implementation (pallas = fused in-VMEM Cooley-Tukey "
        "TPU kernel, exact f32; pallas-bf16 = its bf16 MXU mode, ~6e-2 "
        "standardized-dB error, decision-equivalent on the test trees). "
        "Default: matmul (or the --serving-tier's choice)",
    )
    p.add_argument(
        "--data-parallel", action="store_true",
        help="shard encode batches over all local devices (SPMD over a "
        "'data' mesh axis)",
    )
    p.add_argument(
        "--transfer-int16", action="store_true",
        help="ship audio to the device as PCM16 (half the host->device bytes; "
        "lossless for 16-bit source files)",
    )
    p.add_argument(
        "--quantize-serving", action="store_true",
        help="int8 encoder contractions (models.quant; 2x MXU throughput on "
        "v5e, post-training-quantization latent tolerance — latent caches "
        "are fingerprinted separately)",
    )
    p.add_argument(
        "--pre-padded-host", action="store_true",
        help="decode WAVs directly into the Pallas phase kernel's pre-padded "
        "row layout (saves ~2.2 GB/batch of device HBM pad traffic at "
        "B=1024; +~23%% host->device link bytes — use on fast links). "
        "Requires parity mode, --frontend-backend pallas, hop %% 128 == 0",
    )
    p.add_argument(
        "--encoder-dtype", type=str, default=None,
        choices=["float32", "bfloat16"],
        help="encoder trunk compute dtype (params stay f32; the mu/logvar "
        "heads always run f32). bfloat16 halves the conv stack's HBM "
        "traffic (~2x encoder throughput on v5e) at ~1e-2 relative latent "
        "drift — latent caches are fingerprinted separately. float32 is "
        "the default (or the --serving-tier's choice) and required for "
        "torch-checkpoint bit-parity",
    )


# knob bundles behind --serving-tier; an individual flag the user typed
# always wins over the tier's choice
SERVING_TIERS = {
    "parity": {"fast_frontend": False, "frontend_backend": "pallas",
               "encoder_dtype": "float32"},
    "balanced": {"fast_frontend": False, "frontend_backend": "pallas",
                 "encoder_dtype": "bfloat16"},
    "fast": {"fast_frontend": True, "frontend_backend": "pallas-bf16",
             "encoder_dtype": "bfloat16"},
}
_TIER_FLAG_DEFAULTS = {
    "fast_frontend": False, "frontend_backend": "matmul",
    "encoder_dtype": "float32",
}


def resolve_tier_knobs(args) -> dict:
    """(fast_frontend, frontend_backend, encoder_dtype) after applying
    --serving-tier. The knob flags carry None-sentinel argparse defaults, so
    presence is unambiguous: a flag the user typed overrides the tier even
    when its value equals the built-in default (a tier is a bundle of
    defaults, not a lock); absent flags take the tier's value, then the
    built-in default."""
    tier = getattr(args, "serving_tier", "custom")
    tier_vals = SERVING_TIERS.get(tier, {})
    knobs = {}
    for k, builtin in _TIER_FLAG_DEFAULTS.items():
        v = getattr(args, k, None)
        knobs[k] = v if v is not None else tier_vals.get(k, builtin)
    return knobs


def session_kwargs(args) -> dict:
    knobs = resolve_tier_knobs(args)
    return {
        "batch_size": args.batch_size,
        "num_threads": args.io_threads,
        "parity": not knobs["fast_frontend"],
        "backend": knobs["frontend_backend"],
        "transfer_int16": getattr(args, "transfer_int16", False),
        "data_parallel": getattr(args, "data_parallel", False),
        "quantize": getattr(args, "quantize_serving", False),
        "encoder_dtype": knobs["encoder_dtype"],
        "pre_padded_host": getattr(args, "pre_padded_host", False),
    }


def apply_device(device: str) -> None:
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    # 'auto' / anything else: leave the default backend (TPU when available)


def mel_from_args(args, duration: float) -> MelConfig:
    return MelConfig(
        sr=args.sr,
        duration=duration,
        n_mels=args.n_mels,
        fmin=args.fmin,
        fmax=args.fmax,
        hop_length=args.hop_length,
        n_fft=args.n_fft,
        target_frames=args.target_frames,
    )


def resolve_config(config_arg: str, project_root: Path) -> Path:
    cfg_path = Path(config_arg)
    if not cfg_path.is_absolute():
        cfg_path = (project_root / cfg_path).resolve()
    if not cfg_path.exists():
        raise SystemExit(f"❌ config.json not found at: {cfg_path}")
    return cfg_path


def project_root_here() -> Path:
    return find_project_root(Path.cwd())


__all__ = [
    "add_mel_args",
    "add_device_arg",
    "add_encoder_args",
    "add_batch_args",
    "apply_device",
    "mel_from_args",
    "resolve_config",
    "project_root_here",
    "resolve_root_dir",
    "load_json",
]
