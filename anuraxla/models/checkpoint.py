"""Encoder/VAE checkpoint persistence.

The reference's model artifact is a torch pickle + Hydra YAML pair resolved
from ``models/bird_net_vae_audio_splitted_encoder_v0/``
(``map_detector_core.py:64-76``). Ours is the same two-file shape — a weights
file and an architecture config — but framework-native: flax msgpack +
JSON. Orbax handles full training-state checkpoints (optimizer, step) for
resume; the msgpack artifact is the small, portable serving export.

Layout of an encoder artifact directory:
    <dir>/encoder.msgpack   flax-serialized params
    <dir>/encoder.json      VAEConfig fields (the "yaml" of our world)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax.numpy as jnp
from flax import serialization

from anuraxla.models.vae import ConvVAEEncoder, VAEConfig, init_encoder

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _cfg_to_dict(cfg: VAEConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["widths"] = list(cfg.widths)
    d["input_hw"] = list(cfg.input_hw)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    return d


def _cfg_from_dict(d: dict) -> VAEConfig:
    d = dict(d)
    d["widths"] = tuple(d["widths"])
    d["input_hw"] = tuple(d["input_hw"])
    d["dtype"] = _DTYPES.get(d.get("dtype", "float32"), jnp.float32)
    return VAEConfig(**d)


def save_encoder(dir_path: str | Path, cfg: VAEConfig, params: Any) -> Path:
    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    (dir_path / "encoder.msgpack").write_bytes(serialization.to_bytes(params))
    (dir_path / "encoder.json").write_text(json.dumps(_cfg_to_dict(cfg), indent=2))
    return dir_path


def load_encoder(dir_path: str | Path, seed: int = 0) -> tuple[ConvVAEEncoder, Any, VAEConfig]:
    """Load (module, params, cfg). Params structure comes from a fresh init of
    the recorded architecture, then bytes are restored into it."""
    dir_path = Path(dir_path)
    cfg = _cfg_from_dict(json.loads((dir_path / "encoder.json").read_text()))
    enc, template = init_encoder(cfg, seed=seed)
    params = serialization.from_bytes(template, (dir_path / "encoder.msgpack").read_bytes())
    return enc, params, cfg


def save_vae(dir_path: str | Path, cfg: VAEConfig, vae_params: Any) -> Path:
    """Full VAE artifact (encoder+decoder) — the analogue of the reference's
    paired encoder_v0/decoder_v0 model.pt files (REPRODUCE guide §1), one dir:
        <dir>/vae.msgpack + <dir>/encoder.json
    """
    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    (dir_path / "vae.msgpack").write_bytes(serialization.to_bytes(vae_params))
    (dir_path / "encoder.json").write_text(json.dumps(_cfg_to_dict(cfg), indent=2))
    return dir_path


def load_vae(dir_path: str | Path, seed: int = 0):
    """-> (ConvVAE module, params, cfg); reconstructs the param template from
    the recorded architecture."""
    from anuraxla.models.vae import init_vae

    dir_path = Path(dir_path)
    cfg = _cfg_from_dict(json.loads((dir_path / "encoder.json").read_text()))
    vae, template = init_vae(cfg, seed=seed)
    params = serialization.from_bytes(template, (dir_path / "vae.msgpack").read_bytes())
    return vae, params, cfg


def save_decoder(dir_path: str | Path, spec, params: Any) -> Path:
    """Decoder artifact (the analogue of the reference's paired
    bird_net_vae_audio_splitted_decoder_v0/model.pt,
    ref:docs/REPRODUCE_THESIS_BASELINE.md:33-42):
        <dir>/decoder.msgpack + <dir>/decoder.json (DecoderSpec fields)."""
    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    d = dataclasses.asdict(spec)
    d["dense_widths"] = list(spec.dense_widths)
    d["bottleneck_hw"] = list(spec.bottleneck_hw)
    d["stack"] = [list(s) for s in spec.stack]
    (dir_path / "decoder.msgpack").write_bytes(serialization.to_bytes(params))
    (dir_path / "decoder.json").write_text(json.dumps(d, indent=2))
    return dir_path


def load_decoder(dir_path: str | Path, seed: int = 0):
    """-> (IngestedDecoder module, params, DecoderSpec)."""
    from anuraxla.models.vae import DecoderSpec, init_ingested_decoder

    dir_path = Path(dir_path)
    d = json.loads((dir_path / "decoder.json").read_text())
    d["dense_widths"] = tuple(d["dense_widths"])
    d["bottleneck_hw"] = tuple(d["bottleneck_hw"])
    d["stack"] = tuple((str(k), int(w)) for k, w in d["stack"])
    spec = DecoderSpec(**d)
    dec, template = init_ingested_decoder(spec, seed=seed)
    params = serialization.from_bytes(template, (dir_path / "decoder.msgpack").read_bytes())
    return dec, params, spec


def save_train_state(ckpt_dir: str | Path, state, step: int | None = None) -> None:
    """Full training-state checkpoint via orbax (resume-capable)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(int(step if step is not None else state.step), args=ocp.args.StandardSave(state))


def restore_train_state(ckpt_dir: str | Path, template_state):
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        return mgr.restore(step, args=ocp.args.StandardRestore(template_state))


def default_encoder_artifact(project_root: Path) -> Path:
    """models/anuraxla_vae_encoder_v0 under the project root — the analogue of
    the reference's default encoder path resolution."""
    from anuraxla.constants import DEFAULT_ENCODER_DIR

    return project_root / DEFAULT_ENCODER_DIR


def load_or_init_encoder(
    encoder_dir: str | Path | None,
    project_root: Path,
    *,
    allow_init: bool = True,
    seed: int = 0,
):
    """Resolve an encoder artifact like the reference resolves model.pt:
    explicit path wins, else the default location; if neither exists and
    ``allow_init`` is set, fall back to a deterministically-initialized
    encoder (lets the pipeline run end-to-end before any training, which the
    reference cannot do without its private weights)."""
    if encoder_dir is not None:
        return load_encoder(encoder_dir, seed=seed)
    default = default_encoder_artifact(project_root)
    if (Path(default) / "encoder.msgpack").exists():
        return load_encoder(default, seed=seed)
    if not allow_init:
        raise FileNotFoundError(f"no encoder artifact at {default}")
    cfg = VAEConfig()
    enc, params = init_encoder(cfg, seed=seed)
    return enc, params, cfg
