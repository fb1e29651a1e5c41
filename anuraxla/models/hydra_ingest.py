"""Ingest the reference's *actual* external encoder artifact: a torch
checkpoint (pickled module / wrapped or raw state_dict) plus a Hydra-style
YAML sidecar whose ``encoder._target_`` tree describes the architecture
(``ref:map_detector_core.py:107-179``).

The reference needs the private ``soundscape_vae`` package at load time —
``instantiate(enc_cfg)`` returns a factory that is called once to get the
nn.Module (``ref:map_detector_core.py:135-147``). This module removes that
dependency for the documented layer vocabulary (Conv2d / GroupNorm / Linear
feed-forward stacks, the shape contract of ``ref:07:7-13``):

- ``load_yaml_cfg`` / ``pick_encoder_cfg``: same YAML handling, interpolations
  deliberately NOT resolved (reference behavior).
- ``instantiate_target_tree``: a mini-instantiate for ``_target_`` trees.
  Importable targets import; unimportable private paths fall back to the
  terminal class name resolved against ``torch.nn`` — so a YAML that says
  ``soundscape_vae.layers.Conv2d`` still builds. The factory-call convention
  is honored (callable-but-not-module results are called once).
- shape-based state_dict mapping: foreign tensor NAMES never matter — tensors
  are classified by shape/role in registration order (torch state_dicts
  preserve forward order for sequential nets) and mapped onto
  :class:`~anuraxla.models.vae.ConvVAEEncoder` slots with layout conversion.
- ``auto_find_frames``: the TPU-native port of the reference's forward-hook
  probe (``ref:07:355-409``): instead of hooking the first nn.Linear and
  re-running the encoder per candidate, the downsampling chain is known, so
  candidate ``target_frames`` are checked against the ingested dense layer's
  ``in_features`` in closed form.

Ingested artifacts set ``conv_padding="TORCH"`` and ``gn_eps=1e-5`` on
VAEConfig so the flax encoder reproduces torch Conv2d(padding=1) /
GroupNorm(eps=1e-5) math bitwise; tests pin latent parity end to end.
"""

from __future__ import annotations

import importlib
import math
from pathlib import Path
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from anuraxla.models.ingest import (
    convert_conv,
    convert_groupnorm,
    convert_linear,
    split_model_and_state,
)
from anuraxla.models.vae import VAEConfig, bottleneck_for as _vae_bottleneck_for


# ---------------------------------------------------------------------------
# YAML handling (reference: load_yaml_cfg / pick_encoder_cfg)
# ---------------------------------------------------------------------------

def load_yaml_cfg(path: str | Path) -> Dict[str, Any]:
    """Parse the Hydra YAML *without* resolving interpolations — the reference
    passes resolve=False for the same reason (``ref:map_detector_core.py:111``):
    the values reference a training environment that no longer exists."""
    import yaml

    cfg = yaml.safe_load(Path(path).read_text())
    if not isinstance(cfg, dict):
        raise ValueError(f"YAML did not parse to a mapping: {path}")
    return cfg


def pick_encoder_cfg(cfg: Mapping[str, Any]) -> Dict[str, Any]:
    enc = cfg.get("encoder")
    if isinstance(enc, Mapping) and "_target_" in enc:
        return dict(enc)
    raise ValueError("YAML has no 'encoder:' block with a _target_")


# ---------------------------------------------------------------------------
# Mini-instantiate for _target_ trees (torch.nn vocabulary)
# ---------------------------------------------------------------------------

def _resolve_target(target: str):
    """Import a dotted target; if the module path is unimportable (private
    package), resolve the terminal class name against torch.nn."""
    mod_path, _, name = target.rpartition(".")
    if mod_path:
        try:
            return getattr(importlib.import_module(mod_path), name)
        except (ImportError, AttributeError):
            pass
    import torch.nn as torch_nn

    if hasattr(torch_nn, name):
        return getattr(torch_nn, name)
    raise ImportError(
        f"cannot resolve _target_ '{target}': module not importable and "
        f"'{name}' is not a torch.nn layer"
    )


def instantiate_target_tree(node: Any) -> Any:
    """Recursively instantiate a Hydra-style config node. Dicts with
    ``_target_`` become objects (kwargs instantiated first, ``_args_``
    positional); plain dicts/lists recurse; leaves pass through."""
    if isinstance(node, Mapping):
        if "_target_" in node:
            cls = _resolve_target(str(node["_target_"]))
            args = [instantiate_target_tree(a) for a in node.get("_args_", [])]
            kwargs = {
                k: instantiate_target_tree(v)
                for k, v in node.items()
                # drop ALL Hydra meta-keys (real config dumps carry
                # _recursive_/_convert_ inside _target_ nodes)
                if k not in ("_target_", "_args_", "_partial_", "_recursive_", "_convert_")
            }
            if node.get("_partial_"):
                import functools

                return functools.partial(cls, *args, **kwargs)
            return cls(*args, **kwargs)
        return {k: instantiate_target_tree(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        vals = [instantiate_target_tree(v) for v in node]
        return type(node)(vals) if isinstance(node, tuple) else vals
    return node


def build_nn_module(obj: Any):
    """Reference factory convention (``ref:map_detector_core.py:135-147``):
    instantiate() may return the module or a zero-arg factory for it."""
    import torch.nn as torch_nn

    if isinstance(obj, torch_nn.Module):
        return obj
    if callable(obj):
        m = obj()
        if isinstance(m, torch_nn.Module):
            return m
        raise TypeError(f"factory() returned {type(m)}, not nn.Module")
    raise TypeError(f"cannot build nn.Module from {type(obj)}")


# ---------------------------------------------------------------------------
# Shape-based state_dict analysis
# ---------------------------------------------------------------------------

def _tensor_shapes(sd: Mapping[str, Any]) -> List[Tuple[str, Tuple[int, ...]]]:
    out = []
    for k, v in sd.items():
        shape = tuple(getattr(v, "shape", np.asarray(v).shape))
        if "num_batches_tracked" in k:  # torch BatchNorm bookkeeping
            continue
        out.append((k, shape))
    return out


def infer_vae_config_from_state_dict(
    sd: Mapping[str, Any],
    *,
    n_mels: int = 64,
    groups: Optional[int] = None,
    yaml_cfg: Optional[Mapping[str, Any]] = None,
) -> VAEConfig:
    """Derive the ConvVAEEncoder-compatible architecture from tensor shapes
    alone: conv pairs give widths, the first 2-D tensor gives dense_width,
    the head rows give latent_dim, and ``auto_find_frames`` recovers
    target_frames from the dense in_features. ``groups`` falls back to a
    recursive YAML search for num_groups/groups, then 8."""
    shapes = _tensor_shapes(sd)
    convs = [(k, s) for k, s in shapes if len(s) == 4]
    linears = [(k, s) for k, s in shapes if len(s) == 2]
    if not convs or len(linears) < 2:
        raise ValueError(
            f"state_dict outside the supported vocabulary: {len(convs)} conv "
            f"and {len(linears)} linear tensors (need conv blocks + dense + heads)"
        )
    if len(convs) % 2 != 0:
        raise ValueError(f"expected conv pairs per block, got {len(convs)} convs")
    widths = []
    cin = 1
    for i in range(0, len(convs), 2):
        (k1, s1), (k2, s2) = convs[i], convs[i + 1]
        if s1[1] != cin or s2[0] != s1[0] or s2[1] != s1[0]:
            raise ValueError(
                f"conv chain mismatch at {k1}/{k2}: {s1} then {s2} (after cin={cin})"
            )
        widths.append(int(s1[0]))
        cin = int(s1[0])

    dense_k, dense_s = linears[0]
    heads = [(k, s) for k, s in linears[1:]]
    if len(heads) not in (1, 2):
        raise ValueError(f"expected 1 (mu) or 2 (mu+logvar) head linears, got {len(heads)}")
    latent_dim = int(heads[0][1][0])
    for k, s in heads:
        if s != (latent_dim, dense_s[0]):
            raise ValueError(f"head {k} has shape {s}, expected {(latent_dim, dense_s[0])}")

    if groups is None:
        groups = _find_int_key(yaml_cfg or {}, ("num_groups", "groups")) or 8

    t = auto_find_frames(int(dense_s[1]), n_mels=n_mels, widths=widths)
    return VAEConfig(
        latent_dim=latent_dim,
        widths=tuple(widths),
        dense_width=int(dense_s[0]),
        groups=int(groups),
        input_hw=(t, n_mels),
        conv_padding="TORCH",
        gn_eps=1e-5,
    )


def _find_int_key(node: Any, names: Sequence[str]) -> Optional[int]:
    if isinstance(node, Mapping):
        for k, v in node.items():
            if k in names and isinstance(v, int):
                return v
            found = _find_int_key(v, names)
            if found is not None:
                return found
    elif isinstance(node, (list, tuple)):
        for v in node:
            found = _find_int_key(v, names)
            if found is not None:
                return found
    return None


# canonical ceil-halving bottleneck formula lives next to the architecture
bottleneck_for = _vae_bottleneck_for


def auto_find_frames(
    in_features: int,
    *,
    n_mels: int,
    widths: Sequence[int],
    start: int = 8,
    max_frames: int = 4096,
    step: int = 1,
) -> int:
    """Find target_frames such that the flattened bottleneck matches the dense
    layer's in_features — the reference discovers this by re-running the
    encoder with a forward-pre-hook per candidate (``ref:07:355-409``); here
    the downsampling chain is known, so each candidate is one multiply."""
    n_blocks, c_last = len(widths), widths[-1]
    for frames in range(max(8, start), max(start, max_frames) + 1, max(1, step)):
        bt, bm = bottleneck_for(frames, n_mels, n_blocks)
        if bt * bm * c_last == in_features:
            return frames
    raise ValueError(
        f"no target_frames in [{start}, {max_frames}] gives dense in_features="
        f"{in_features} (n_mels={n_mels}, widths={list(widths)}); is n_mels right?"
    )


def convert_dense_from_nchw_flatten(w, b, *, c: int, h: int, wd: int) -> Dict[str, Any]:
    """A torch net flattens NCHW (index order c,h,w); the flax encoder
    flattens NHWC (h,w,c). Reorder the dense kernel's input dimension so the
    same features land on the same weights."""
    W = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w, np.float32)
    W = W.reshape(W.shape[0], c, h, wd).transpose(0, 2, 3, 1).reshape(W.shape[0], -1)
    bias = np.asarray(b.detach().cpu().numpy() if hasattr(b, "detach") else b, np.float32)
    return {"kernel": W.T, "bias": bias}


def map_foreign_state_dict(sd: Mapping[str, Any], cfg: VAEConfig) -> Dict[str, Any]:
    """Map ANY feed-forward conv/gn/linear state_dict onto ConvVAEEncoder
    params purely by shape + registration order — no name conventions.

    Expected tensor stream per block i (names free):
      conv[w,cin,3,3], bias[w], gn w/b pairs [w]×2, conv[w,w,3,3], bias[w],
      gn pairs [w]×2; then dense [dw, flat]+[dw] (NCHW-flatten order,
      reordered here to the NHWC flatten the flax encoder uses); then
      head_mu and optionally head_logvar [D, dw]+[D] (mu first — the
      reference probes z/mu first). Single-head checkpoints get a zero
      logvar head (unused for deterministic latents).
    """
    stream = [(k, v) for k, v in sd.items() if "num_batches_tracked" not in k]
    pos = 0

    def take(expect_shape, role):
        nonlocal pos
        if pos >= len(stream):
            raise ValueError(f"state_dict exhausted looking for {role} {expect_shape}")
        k, v = stream[pos]
        shape = tuple(getattr(v, "shape", np.asarray(v).shape))
        if shape != tuple(expect_shape):
            raise ValueError(f"{role}: expected shape {tuple(expect_shape)}, got {k}{shape}")
        pos += 1
        return v

    params: Dict[str, Any] = {}
    cin = 1
    for i, w in enumerate(cfg.widths):
        blk = {}
        blk["Conv_0"] = convert_conv(take((w, cin, 3, 3), f"block{i}.conv1.weight"),
                                     take((w,), f"block{i}.conv1.bias"))
        blk["GroupNorm_0"] = convert_groupnorm(take((w,), f"block{i}.gn1.weight"),
                                               take((w,), f"block{i}.gn1.bias"))
        blk["Conv_1"] = convert_conv(take((w, w, 3, 3), f"block{i}.conv2.weight"),
                                     take((w,), f"block{i}.conv2.bias"))
        blk["GroupNorm_1"] = convert_groupnorm(take((w,), f"block{i}.gn2.weight"),
                                               take((w,), f"block{i}.gn2.bias"))
        params[f"EncoderBlock_{i}"] = blk
        cin = w
    bt, bm = bottleneck_for(*cfg.input_hw, len(cfg.widths))
    flat = bt * bm * cfg.widths[-1]
    params["Dense_0"] = convert_dense_from_nchw_flatten(
        take((cfg.dense_width, flat), "dense.weight"),
        take((cfg.dense_width,), "dense.bias"),
        c=cfg.widths[-1], h=bt, wd=bm,
    )
    params["head_mu"] = convert_linear(take((cfg.latent_dim, cfg.dense_width), "head_mu.weight"),
                                       take((cfg.latent_dim,), "head_mu.bias"))
    if pos < len(stream):
        params["head_logvar"] = convert_linear(
            take((cfg.latent_dim, cfg.dense_width), "head_logvar.weight"),
            take((cfg.latent_dim,), "head_logvar.bias"))
    else:  # single-head checkpoint: embedding IS mu; logvar never used
        params["head_logvar"] = {
            "kernel": np.zeros((cfg.dense_width, cfg.latent_dim), np.float32),
            "bias": np.zeros((cfg.latent_dim,), np.float32),
        }
    if pos != len(stream):
        extra = [k for k, _ in stream[pos:]]
        raise ValueError(f"{len(extra)} unconsumed tensors after mapping: {extra[:5]}")
    return {"params": params}


# ---------------------------------------------------------------------------
# End-to-end ingest
# ---------------------------------------------------------------------------

def ingest_foreign_checkpoint(
    pt_path: str | Path,
    yaml_path: str | Path | None = None,
    *,
    n_mels: int = 64,
    groups: Optional[int] = None,
) -> Tuple[VAEConfig, Dict[str, Any], Dict[str, Any]]:
    """torch checkpoint (+optional Hydra YAML) -> (VAEConfig, flax params,
    meta). The YAML contributes hyperparameter hints (groups); architecture
    and target_frames come from the state_dict shapes."""
    import torch

    ckpt = torch.load(str(pt_path), map_location="cpu", weights_only=False)
    sd = split_model_and_state(ckpt)
    yaml_cfg = load_yaml_cfg(yaml_path) if yaml_path else None
    cfg = infer_vae_config_from_state_dict(sd, n_mels=n_mels, groups=groups, yaml_cfg=yaml_cfg)
    params = map_foreign_state_dict(sd, cfg)
    meta = {
        "source": str(pt_path),
        "yaml": str(yaml_path) if yaml_path else None,
        "target_frames": cfg.input_hw[0],
        "n_tensors": len([k for k in sd if "num_batches_tracked" not in k]),
    }
    return cfg, params, meta
