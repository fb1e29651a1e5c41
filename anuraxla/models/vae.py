"""Conv VAE for log-mel spectrograms, TPU-first.

Capability target: the reference's external "bird_net" VAE encoder — a
pretrained torch nn.Module loaded via Hydra from a private package
(``map_detector_core.py:150-179``) with shape contract input ``[B,1,T=192,M=64]``
and a latent vector output probed from keys ``z/latent/mu/mean/embedding``
(``map_detector_core.py:268-295``). The reference ships no architecture source
and no training script (``scripts/02_train_vae.sh`` is a TODO stub), so this
module supplies both: a self-contained Flax encoder/decoder pair and (in
``anuraxla.models.train``) the training loop the reference lacks.

TPU-first choices:
- NHWC layout ``[B, T, M, C]`` (TPU conv native) instead of torch NCHW.
- Channel widths in multiples of 8/128 where it matters; the flatten→dense
  bottleneck is the single big MXU matmul.
- GroupNorm (batch-size independent → same math at any data-parallel shard
  size) instead of BatchNorm.
- Optional bf16 compute dtype with f32 params.
- The encoder returns a dict with ``z`` first, mirroring the reference's
  output-key probing so downstream adapters work identically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def bottleneck_for(
    t: int, m: int, n_blocks: int, downsample: str = "stride"
) -> tuple[int, int]:
    """Output (T, M) after n_blocks of downsampling. "stride": stride-2 k3
    convs — CEIL halving per block, identical for XLA SAME and torch
    padding=1. "avgpool": AvgPool2d(2) — FLOOR halving (torch discards the
    odd remainder). The ONE bottleneck formula (config property and ingest
    shape search both use it)."""
    for _ in range(n_blocks):
        if downsample == "avgpool":
            t, m = t // 2, m // 2
        else:
            t, m = -(-t // 2), -(-m // 2)
    return t, m


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Architecture hyperparameters. Defaults give a ~2.1 M-param encoder that
    maps [B,192,64,1] -> 128-d latent."""

    latent_dim: int = 128
    widths: Sequence[int] = (32, 64, 128, 256)
    dense_width: int = 512
    groups: int = 8
    input_hw: tuple[int, int] = (192, 64)  # (T, M)
    dtype: Any = jnp.float32  # compute dtype; params stay f32
    # torch-checkpoint compatibility knobs (models.hydra_ingest sets these so
    # an ingested torch encoder reproduces its latents bitwise):
    # "SAME" = XLA same-padding (asymmetric (0,1) on stride-2 even dims);
    # "TORCH" = torch Conv2d(padding=1) symmetric (1,1) — same output shapes,
    # different edge sampling grid.
    conv_padding: str = "SAME"
    gn_eps: float = 1e-6  # flax GroupNorm default; torch checkpoints use 1e-5
    activation: str = "silu"
    # "group" = GroupNorm blocks (the native architecture); "none" = no
    # runtime norm — used by hydra_ingest for BatchNorm checkpoints, where
    # the eval-mode BN affine is folded into the preceding conv's weights
    norm: str = "group"
    # "stride" = per block a stride-2 + a stride-1 3x3 conv (the native
    # architecture); "avgpool" = per block ONE stride-1 3x3 conv + norm +
    # act + AvgPool2d(2) (floor halving) — the second real-world foreign-
    # checkpoint family hydra_ingest accepts (torchvision-style encoders)
    downsample: str = "stride"

    @property
    def bottleneck_hw(self) -> tuple[int, int]:
        return bottleneck_for(*self.input_hw, len(self.widths), self.downsample)

    @property
    def act(self):
        return getattr(nn, self.activation)

    @property
    def stride2_padding(self):
        return ((1, 1), (1, 1)) if self.conv_padding == "TORCH" else "SAME"


class EncoderBlock(nn.Module):
    width: int
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        g = min(cfg.groups, self.width)
        if cfg.downsample == "avgpool":
            # one stride-1 k3 conv (torch padding=1 == SAME) + norm + act,
            # then AvgPool2d(2): VALID 2x2/2 pooling floor-halves exactly
            # like torch (the odd remainder row/column is dropped)
            x = nn.Conv(self.width, (3, 3), strides=(1, 1), padding="SAME",
                        dtype=cfg.dtype)(x)
            if cfg.norm == "group":
                x = nn.GroupNorm(num_groups=g, epsilon=cfg.gn_eps, dtype=cfg.dtype)(x)
            x = cfg.act(x)
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.width, (3, 3), strides=(2, 2), padding=cfg.stride2_padding,
                    dtype=cfg.dtype)(x)
        if cfg.norm == "group":
            x = nn.GroupNorm(num_groups=g, epsilon=cfg.gn_eps, dtype=cfg.dtype)(x)
        x = cfg.act(x)
        # stride-1 k3: torch padding=1 and XLA SAME are identical
        x = nn.Conv(self.width, (3, 3), strides=(1, 1), padding="SAME", dtype=cfg.dtype)(x)
        if cfg.norm == "group":
            x = nn.GroupNorm(num_groups=g, epsilon=cfg.gn_eps, dtype=cfg.dtype)(x)
        return cfg.act(x)


class ConvVAEEncoder(nn.Module):
    """[B, T, M, 1] log-mel -> {"z", "mu", "logvar"}.

    Deterministic (eval) calls return z == mu, matching how the reference
    pipeline consumes its encoder: a single latent vector per chunk, with
    ``mu`` as the embedding (``map_detector_core.py:279-288`` probes "z" then
    "mu"; our dict satisfies the same contract).
    """

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x, *, rng: jax.Array | None = None):
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        for w in cfg.widths:
            x = EncoderBlock(w, cfg)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(cfg.dense_width, dtype=cfg.dtype)(x)
        x = cfg.act(x)
        mu = nn.Dense(cfg.latent_dim, dtype=jnp.float32, name="head_mu")(x.astype(jnp.float32))
        logvar = nn.Dense(cfg.latent_dim, dtype=jnp.float32, name="head_logvar")(x.astype(jnp.float32))
        if rng is None:
            z = mu
        else:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape, mu.dtype)
        return {"z": z, "mu": mu, "logvar": logvar}


class DecoderBlock(nn.Module):
    width: int
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.width, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(self.groups, self.width), dtype=self.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(self.width, (3, 3), strides=(1, 1), padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(self.groups, self.width), dtype=self.dtype)(x)
        return nn.silu(x)


class ConvVAEDecoder(nn.Module):
    """z [B, D] -> reconstructed log-mel [B, T, M, 1]."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        bt, bm = cfg.bottleneck_hw
        w0 = cfg.widths[-1]
        x = nn.Dense(cfg.dense_width, dtype=cfg.dtype)(z.astype(cfg.dtype))
        x = nn.silu(x)
        x = nn.Dense(bt * bm * w0, dtype=cfg.dtype)(x)
        x = nn.silu(x).reshape(-1, bt, bm, w0)
        for w in reversed(cfg.widths[:-1]):
            x = DecoderBlock(w, cfg.groups, cfg.dtype)(x)
        x = nn.ConvTranspose(16, (4, 4), strides=(2, 2), padding="SAME", dtype=cfg.dtype)(x)
        x = nn.silu(x)
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32)(x.astype(jnp.float32))
        return x


@dataclasses.dataclass(frozen=True)
class DecoderSpec:
    """Structure of an INGESTED foreign decoder (models.hydra_ingest parses
    it from a torch state_dict's shapes) — the decoder-side analogue of the
    torch-compat knobs on VAEConfig. The reference's thesis baseline ships a
    decoder artifact alongside the encoder
    (``ref:docs/REPRODUCE_THESIS_BASELINE.md:33-42``, models-dir contract
    ``ref:map_detector_core.py:64-76``); this is how it becomes servable.

    Grammar (the ingest vocabulary; activations after every layer except the
    final conv): ``dense_widths`` linear layers from the latent, reshape to
    ``(bottleneck_hw, bottleneck_c)`` (torch reshapes NCHW — the mapper
    reorders the last linear's output rows), then ``stack`` entries of
    ("convt", w)  = ConvTranspose(4x4, stride 2)  [torch k4 s2 p1],
    ("upconv", w) = nearest x2 upsample + Conv(3x3) [torch Upsample+Conv2d],
    ("conv", w)   = Conv(3x3, stride 1); the last entry is the output conv
    (no norm, no activation)."""

    latent_dim: int
    dense_widths: tuple[int, ...]
    bottleneck_hw: tuple[int, int]  # (H, W) after the NCHW->NHWC reshape
    bottleneck_c: int
    stack: tuple[tuple[str, int], ...]
    norm: str = "group"
    groups: int = 8
    gn_eps: float = 1e-5
    activation: str = "silu"

    @property
    def out_hw(self) -> tuple[int, int]:
        n_up = sum(1 for kind, _ in self.stack if kind in ("convt", "upconv"))
        return (self.bottleneck_hw[0] * 2**n_up, self.bottleneck_hw[1] * 2**n_up)

    @property
    def out_channels(self) -> int:
        return self.stack[-1][1]


class IngestedDecoder(nn.Module):
    """z [B, D] -> [B, T, M, out_channels], replaying a DecoderSpec with
    torch-parity math (ConvTranspose kernels are flipped+transposed at ingest
    so flax SAME reproduces torch k4 s2 p1 bitwise; nearest upsample is
    jnp.repeat). Layer names are positional (Dense_i / Layer_i / Norm_i) so
    the shape-based mapper has deterministic slots."""

    spec: DecoderSpec

    @nn.compact
    def __call__(self, z):
        spec = self.spec
        act = getattr(nn, spec.activation)
        x = z.astype(jnp.float32)
        for i, w in enumerate(spec.dense_widths):
            x = nn.Dense(w, name=f"Dense_{i}")(x)
            x = act(x)
        h, wd = spec.bottleneck_hw
        x = x.reshape(-1, h, wd, spec.bottleneck_c)
        last = len(spec.stack) - 1
        for i, (kind, w) in enumerate(spec.stack):
            if kind == "convt":
                x = nn.ConvTranspose(w, (4, 4), strides=(2, 2), padding="SAME",
                                     name=f"Layer_{i}")(x)
            else:
                if kind == "upconv":
                    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(w, (3, 3), strides=(1, 1), padding="SAME",
                            name=f"Layer_{i}")(x)
            if i < last:
                if spec.norm == "group":
                    x = nn.GroupNorm(num_groups=min(spec.groups, w),
                                     epsilon=spec.gn_eps, name=f"Norm_{i}")(x)
                x = act(x)
        return x


class ConvVAE(nn.Module):
    """Full VAE: encode (reparameterized), decode, return everything the
    training loss needs. ``decoder_spec`` swaps the native decoder for an
    ingested foreign-structure decoder (train-vae --init-from warm start);
    its out_hw must equal cfg.input_hw for the recon loss."""

    cfg: VAEConfig
    decoder_spec: DecoderSpec | None = None

    def setup(self):
        self.encoder = ConvVAEEncoder(self.cfg)
        if self.decoder_spec is not None:
            if self.decoder_spec.out_hw != tuple(self.cfg.input_hw):
                raise ValueError(
                    f"decoder_spec reconstructs {self.decoder_spec.out_hw}, "
                    f"encoder consumes {tuple(self.cfg.input_hw)}"
                )
            if self.decoder_spec.latent_dim != self.cfg.latent_dim:
                raise ValueError(
                    f"decoder_spec.latent_dim={self.decoder_spec.latent_dim} "
                    f"!= cfg.latent_dim={self.cfg.latent_dim}"
                )
            if self.decoder_spec.stack[-1][1] != 1:
                # the recon loss compares against [B, T, M, 1] mels; a wider
                # output conv would numpy-broadcast silently into a wrong loss
                raise ValueError(
                    "decoder_spec's output conv has "
                    f"{self.decoder_spec.stack[-1][1]} channels; the recon "
                    "target is single-channel mel"
                )
            self.decoder = IngestedDecoder(self.decoder_spec)
        else:
            self.decoder = ConvVAEDecoder(self.cfg)

    def __call__(self, x, *, rng: jax.Array | None = None):
        enc = self.encoder(x, rng=rng)
        recon = self.decoder(enc["z"])
        return {"recon": recon, **enc}

    def encode(self, x):
        return self.encoder(x)


def init_encoder(cfg: VAEConfig, seed: int = 0):
    """Initialize encoder params for the standard input shape."""
    enc = ConvVAEEncoder(cfg)
    t, m = cfg.input_hw
    params = enc.init(jax.random.PRNGKey(seed), jnp.zeros((1, t, m, 1), jnp.float32))
    return enc, params


def init_vae(cfg: VAEConfig, seed: int = 0, decoder_spec: DecoderSpec | None = None):
    vae = ConvVAE(cfg, decoder_spec=decoder_spec)
    t, m = cfg.input_hw
    rng = jax.random.PRNGKey(seed)
    params = vae.init({"params": rng}, jnp.zeros((1, t, m, 1), jnp.float32), rng=rng)
    return vae, params


def init_ingested_decoder(spec: DecoderSpec, seed: int = 0):
    """Initialize IngestedDecoder params (the template ingest restores into)."""
    dec = IngestedDecoder(spec)
    params = dec.init(jax.random.PRNGKey(seed), jnp.zeros((1, spec.latent_dim), jnp.float32))
    return dec, params


def encoder_params_from_vae(vae_params) -> Any:
    """Extract the encoder subtree from full-VAE params (for serving)."""
    return {"params": vae_params["params"]["encoder"]}
