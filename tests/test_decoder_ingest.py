"""Decoder-artifact ingest (models.hydra_ingest decoder vocabulary).

The reference's thesis baseline ships a *decoder* checkpoint alongside the
encoder (ref:docs/REPRODUCE_THESIS_BASELINE.md:33-42 —
bird_net_vae_audio_splitted_decoder_v0/model.pt; models-dir contract
ref:map_detector_core.py:64-76). These tests pin:

- bit-parity of an ingested torch decoder (ConvTranspose2d family, nearest-
  upsample family, BatchNorm-folded family) vs the alien torch module;
- recon-parity of an ingested encoder+decoder PAIR (x -> z -> x_hat) — the
  strongest available proxy validation given the true artifact needs the
  private soundscape_vae package;
- a warm-started train step from ingested weights (train-vae --init-from).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
from torch import nn as torch_nn
from torch.nn import functional as F

from anuraxla.models.hydra_ingest import (
    UnsupportedLayerError,
    infer_decoder_spec_from_state_dict,
    ingest_foreign_decoder,
)
from anuraxla.models.vae import IngestedDecoder

LATENT, M = 6, 16


class ConvTDecoder(torch_nn.Module):
    """ConvTranspose family: Linear x2 -> reshape -> [ConvT k4s2 + GN + Conv
    k3 + GN] -> ConvT + GN -> output Conv. n_up=2 -> T = H0*4 = 24."""

    C0, H0, W0 = 12, 6, 4

    def __init__(self, norm: str = "gn"):
        super().__init__()
        mk_norm = {
            "gn": lambda c: torch_nn.GroupNorm(2, c),
            "bn": lambda c: torch_nn.BatchNorm2d(c),
            "none": lambda c: torch_nn.Identity(),
        }[norm]
        self.fc1 = torch_nn.Linear(LATENT, 20)
        self.fc2 = torch_nn.Linear(20, self.C0 * self.H0 * self.W0)
        self.ct1 = torch_nn.ConvTranspose2d(self.C0, 8, 4, stride=2, padding=1)
        self.n1 = mk_norm(8)
        self.c1 = torch_nn.Conv2d(8, 8, 3, padding=1)
        self.n2 = mk_norm(8)
        self.ct2 = torch_nn.ConvTranspose2d(8, 4, 4, stride=2, padding=1)
        self.n3 = mk_norm(4)
        self.out = torch_nn.Conv2d(4, 1, 3, padding=1)

    def forward(self, z):
        x = F.silu(self.fc1(z))
        x = F.silu(self.fc2(x)).view(-1, self.C0, self.H0, self.W0)
        x = F.silu(self.n1(self.ct1(x)))
        x = F.silu(self.n2(self.c1(x)))
        x = F.silu(self.n3(self.ct2(x)))
        return self.out(x)


class UpsampleDecoder(torch_nn.Module):
    """Nearest-upsample family: one Linear -> reshape -> [Upsample(2) + Conv
    k3 + GN] x2 -> output conv (the last conv gets NO upsample)."""

    C0, H0, W0 = 10, 5, 4

    def __init__(self):
        super().__init__()
        self.fc = torch_nn.Linear(LATENT, self.C0 * self.H0 * self.W0)
        self.c1 = torch_nn.Conv2d(self.C0, 8, 3, padding=1)
        self.n1 = torch_nn.GroupNorm(2, 8)
        self.c2 = torch_nn.Conv2d(8, 4, 3, padding=1)
        self.n2 = torch_nn.GroupNorm(2, 4)
        self.out = torch_nn.Conv2d(4, 1, 3, padding=1)

    def forward(self, z):
        x = F.silu(self.fc(z)).view(-1, self.C0, self.H0, self.W0)
        x = F.silu(self.n1(self.c1(F.interpolate(x, scale_factor=2, mode="nearest"))))
        x = F.silu(self.n2(self.c2(F.interpolate(x, scale_factor=2, mode="nearest"))))
        return self.out(x)


def _parity(mod, spec, params, rng, atol=2e-5):
    z = rng.standard_normal((3, LATENT)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(z)).numpy()  # [B, 1, T, M]
    got = np.asarray(IngestedDecoder(spec).apply(params, jnp.asarray(z)))
    assert got.shape == (3, *spec.out_hw, 1)
    np.testing.assert_allclose(got[..., 0], ref[:, 0], rtol=1e-4, atol=atol)


def test_convtranspose_decoder_parity(rng, tmp_path):
    torch.manual_seed(0)
    mod = ConvTDecoder().eval()
    pt = tmp_path / "dec.pt"
    torch.save(mod, pt)
    spec, params, meta = ingest_foreign_decoder(pt, n_mels=M, groups=2)
    assert spec.stack == (("convt", 8), ("conv", 8), ("convt", 4), ("conv", 1))
    assert spec.out_hw == (24, 16) and spec.norm == "group"
    assert spec.dense_widths == (20, ConvTDecoder.C0 * 6 * 4)
    _parity(mod, spec, params, rng)


def test_convtranspose_decoder_from_bare_state_dict(rng, tmp_path):
    torch.manual_seed(1)
    mod = ConvTDecoder().eval()
    pt = tmp_path / "dec_sd.pt"
    torch.save(mod.state_dict(), pt)
    spec, params, _ = ingest_foreign_decoder(pt, n_mels=M, groups=2)
    _parity(mod, spec, params, rng)


def test_batchnorm_decoder_folds_to_parity(rng, tmp_path):
    torch.manual_seed(2)
    mod = ConvTDecoder(norm="bn")
    # give BN non-trivial running stats, then eval
    with torch.no_grad():
        for _ in range(3):
            mod(torch.randn(8, LATENT))
    mod = mod.eval()
    pt = tmp_path / "dec_bn.pt"
    torch.save(mod, pt)
    spec, params, _ = ingest_foreign_decoder(pt, n_mels=M)
    assert spec.norm == "none"
    _parity(mod, spec, params, rng, atol=1e-4)


def test_upsample_decoder_parity(rng, tmp_path):
    torch.manual_seed(3)
    mod = UpsampleDecoder().eval()
    pt = tmp_path / "dec_up.pt"
    torch.save(mod, pt)
    spec, params, _ = ingest_foreign_decoder(pt, n_mels=M, groups=2)
    assert spec.stack == (("upconv", 8), ("upconv", 4), ("conv", 1))
    assert spec.out_hw == (20, 16)
    _parity(mod, spec, params, rng)


def test_decoder_odd_bottleneck_parity(rng, tmp_path):
    """Odd H0: flax SAME conv-transpose must still match torch k4s2p1."""

    torch.manual_seed(4)
    mod = ConvTDecoder().eval()
    # H0=6 is even; fake an odd case by reusing the module at trace level is
    # not possible — instead pin the primitive directly on odd spatial dims
    ct = torch_nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1).eval()
    x = torch.from_numpy(rng.standard_normal((2, 3, 5, 7)).astype(np.float32))
    with torch.no_grad():
        ref = ct(x).numpy()
    from anuraxla.models.hydra_ingest import convert_convtranspose
    from flax import linen as nn

    p = convert_convtranspose(ct.weight, ct.bias)
    got = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME").apply(
        {"params": {"kernel": jnp.asarray(p["kernel"]),
                    "bias": jnp.asarray(p["bias"])}},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=2e-5
    )
    del mod


def test_decoder_error_paths(tmp_path):
    torch.manual_seed(5)
    # 5x5 kernels: named error
    sd = {"c.weight": torch.randn(4, 2, 5, 5), "c.bias": torch.randn(4)}
    with pytest.raises(UnsupportedLayerError, match="4x4 ConvTranspose2d"):
        infer_decoder_spec_from_state_dict(sd, n_mels=M)
    # conv before linear
    mod = ConvTDecoder()
    sd = dict(mod.state_dict())
    reordered = {k: sd[k] for k in list(sd)[4:] + list(sd)[:4]}
    with pytest.raises(UnsupportedLayerError):
        infer_decoder_spec_from_state_dict(reordered, n_mels=M)
    # bottleneck that cannot decode to n_mels
    with pytest.raises(UnsupportedLayerError, match="divisible"):
        infer_decoder_spec_from_state_dict(mod.state_dict(), n_mels=10)


def test_runnable_decoder_shape_cross_check(tmp_path):
    """A pickled runnable decoder whose real output contradicts the shape
    inference (wrong n_mels) fails loudly, naming both shapes."""
    torch.manual_seed(6)
    mod = ConvTDecoder().eval()
    pt = tmp_path / "dec.pt"
    torch.save(mod, pt)
    # n_mels=4: W0=1, H0=24 -> inferred out (96, 4); the real module says (24, 16)
    with pytest.raises(UnsupportedLayerError, match="reconstructs"):
        ingest_foreign_decoder(pt, n_mels=4)


# ---------------------------------------------------------------------------
# Encoder+decoder pair: recon parity and warm start
# ---------------------------------------------------------------------------

T_ENC = 24  # ConvTDecoder reconstructs (24, 16); pair an encoder that consumes it


class PairEncoder(torch_nn.Module):
    """In-vocabulary avgpool-family encoder consuming [B,1,24,16] (floor
    halving makes the closed-form smallest-frames match EXACTLY 24 — the
    stride family's ceil halving would infer the class minimum 21)."""

    def __init__(self):
        super().__init__()
        self.c0 = torch_nn.Conv2d(1, 8, 3, padding=1)
        self.g0 = torch_nn.GroupNorm(2, 8)
        self.c1 = torch_nn.Conv2d(8, 16, 3, padding=1)
        self.g1 = torch_nn.GroupNorm(2, 16)
        self.proj = torch_nn.Linear((T_ENC // 4) * (M // 4) * 16, 20)
        self.head_mu = torch_nn.Linear(20, LATENT)
        self.head_lv = torch_nn.Linear(20, LATENT)

    def forward(self, x):
        x = F.avg_pool2d(F.silu(self.g0(self.c0(x))), 2)
        x = F.avg_pool2d(F.silu(self.g1(self.c1(x))), 2)
        x = F.silu(self.proj(x.flatten(1)))
        return self.head_mu(x)


def test_ingested_pair_recon_parity(rng, tmp_path):
    """x -> z -> x_hat through the ingested flax pair matches the torch pair
    — the reconstruction-side parity validation VERDICT r3 missing #1 names
    (the strongest proxy available without the private soundscape_vae)."""
    from anuraxla.models.hydra_ingest import ingest_foreign_checkpoint
    from anuraxla.models.vae import ConvVAEEncoder

    torch.manual_seed(7)
    enc_t = PairEncoder().eval()
    dec_t = ConvTDecoder().eval()
    enc_pt, dec_pt = tmp_path / "enc.pt", tmp_path / "dec.pt"
    torch.save(enc_t, enc_pt)
    torch.save(dec_t, dec_pt)

    ecfg, eparams, _ = ingest_foreign_checkpoint(enc_pt, n_mels=M, groups=2)
    spec, dparams, _ = ingest_foreign_decoder(dec_pt, n_mels=M, groups=2)
    assert ecfg.input_hw == (T_ENC, M) == spec.out_hw

    x = rng.standard_normal((2, 1, T_ENC, M)).astype(np.float32)
    with torch.no_grad():
        z_t = enc_t(torch.from_numpy(x))
        xhat_t = dec_t(z_t).numpy()
    z = ConvVAEEncoder(ecfg).apply(eparams, jnp.asarray(x.transpose(0, 2, 3, 1)))["mu"]
    xhat = np.asarray(IngestedDecoder(spec).apply(dparams, z))
    np.testing.assert_allclose(xhat[..., 0], xhat_t[:, 0], rtol=1e-3, atol=1e-4)


def test_ingest_decoder_cli_and_artifact_roundtrip(rng, tmp_path, monkeypatch, capsys):
    """The ingest-decoder CLI (--verify) writes an artifact that load_decoder
    round-trips to bit-parity with the torch module."""
    import sys

    from anuraxla.cli.ingest_decoder import main as cli_main
    from anuraxla.models.checkpoint import load_decoder

    torch.manual_seed(9)
    mod = ConvTDecoder().eval()
    pt = tmp_path / "dec.pt"
    torch.save(mod, pt)
    out = tmp_path / "artifact"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--pt", str(pt), "--out", str(out),
        "--n-mels", str(M), "--groups", "2", "--verify",
    ])
    cli_main()
    assert "✅ verified" in capsys.readouterr().out
    dec, params, spec = load_decoder(out)
    _parity(mod, spec, params, rng)


def test_warm_started_train_step(rng, tmp_path):
    """train-vae --init-from: a ConvVAE built around the ingested encoder
    config + ingested decoder spec takes a real gradient step from the
    foreign weights (loss finite, params move, recon shape right)."""
    import jax

    from anuraxla.models.hydra_ingest import ingest_foreign_checkpoint
    from anuraxla.models.train import TrainConfig, TrainState, make_optimizer, make_train_step
    from anuraxla.models.vae import ConvVAE

    torch.manual_seed(8)
    enc_pt, dec_pt = tmp_path / "enc.pt", tmp_path / "dec.pt"
    torch.save(PairEncoder().eval(), enc_pt)
    torch.save(ConvTDecoder().eval(), dec_pt)
    ecfg, eparams, _ = ingest_foreign_checkpoint(enc_pt, n_mels=M, groups=2)
    spec, dparams, _ = ingest_foreign_decoder(dec_pt, n_mels=M, groups=2)

    vae = ConvVAE(ecfg, decoder_spec=spec)
    params = {"params": {"encoder": eparams["params"], "decoder": dparams["params"]}}
    # warmup_steps=1: the LR warmup schedule starts at 0, so a single step
    # from a 200-step warmup would provably not move params
    tc = TrainConfig(total_steps=4, batch_size=2, kl_delay_steps=0,
                     kl_warmup_steps=0, warmup_steps=1)
    state = TrainState.create(apply_fn=vae.apply, params=params, tx=make_optimizer(tc))
    step = jax.jit(make_train_step(vae, beta=0.1))
    batch = jnp.asarray(rng.standard_normal((2, T_ENC, M, 1)).astype(np.float32))
    metrics = None
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    enc_before = np.asarray(eparams["params"]["EncoderBlock_0"]["Conv_0"]["kernel"])
    enc_after = np.asarray(
        state.params["params"]["encoder"]["EncoderBlock_0"]["Conv_0"]["kernel"]
    )
    dec_before = np.asarray(dparams["params"]["Layer_0"]["kernel"])
    dec_after = np.asarray(state.params["params"]["decoder"]["Layer_0"]["kernel"])
    assert not np.array_equal(enc_before, enc_after), "encoder never moved"
    assert not np.array_equal(dec_before, dec_after), "decoder never moved"


def test_trailing_groupnorm_decoder_rejected():
    """A GroupNorm AFTER the output conv has no DecoderSpec slot — it must
    raise a named error, not silently drop the norm's parameters."""
    torch.manual_seed(7)
    sd = dict(UpsampleDecoder().state_dict())
    sd["gout.weight"] = torch.ones(1)
    sd["gout.bias"] = torch.zeros(1)
    with pytest.raises(UnsupportedLayerError, match="GroupNorm"):
        infer_decoder_spec_from_state_dict(sd, n_mels=M)


def test_convvae_rejects_multichannel_decoder_spec(rng):
    """The recon loss compares against [B, T, M, 1]; a decoder spec whose
    output conv is wider would broadcast silently — setup must refuse."""
    import jax

    from anuraxla.models.vae import ConvVAE, DecoderSpec, VAEConfig

    spec = DecoderSpec(
        latent_dim=LATENT, dense_widths=(10 * 5 * 4,), bottleneck_hw=(5, 4),
        bottleneck_c=10, stack=(("upconv", 8), ("conv", 2)), norm="group",
        groups=2, gn_eps=1e-5,
    )
    cfg = VAEConfig(latent_dim=LATENT, widths=(4, 8), dense_width=12,
                    groups=2, input_hw=spec.out_hw)
    x = jnp.asarray(rng.standard_normal((1, *spec.out_hw, 1)).astype(np.float32))
    with pytest.raises(ValueError, match="single-channel"):
        ConvVAE(cfg, decoder_spec=spec).init(jax.random.PRNGKey(0), x)
