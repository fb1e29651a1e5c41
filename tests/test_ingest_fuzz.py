"""Ingest property-fuzz harness (VERDICT r4 item 5).

The real external artifact (the reference's private ``soundscape_vae``
checkpoint, ``ref:map_detector_core.py:107-179``) will arrive as an
arbitrary point in the documented ingest vocabulary. The hand-picked twins
in test_hydra_ingest / test_decoder_ingest pin each family once; this file
sweeps the vocabulary with SEEDED random architectures — stride-pair vs
avgpool downsampling x GroupNorm/BatchNorm(affine or not)/none x 1-2 heads
x random widths/depths/frames x bare/wrapped/pickled-module checkpoints —
and requires, for every config, either bit-close latent/recon parity with
the torch twin or a named UnsupportedLayerError.

Coverage: 56 encoder configs + 24 decoder configs + seeded out-of-vocab
mutations + 2 full ingest-encoder --verify CLI round-trips through a
generated Hydra _target_ tree (>= the 50-config VERDICT criterion).
"""

from __future__ import annotations

import json
import sys
import warnings

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as torch_nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from anuraxla.models.hydra_ingest import (  # noqa: E402
    UnsupportedLayerError,
    infer_decoder_spec_from_state_dict,
    infer_vae_config_from_state_dict,
    ingest_foreign_checkpoint,
    ingest_foreign_decoder,
)
from anuraxla.models.vae import (  # noqa: E402
    ConvVAEEncoder,
    IngestedDecoder,
    bottleneck_for,
)

N_ENCODER_CASES = 56
N_DECODER_CASES = 24


# ---------------------------------------------------------------------------
# Random encoder specs + torch twins
# ---------------------------------------------------------------------------

def _rand_encoder_spec(seed: int) -> dict:
    """One seeded random point in the documented encoder ingest vocabulary."""
    r = np.random.default_rng(seed)
    depth = int(r.integers(1, 4))
    spec = {
        "seed": seed,
        "family": str(r.choice(["stride", "avgpool"])),
        "depth": depth,
        # widths are multiples of 4 so any groups in {1,2,4} divides them
        "widths": tuple(int(w) for w in r.choice([4, 8, 12, 16], size=depth)),
        "groups": int(r.choice([1, 2, 4])),
        "norm": str(r.choice(["gn", "bn", "bn_na", "none"])),
        "bias": bool(r.integers(0, 2)),
        "heads": int(r.choice([1, 2])),
        "latent": int(r.integers(3, 12)),
        "dense": int(r.integers(8, 40)),
        "n_mels": int(r.choice([16, 32])),
        # >=8: auto_find_frames searches target_frames in [8, 4096] (real
        # mel planes are never shorter); avgpool floor-halving keeps t>=1
        "frames": int(r.integers(8, 64)),
        "save": str(r.choice(["bare", "wrapped", "module"])),
    }
    return spec


def _mk_norm2d(norm: str, groups: int, c: int) -> torch_nn.Module:
    if norm == "gn":
        return torch_nn.GroupNorm(groups, c)
    if norm == "bn":
        return torch_nn.BatchNorm2d(c)
    if norm == "bn_na":
        return torch_nn.BatchNorm2d(c, affine=False)
    return torch_nn.Identity()  # registers no tensors


class _FuzzEncoder(torch_nn.Module):
    """Torch twin for a random encoder spec: conv blocks in the chosen
    family, NCHW flatten, dense + SiLU, then 1 (mu) or 2 (mu+logvar) heads
    — the shape grammar of ``parse_layer_stream``."""

    def __init__(self, spec: dict):
        super().__init__()
        self.two_heads = spec["heads"] == 2
        chans = [1] + list(spec["widths"])
        body = []
        for i, w in enumerate(spec["widths"]):
            if spec["family"] == "stride":
                body += [
                    torch_nn.Conv2d(chans[i], w, 3, stride=2, padding=1,
                                    bias=spec["bias"]),
                    _mk_norm2d(spec["norm"], spec["groups"], w),
                    torch_nn.SiLU(),
                    torch_nn.Conv2d(w, w, 3, padding=1, bias=spec["bias"]),
                    _mk_norm2d(spec["norm"], spec["groups"], w),
                    torch_nn.SiLU(),
                ]
            else:
                body += [
                    torch_nn.Conv2d(chans[i], w, 3, padding=1,
                                    bias=spec["bias"]),
                    _mk_norm2d(spec["norm"], spec["groups"], w),
                    torch_nn.SiLU(),
                    torch_nn.AvgPool2d(2),
                ]
        self.body = torch_nn.Sequential(*body)
        bt, bm = bottleneck_for(spec["frames"], spec["n_mels"], spec["depth"],
                                spec["family"])
        self.fc = torch_nn.Linear(bt * bm * spec["widths"][-1], spec["dense"])
        self.head_mu = torch_nn.Linear(spec["dense"], spec["latent"])
        if self.two_heads:
            self.head_logvar = torch_nn.Linear(spec["dense"], spec["latent"])

    def forward(self, x):
        x = self.body(x)
        x = x.reshape(x.shape[0], -1)
        x = F.silu(self.fc(x))
        mu = self.head_mu(x)
        if self.two_heads:
            return {"mu": mu, "logvar": self.head_logvar(x)}
        return mu


def _materialize_encoder(spec: dict, tmp_path):
    """Build + (for BN) warm the torch twin, save it per spec['save'],
    return (module, checkpoint_path)."""
    torch.manual_seed(spec["seed"])
    mod = _FuzzEncoder(spec)
    if spec["norm"] in ("bn", "bn_na"):
        r = np.random.default_rng(spec["seed"] + 1)
        with torch.no_grad():
            for _ in range(2):
                mod(torch.from_numpy(r.standard_normal(
                    (4, 1, spec["frames"], spec["n_mels"])).astype(np.float32)))
    mod = mod.eval()
    pt = tmp_path / f"enc_{spec['seed']}.pt"
    if spec["save"] == "module":
        torch.save(mod, pt)
    elif spec["save"] == "wrapped":
        torch.save({"state_dict": mod.state_dict()}, pt)
    else:
        torch.save(mod.state_dict(), pt)
    return mod, pt


@pytest.mark.parametrize("seed", range(N_ENCODER_CASES))
def test_encoder_ingest_property(seed, tmp_path):
    """Property: every in-vocabulary random encoder round-trips to latent
    parity. Pickled modules disambiguate themselves via the forward-hook
    probe; bare/wrapped state_dicts get the documented --downsample hint
    (repeated-width avgpool chains can alias as stride pairs)."""
    spec = _rand_encoder_spec(seed)
    mod, pt = _materialize_encoder(spec, tmp_path)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # benign ambiguity warnings
        cfg, params, meta = ingest_foreign_checkpoint(
            pt, n_mels=spec["n_mels"], groups=spec["groups"],
            downsample=None if spec["save"] == "module" else spec["family"],
        )

    # structure recovered exactly
    assert cfg.downsample == spec["family"], spec
    assert tuple(cfg.widths) == spec["widths"], spec
    assert cfg.latent_dim == spec["latent"] and cfg.dense_width == spec["dense"]
    assert cfg.norm == ("group" if spec["norm"] == "gn" else "none"), spec
    assert cfg.groups == spec["groups"]
    # auto-frames recovers an input length with the TRUE bottleneck (several
    # T can share one bottleneck under ceil/floor halving; any of them is a
    # valid reading and the conv twin is shape-agnostic)
    assert bottleneck_for(cfg.input_hw[0], spec["n_mels"], spec["depth"],
                          spec["family"]) == \
        bottleneck_for(spec["frames"], spec["n_mels"], spec["depth"],
                       spec["family"]), spec

    t = cfg.input_hw[0]
    x = np.random.default_rng(seed + 2).standard_normal(
        (2, 1, t, spec["n_mels"])).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x))
    out = ConvVAEEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    if spec["heads"] == 2:
        np.testing.assert_allclose(np.asarray(out["mu"]), ref["mu"].numpy(),
                                   rtol=5e-4, atol=3e-5, err_msg=str(spec))
        np.testing.assert_allclose(np.asarray(out["logvar"]),
                                   ref["logvar"].numpy(),
                                   rtol=5e-4, atol=3e-5, err_msg=str(spec))
    else:
        np.testing.assert_allclose(np.asarray(out["mu"]), ref.numpy(),
                                   rtol=5e-4, atol=3e-5, err_msg=str(spec))
        assert np.all(np.asarray(out["logvar"]) == 0.0)


# ---------------------------------------------------------------------------
# Random decoder specs + torch twins
# ---------------------------------------------------------------------------

def _rand_decoder_spec(seed: int) -> dict:
    r = np.random.default_rng(10_000 + seed)
    n_up = int(r.integers(1, 3))
    spec = {
        "seed": seed,
        "family": str(r.choice(["convt", "upconv"])),
        "latent": int(r.integers(3, 10)),
        "n_lin": int(r.integers(1, 3)),
        "mid_dense": int(r.integers(8, 32)),
        "groups": int(r.choice([1, 2])),
        "c0": int(r.choice([4, 8, 12])),
        "h0": int(r.integers(2, 7)),
        "w0": int(r.choice([2, 4])),
        "n_up": n_up,
        "up_widths": tuple(int(w) for w in r.choice([4, 8, 12], size=n_up)),
        # convt family only: a plain stride-1 3x3 conv after each up step
        "interleave": bool(r.integers(0, 2)),
        "norm": str(r.choice(["gn", "bn", "none"])),
        "bias": bool(r.integers(0, 2)),
        "out_ch": int(r.choice([1, 2])),
        # a trailing BatchNorm on the output conv folds away (a trailing
        # GroupNorm is out-of-vocabulary and tested in the negatives)
        "tail_bn": bool(r.integers(0, 2)) and str(r.choice(["bn"])) == "bn",
    }
    spec["n_mels"] = spec["w0"] * 2 ** n_up
    return spec


class _FuzzDecoder(torch_nn.Module):
    """Torch twin for a random decoder spec: linears -> NCHW reshape ->
    up-stack (ConvTranspose k4 s2 p1 family or nearest-upsample + Conv k3
    family) -> output 3x3 conv — ``parse_decoder_stream``'s grammar."""

    def __init__(self, spec: dict):
        super().__init__()
        self.spec = spec
        flat = spec["c0"] * spec["h0"] * spec["w0"]
        lins = []
        if spec["n_lin"] == 2:
            lins += [torch_nn.Linear(spec["latent"], spec["mid_dense"])]
            lins += [torch_nn.Linear(spec["mid_dense"], flat)]
        else:
            lins += [torch_nn.Linear(spec["latent"], flat)]
        self.lins = torch_nn.ModuleList(lins)
        stack, self.kinds = [], []
        c = spec["c0"]
        for w in spec["up_widths"]:
            if spec["family"] == "convt":
                stack += [torch_nn.ConvTranspose2d(c, w, 4, stride=2,
                                                   padding=1, bias=spec["bias"]),
                          _mk_norm2d(spec["norm"], spec["groups"], w)]
                self.kinds.append("convt")
                if spec["interleave"]:
                    stack += [torch_nn.Conv2d(w, w, 3, padding=1,
                                              bias=spec["bias"]),
                              _mk_norm2d(spec["norm"], spec["groups"], w)]
                    self.kinds.append("conv")
            else:
                stack += [torch_nn.Conv2d(c, w, 3, padding=1,
                                          bias=spec["bias"]),
                          _mk_norm2d(spec["norm"], spec["groups"], w)]
                self.kinds.append("upconv")
            c = w
        stack += [torch_nn.Conv2d(c, spec["out_ch"], 3, padding=1),
                  torch_nn.BatchNorm2d(spec["out_ch"]) if spec["tail_bn"]
                  else torch_nn.Identity()]
        self.kinds.append("conv")
        self.stack = torch_nn.ModuleList(stack)
        self.widths = tuple(list(spec["up_widths"]) + [spec["out_ch"]]) \
            if not (spec["family"] == "convt" and spec["interleave"]) else \
            tuple([w for u in spec["up_widths"] for w in (u, u)] + [spec["out_ch"]])

    def forward(self, z):
        x = z
        for lin in self.lins:
            x = F.silu(lin(x))
        s = self.spec
        x = x.view(-1, s["c0"], s["h0"], s["w0"])
        n = len(self.stack)
        for i in range(0, n - 2, 2):
            if s["family"] == "upconv":
                x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = F.silu(self.stack[i + 1](self.stack[i](x)))
        return self.stack[n - 1](self.stack[n - 2](x))


@pytest.mark.parametrize("seed", range(N_DECODER_CASES))
def test_decoder_ingest_property(seed, tmp_path):
    spec = _rand_decoder_spec(seed)
    torch.manual_seed(20_000 + seed)
    mod = _FuzzDecoder(spec)
    if spec["norm"] == "bn" or spec["tail_bn"]:
        with torch.no_grad():
            for _ in range(2):
                mod(torch.from_numpy(np.random.default_rng(seed).standard_normal(
                    (3, spec["latent"])).astype(np.float32)))
    mod = mod.eval()
    pt = tmp_path / f"dec_{seed}.pt"
    torch.save(mod.state_dict() if seed % 2 else mod, pt)

    dspec, params, meta = ingest_foreign_decoder(
        pt, n_mels=spec["n_mels"], groups=spec["groups"])

    assert dspec.latent_dim == spec["latent"]
    assert len(dspec.dense_widths) == spec["n_lin"]
    assert dspec.bottleneck_c == spec["c0"]
    assert dspec.bottleneck_hw == (spec["h0"], spec["w0"])
    assert tuple(k for k, _ in dspec.stack) == tuple(mod.kinds), spec
    assert tuple(w for _, w in dspec.stack) == mod.widths, spec
    assert dspec.norm == ("group" if spec["norm"] == "gn" else "none")
    assert dspec.out_hw == (spec["h0"] * 2 ** spec["n_up"], spec["n_mels"])

    z = np.random.default_rng(seed + 5).standard_normal(
        (3, spec["latent"])).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(z)).numpy()  # [B, C, T, M]
    got = np.asarray(IngestedDecoder(dspec).apply(params, jnp.asarray(z)))
    assert got.shape == (3, *dspec.out_hw, spec["out_ch"])
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=5e-4, atol=5e-5, err_msg=str(spec))


# ---------------------------------------------------------------------------
# Out-of-vocabulary mutations -> named errors (never a silent mis-map)
# ---------------------------------------------------------------------------

def _valid_encoder_sd() -> dict:
    """A tiny in-vocabulary synthetic stream (np arrays are fine: the parsers
    are shape-based)."""
    r = np.random.default_rng(0)
    f = lambda *s: r.standard_normal(s).astype(np.float32)  # noqa: E731
    return {
        "b0.conv1.weight": f(8, 1, 3, 3), "b0.conv1.bias": f(8),
        "b0.gn1.weight": f(8), "b0.gn1.bias": f(8),
        "b0.conv2.weight": f(8, 8, 3, 3), "b0.conv2.bias": f(8),
        "b0.gn2.weight": f(8), "b0.gn2.bias": f(8),
        "fc.weight": f(16, 8 * 2 * 4), "fc.bias": f(16),
        "mu.weight": f(4, 16), "mu.bias": f(4),
    }


ENCODER_MUTATIONS = [
    # (mutation fn, substring the named error must carry)
    (lambda sd: sd.update({"b0.conv1.weight":
                           np.zeros((8, 1, 5, 5), np.float32)}),
     "kernel 5x5"),
    (lambda sd: sd.update({"late.conv.weight":
                           np.zeros((8, 8, 3, 3), np.float32),
                           "late.conv.bias": np.zeros(8, np.float32)}),
     "after a linear"),
    (lambda sd: sd.update({"extra1.weight": np.zeros((4, 16), np.float32),
                           "extra1.bias": np.zeros(4, np.float32),
                           "extra2.weight": np.zeros((4, 16), np.float32),
                           "extra2.bias": np.zeros(4, np.float32)}),
     "head"),
    (lambda sd: sd.pop("fc.bias"), "bias"),
    (lambda sd: sd.update({"odd.weight": np.zeros((3, 3, 3), np.float32)}),
     "rank 3"),
    # ordering matters for stream parsing: rebuild the dict with the extra
    # tensors at the RIGHT position (dict.update appends at the tail)
    (lambda sd: _insert_after(sd, "b0.gn2.bias", {
        "b0.gn2.running_mean": np.zeros(8, np.float32),
        "b0.gn2.running_var": np.ones(8, np.float32),
    }), "mixed normalization"),
    (lambda sd: _insert_after(sd, "b0.gn1.bias", {
        "b0.gn1x.weight": np.zeros(8, np.float32),
        "b0.gn1x.bias": np.zeros(8, np.float32),
        "b0.gn1y.weight": np.zeros(8, np.float32),
        "b0.gn1y.bias": np.zeros(8, np.float32),
    }), "per-channel"),
]


def _insert_after(sd: dict, key: str, extra: dict) -> None:
    """Re-order sd in place so `extra`'s tensors follow `key` in the stream."""
    items = []
    for k, v in list(sd.items()):
        items.append((k, v))
        if k == key:
            items.extend(extra.items())
    sd.clear()
    sd.update(items)


@pytest.mark.parametrize("idx", range(len(ENCODER_MUTATIONS)))
def test_encoder_out_of_vocab_mutations_named(idx):
    """Each mutation pushes a valid stream out of the vocabulary; the error
    must be UnsupportedLayerError and must describe the offending structure
    (VERDICT r2 item 6 carried into the fuzz harness)."""
    mutate, needle = ENCODER_MUTATIONS[idx]
    sd = _valid_encoder_sd()
    # mutations append at the end of the dict; for the 'after a linear' and
    # head cases that is exactly the right position
    mutate(sd)
    with pytest.raises(UnsupportedLayerError) as ei:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            infer_vae_config_from_state_dict(sd, n_mels=8)
    assert needle.lower() in str(ei.value).lower(), str(ei.value)


def test_decoder_trailing_groupnorm_named():
    """A GroupNorm after the decoder's output conv cannot be represented in
    the spec grammar — the named error, not a silently-dropped norm."""
    r = np.random.default_rng(1)
    f = lambda *s: r.standard_normal(s).astype(np.float32)  # noqa: E731
    sd = {
        "fc.weight": f(4 * 2 * 2, 6), "fc.bias": f(4 * 2 * 2),
        "ct.weight": f(4, 4, 4, 4), "ct.bias": f(4),
        "out.weight": f(1, 4, 3, 3), "out.bias": f(1),
        "tail_gn.weight": f(1), "tail_gn.bias": f(1),
    }
    with pytest.raises(UnsupportedLayerError, match="GroupNorm"):
        infer_decoder_spec_from_state_dict(sd, n_mels=4, groups=1)


def test_decoder_unsolvable_bottleneck_named():
    r = np.random.default_rng(2)
    f = lambda *s: r.standard_normal(s).astype(np.float32)  # noqa: E731
    sd = {
        "fc.weight": f(4 * 2 * 3, 6), "fc.bias": f(4 * 2 * 3),  # flat=24
        "ct.weight": f(4, 4, 4, 4), "ct.bias": f(4),
        "out.weight": f(1, 4, 3, 3), "out.bias": f(1),
    }
    # n_mels=16 -> w0=8, c*w0=32 does not divide flat=24
    with pytest.raises(UnsupportedLayerError, match="not divisible"):
        infer_decoder_spec_from_state_dict(sd, n_mels=16, groups=1)


# ---------------------------------------------------------------------------
# Full CLI round-trip through a generated Hydra _target_ tree
# ---------------------------------------------------------------------------

def _sequential_yaml_tree(widths, groups, dense, latent, bt, bm):
    """A Hydra-style encoder config in the torch.nn vocabulary whose
    instantiation is a plain nn.Sequential (single mu head: Sequential has
    one output) — the ingest-encoder --verify oracle rebuilds exactly this."""
    blocks = []
    chans = [1] + list(widths)
    for i, w in enumerate(widths):
        blocks += [
            {"_target_": "torch.nn.Conv2d", "_args_": [chans[i], w, 3],
             "stride": 2, "padding": 1},
            {"_target_": "torch.nn.GroupNorm", "_args_": [groups, w]},
            {"_target_": "torch.nn.SiLU"},
            {"_target_": "torch.nn.Conv2d", "_args_": [w, w, 3], "padding": 1},
            {"_target_": "torch.nn.GroupNorm", "_args_": [groups, w]},
            {"_target_": "torch.nn.SiLU"},
        ]
    blocks += [
        {"_target_": "torch.nn.Flatten"},
        {"_target_": "torch.nn.Linear", "_args_": [bt * bm * widths[-1], dense]},
        {"_target_": "torch.nn.SiLU"},
        {"_target_": "torch.nn.Linear", "_args_": [dense, latent]},
    ]
    return {"encoder": {"_target_": "torch.nn.Sequential", "_args_": blocks}}


@pytest.mark.parametrize("seed", [0, 1])
def test_cli_verify_roundtrip_random_yaml_tree(seed, tmp_path, monkeypatch,
                                               capsys):
    """ingest-encoder --verify on a RANDOM YAML _target_ tree + twin: the
    CLI must rebuild the torch oracle from the YAML, pin latent parity, and
    save a servable artifact whose recorded input shape round-trips."""
    import yaml as _yaml

    from anuraxla.cli import ingest_encoder
    from anuraxla.models.checkpoint import load_encoder
    from anuraxla.models.hydra_ingest import (
        build_nn_module,
        instantiate_target_tree,
    )

    r = np.random.default_rng(seed + 77)
    depth = int(r.integers(1, 3))
    widths = tuple(int(w) for w in r.choice([4, 8], size=depth))
    groups = int(r.choice([1, 2]))
    dense, latent = int(r.integers(8, 24)), int(r.integers(3, 9))
    n_mels, frames = 16, int(r.integers(2**depth, 32))
    bt, bm = bottleneck_for(frames, n_mels, depth)

    tree = _sequential_yaml_tree(widths, groups, dense, latent, bt, bm)
    yml = tmp_path / "model.yaml"
    yml.write_text(_yaml.safe_dump(tree))

    torch.manual_seed(seed)
    mod = build_nn_module(instantiate_target_tree(tree["encoder"])).eval()
    pt = tmp_path / "model.pt"
    torch.save({"state_dict": mod.state_dict()}, pt)

    out_dir = tmp_path / "artifact"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--pt", str(pt), "--yaml", str(yml), "--out", str(out_dir),
        "--n-mels", str(n_mels), "--groups", str(groups), "--verify",
    ])
    ingest_encoder.main()
    out = capsys.readouterr().out
    assert "✅ verified vs torch module" in out

    _, params, cfg = load_encoder(out_dir)
    assert tuple(cfg.widths) == widths and cfg.latent_dim == latent
    x = r.standard_normal((2, 1, cfg.input_hw[0], n_mels)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x)).numpy()
    got = np.asarray(ConvVAEEncoder(cfg).apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)))["mu"])
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=3e-5)
