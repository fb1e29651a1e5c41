"""Foreign (reference-style) checkpoint ingest: a torch encoder with
arbitrary module names + Hydra YAML sidecar must round-trip to latent parity
through shape-based mapping, closed-form auto-frames, and the TORCH padding /
gn_eps compatibility path (VERDICT r1 item 4)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as torch_nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from anuraxla.models.hydra_ingest import (  # noqa: E402
    auto_find_frames,
    bottleneck_for,
    build_nn_module,
    infer_vae_config_from_state_dict,
    ingest_foreign_checkpoint,
    instantiate_target_tree,
    load_yaml_cfg,
    map_foreign_state_dict,
    pick_encoder_cfg,
)
from anuraxla.models.vae import ConvVAEEncoder  # noqa: E402

T, M, GROUPS = 48, 32, 4
WIDTHS, DENSE, LATENT = (8, 16), 24, 12


class ForeignEncoder(torch_nn.Module):
    """Plain-torch encoder with deliberately alien attribute names: stride-2
    Conv2d(padding=1) + GroupNorm(eps=1e-5 torch default) + SiLU blocks,
    NCHW flatten, dense, two heads. Nothing about its names matches ours."""

    def __init__(self, two_heads=True):
        super().__init__()
        chans = [1] + list(WIDTHS)
        self.downs = torch_nn.ModuleList()
        for i in range(len(WIDTHS)):
            blk = torch_nn.Module()
            blk.c_first = torch_nn.Conv2d(chans[i], chans[i + 1], 3, stride=2, padding=1)
            blk.norm_a = torch_nn.GroupNorm(GROUPS, chans[i + 1])
            blk.c_second = torch_nn.Conv2d(chans[i + 1], chans[i + 1], 3, padding=1)
            blk.norm_b = torch_nn.GroupNorm(GROUPS, chans[i + 1])
            self.downs.append(blk)
        bt, bm = bottleneck_for(T, M, len(WIDTHS))
        self.proj = torch_nn.Linear(bt * bm * WIDTHS[-1], DENSE)
        self.emb_head = torch_nn.Linear(DENSE, LATENT)
        self.two_heads = two_heads
        if two_heads:
            self.spread_head = torch_nn.Linear(DENSE, LATENT)

    def forward(self, x):  # [B, 1, T, M]
        for blk in self.downs:
            x = F.silu(blk.norm_a(blk.c_first(x)))
            x = F.silu(blk.norm_b(blk.c_second(x)))
        x = x.reshape(x.shape[0], -1)  # NCHW flatten (standard torch)
        x = F.silu(self.proj(x))
        if self.two_heads:
            return {"mu": self.emb_head(x), "logvar": self.spread_head(x)}
        return self.emb_head(x)


def _save_foreign(tmp_path, two_heads=True, wrap=True):
    torch.manual_seed(0)
    mod = ForeignEncoder(two_heads).eval()
    pt = tmp_path / "model.pt"
    sd = mod.state_dict()
    torch.save({"state_dict": sd} if wrap else sd, pt)
    yml = tmp_path / "model.yaml"
    yml.write_text(
        "encoder:\n"
        "  _target_: soundscape_vae.builders.make_encoder\n"
        f"  num_groups: {GROUPS}\n"
        "  act: silu\n"
        "trainer: ${oc.env:TRAINER}\n"  # unresolved interpolation, kept as-is
    )
    return mod, pt, yml


def test_auto_find_frames_closed_form():
    bt, bm = bottleneck_for(192, 64, 4)
    assert (bt, bm) == (12, 4)
    # ceil halving on non-2^n dims (torch floor((t-1)/2)+1 == ceil(t/2)), and
    # VAEConfig.bottleneck_hw must agree (one formula — regression for the
    # floor-halving duplicate that diverged on odd dims)
    assert bottleneck_for(190, 62, 4) == (12, 4)
    from anuraxla.models.vae import VAEConfig
    cfg = VAEConfig(input_hw=(190, 62))
    assert cfg.bottleneck_hw == bottleneck_for(190, 62, len(cfg.widths))
    # reference semantics: FIRST frames value whose bottleneck matches
    t = auto_find_frames(12 * 4 * 256, n_mels=64, widths=(32, 64, 128, 256))
    assert bottleneck_for(t, 64, 4) == (12, 4)
    with pytest.raises(ValueError, match="no target_frames"):
        auto_find_frames(12 * 4 * 256 + 1, n_mels=64, widths=(32, 64, 128, 256))


def test_infer_config_and_parity_two_heads(tmp_path, rng):
    mod, pt, yml = _save_foreign(tmp_path, two_heads=True)
    cfg, params, meta = ingest_foreign_checkpoint(pt, yml, n_mels=M)

    assert tuple(cfg.widths) == WIDTHS
    assert cfg.dense_width == DENSE and cfg.latent_dim == LATENT
    assert cfg.groups == GROUPS  # from the YAML
    assert cfg.conv_padding == "TORCH" and cfg.gn_eps == pytest.approx(1e-5)
    # auto-frames recovered an input length with the right bottleneck
    assert bottleneck_for(*cfg.input_hw, len(WIDTHS)) == bottleneck_for(T, M, len(WIDTHS))

    t = cfg.input_hw[0]
    x = rng.standard_normal((2, 1, t, M)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x))
    enc = ConvVAEEncoder(cfg)
    out = enc.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["mu"]), ref["mu"].numpy(),
                               rtol=5e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["logvar"]), ref["logvar"].numpy(),
                               rtol=5e-4, atol=2e-5)


def test_single_head_checkpoint_maps_with_zero_logvar(tmp_path, rng):
    mod, pt, yml = _save_foreign(tmp_path, two_heads=False, wrap=False)
    cfg, params, _ = ingest_foreign_checkpoint(pt, yml, n_mels=M)
    t = cfg.input_hw[0]
    x = rng.standard_normal((2, 1, t, M)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x)).numpy()
    out = ConvVAEEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["mu"]), ref, rtol=5e-4, atol=2e-5)
    assert np.all(np.asarray(out["logvar"]) == 0.0)


class BatchNormForeignEncoder(torch_nn.Module):
    """Conv+BatchNorm2d blocks (the common torchvision-style recipe): bias-
    free stride-2 conv -> BN -> SiLU, then a BIASED stride-1 conv -> BN ->
    SiLU (exercising both bias layouts around BN), NCHW flatten, dense, one
    head. Ingest must fold the eval-mode BN affine into the conv weights."""

    def __init__(self):
        super().__init__()
        chans = [1] + list(WIDTHS)
        self.stages = torch_nn.ModuleList()
        for i in range(len(WIDTHS)):
            blk = torch_nn.Module()
            blk.down = torch_nn.Conv2d(chans[i], chans[i + 1], 3, stride=2,
                                       padding=1, bias=False)
            blk.bn_a = torch_nn.BatchNorm2d(chans[i + 1])
            blk.keep = torch_nn.Conv2d(chans[i + 1], chans[i + 1], 3, padding=1)
            blk.bn_b = torch_nn.BatchNorm2d(chans[i + 1])
            self.stages.append(blk)
        bt, bm = bottleneck_for(T, M, len(WIDTHS))
        self.proj = torch_nn.Linear(bt * bm * WIDTHS[-1], DENSE)
        self.emb = torch_nn.Linear(DENSE, LATENT)

    def forward(self, x):
        for blk in self.stages:
            x = F.silu(blk.bn_a(blk.down(x)))
            x = F.silu(blk.bn_b(blk.keep(x)))
        x = x.reshape(x.shape[0], -1)
        return self.emb(F.silu(self.proj(x)))


def test_batchnorm_checkpoint_folds_to_parity(tmp_path, rng):
    """BN family (VERDICT r2 item 6): running stats populated by real train-
    mode forwards, then eval-mode latents must match the flax encoder with
    the folded weights bit-closely; cfg.norm == 'none' (no runtime norm)."""
    torch.manual_seed(3)
    mod = BatchNormForeignEncoder()
    # populate non-trivial running_mean/var
    with torch.no_grad():
        for _ in range(3):
            mod(torch.from_numpy(
                rng.standard_normal((4, 1, T, M)).astype(np.float32)))
    mod = mod.eval()
    pt = tmp_path / "bn.pt"
    torch.save(mod.state_dict(), pt)

    cfg, params, meta = ingest_foreign_checkpoint(pt, n_mels=M)
    assert cfg.norm == "none" and meta["norm"] == "none"
    assert tuple(cfg.widths) == WIDTHS
    # no GroupNorm params in the mapped tree
    assert "GroupNorm_0" not in params["params"]["EncoderBlock_0"]

    t = cfg.input_hw[0]
    x = rng.standard_normal((2, 1, t, M)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x)).numpy()
    out = ConvVAEEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["mu"]), ref, rtol=5e-4, atol=2e-5)
    assert np.all(np.asarray(out["logvar"]) == 0.0)  # single head


def test_unsupported_layers_fail_with_named_errors():
    """Out-of-vocabulary layers raise UnsupportedLayerError NAMING the tensor
    (VERDICT r2 item 6) instead of a downstream shape-mapping miss."""
    from anuraxla.models.hydra_ingest import (
        UnsupportedLayerError,
        parse_layer_stream,
    )

    def head_tail():
        return {
            "proj.weight": np.zeros((DENSE, 8 * 24 * 16), np.float32),
            "proj.bias": np.zeros((DENSE,), np.float32),
            "emb.weight": np.zeros((LATENT, DENSE), np.float32),
            "emb.bias": np.zeros((LATENT,), np.float32),
        }

    # 5x5 conv
    with pytest.raises(UnsupportedLayerError, match=r"'feat\.0\.weight'.*5x5"):
        parse_layer_stream({"feat.0.weight": np.zeros((8, 1, 5, 5), np.float32),
                            **head_tail()})
    # Conv1d (rank 3)
    with pytest.raises(UnsupportedLayerError, match=r"'wave\.weight'.*rank 3"):
        parse_layer_stream({"wave.weight": np.zeros((8, 1, 9), np.float32)})
    # stray per-channel tensor of the wrong length (e.g. PReLU weight)
    with pytest.raises(UnsupportedLayerError, match=r"'act\.weight'"):
        parse_layer_stream({
            "c.weight": np.zeros((8, 1, 3, 3), np.float32),
            "c.bias": np.zeros((8,), np.float32),
            "act.weight": np.zeros((1,), np.float32),
        })
    # bias-less linear
    with pytest.raises(UnsupportedLayerError, match=r"'emb\.weight'.*bias"):
        parse_layer_stream({
            "c.weight": np.zeros((8, 1, 3, 3), np.float32),
            "c.bias": np.zeros((8,), np.float32),
            "emb.weight": np.zeros((LATENT, 8), np.float32),
        })
    # two norms stacked on one conv
    with pytest.raises(UnsupportedLayerError, match="consecutive per-channel"):
        parse_layer_stream({
            "c.weight": np.zeros((8, 1, 3, 3), np.float32),
            "c.bias": np.zeros((8,), np.float32),
            **{f"n{i}": np.zeros((8,), np.float32) for i in range(6)},
        })
    # mixed GN/BN across the stack
    gn_bn = {
        "a.weight": np.zeros((8, 1, 3, 3), np.float32),
        "a.bias": np.zeros((8,), np.float32),
        "gn.weight": np.zeros((8,), np.float32),
        "gn.bias": np.zeros((8,), np.float32),
        "b.weight": np.zeros((8, 8, 3, 3), np.float32),
        "b.bias": np.zeros((8,), np.float32),
        "bn.weight": np.zeros((8,), np.float32),
        "bn.bias": np.zeros((8,), np.float32),
        "bn.running_mean": np.zeros((8,), np.float32),
        "bn.running_var": np.ones((8,), np.float32),
        "proj.weight": np.zeros((DENSE, 8 * 24 * 16), np.float32),
        "proj.bias": np.zeros((DENSE,), np.float32),
        "emb.weight": np.zeros((LATENT, DENSE), np.float32),
        "emb.bias": np.zeros((LATENT,), np.float32),
    }
    with pytest.raises(UnsupportedLayerError, match="mixed normalization"):
        infer_vae_config_from_state_dict(gn_bn, n_mels=M)


def test_mapping_error_names_the_mismatch(tmp_path):
    _, pt, yml = _save_foreign(tmp_path)
    sd = torch.load(pt, weights_only=False)["state_dict"]
    infer_vae_config_from_state_dict(sd, n_mels=M)  # intact stream parses
    sd.pop(list(sd)[0])  # drop the first conv weight -> orphaned bias
    with pytest.raises(ValueError, match=r"'downs\.0\.c_first\.bias'"):
        infer_vae_config_from_state_dict(sd, n_mels=M)


def test_instantiate_target_tree_vocabulary():
    # importable targets import; private paths fall back to torch.nn by
    # terminal name; factory (_partial_) objects are called once
    node = {
        "_target_": "torch.nn.Sequential",
        "_args_": [
            {"_target_": "soundscape_vae.layers.Conv2d",  # unimportable package
             "in_channels": 1, "out_channels": 4, "kernel_size": 3, "padding": 1},
            {"_target_": "torch.nn.SiLU"},
        ],
    }
    seq = instantiate_target_tree(node)
    assert isinstance(seq, torch_nn.Sequential) and isinstance(seq[0], torch_nn.Conv2d)

    factory = instantiate_target_tree({"_target_": "torch.nn.SiLU", "_partial_": True})
    assert isinstance(build_nn_module(factory), torch_nn.SiLU)

    # real Hydra dumps carry meta-keys inside _target_ nodes; they must not
    # leak through as constructor kwargs
    conv = instantiate_target_tree({
        "_target_": "torch.nn.Conv2d", "_recursive_": False, "_convert_": "all",
        "in_channels": 1, "out_channels": 4, "kernel_size": 3,
    })
    assert isinstance(conv, torch_nn.Conv2d)

    with pytest.raises(ImportError, match="cannot resolve"):
        instantiate_target_tree({"_target_": "nowhere.NotALayer"})


def test_yaml_handling_matches_reference_semantics(tmp_path):
    _, pt, yml = _save_foreign(tmp_path)
    cfg = load_yaml_cfg(yml)
    # interpolations NOT resolved (ref:map_detector_core.py:111)
    assert cfg["trainer"] == "${oc.env:TRAINER}"
    enc = pick_encoder_cfg(cfg)
    assert enc["_target_"].startswith("soundscape_vae")
    with pytest.raises(ValueError, match="encoder"):
        pick_encoder_cfg({"decoder": {"_target_": "x"}})


def test_ingest_cli_artifact_usable_by_encode(tmp_path, rng, monkeypatch, capsys):
    """ingest-encoder CLI writes an artifact the normal pipeline loads; the
    recorded input shape makes encode-wav --auto-frames work on it."""
    import sys

    from anuraxla.cli import ingest_encoder
    from anuraxla.models.checkpoint import load_encoder

    _, pt, yml = _save_foreign(tmp_path)
    out_dir = tmp_path / "ingested_v0"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--pt", str(pt), "--yaml", str(yml), "--out", str(out_dir),
        "--n-mels", str(M),
    ])
    ingest_encoder.main()
    enc, params, cfg = load_encoder(out_dir)
    assert cfg.conv_padding == "TORCH"
    assert (out_dir / "encoder.json").exists()
    d = json.loads((out_dir / "encoder.json").read_text())
    assert d["gn_eps"] == pytest.approx(1e-5)
    z = enc.apply(params, jnp.zeros((1, cfg.input_hw[0], M, 1), jnp.float32))["mu"]
    assert z.shape == (1, LATENT)


def test_ingest_cli_verify_against_yaml_oracle(tmp_path, monkeypatch, capsys):
    """--verify rebuilds the torch module from the YAML _target_ tree (torch.nn
    vocabulary with private-path fallback) and pins latent parity pre-save."""
    import sys

    from anuraxla.cli import ingest_encoder

    torch.manual_seed(1)
    bt, bm = bottleneck_for(T, M, 2)
    seq = torch_nn.Sequential(
        torch_nn.Conv2d(1, 8, 3, stride=2, padding=1), torch_nn.GroupNorm(4, 8), torch_nn.SiLU(),
        torch_nn.Conv2d(8, 8, 3, padding=1), torch_nn.GroupNorm(4, 8), torch_nn.SiLU(),
        torch_nn.Conv2d(8, 16, 3, stride=2, padding=1), torch_nn.GroupNorm(4, 16), torch_nn.SiLU(),
        torch_nn.Conv2d(16, 16, 3, padding=1), torch_nn.GroupNorm(4, 16), torch_nn.SiLU(),
        torch_nn.Flatten(),
        torch_nn.Linear(bt * bm * 16, DENSE), torch_nn.SiLU(),
        torch_nn.Linear(DENSE, LATENT),
    ).eval()
    pt = tmp_path / "seq.pt"
    torch.save(seq.state_dict(), pt)

    def layer(t, **kw):
        return "".join([f"    - _target_: {t}\n"] +
                       [f"      {k}: {v}\n" for k, v in kw.items()])

    yml = tmp_path / "seq.yaml"
    yml.write_text(
        "encoder:\n"
        "  _target_: torch.nn.Sequential\n"
        "  _args_:\n"
        + layer("soundscape_vae.nn.Conv2d", in_channels=1, out_channels=8,
                kernel_size=3, stride=2, padding=1)
        + layer("torch.nn.GroupNorm", num_groups=4, num_channels=8)
        + layer("torch.nn.SiLU")
        + layer("torch.nn.Conv2d", in_channels=8, out_channels=8, kernel_size=3, padding=1)
        + layer("torch.nn.GroupNorm", num_groups=4, num_channels=8)
        + layer("torch.nn.SiLU")
        + layer("torch.nn.Conv2d", in_channels=8, out_channels=16, kernel_size=3,
                stride=2, padding=1)
        + layer("torch.nn.GroupNorm", num_groups=4, num_channels=16)
        + layer("torch.nn.SiLU")
        + layer("torch.nn.Conv2d", in_channels=16, out_channels=16, kernel_size=3, padding=1)
        + layer("torch.nn.GroupNorm", num_groups=4, num_channels=16)
        + layer("torch.nn.SiLU")
        + layer("torch.nn.Flatten")
        + layer("torch.nn.Linear", in_features=bt * bm * 16, out_features=DENSE)
        + layer("torch.nn.SiLU")
        + layer("torch.nn.Linear", in_features=DENSE, out_features=LATENT)
    )
    out_dir = tmp_path / "verified_v0"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--pt", str(pt), "--yaml", str(yml), "--out", str(out_dir),
        "--n-mels", str(M), "--verify", "--tol", "1e-4",
    ])
    ingest_encoder.main()
    out = capsys.readouterr().out
    assert "verified vs torch module" in out
    assert (out_dir / "encoder.msgpack").exists()


def test_verify_refuses_random_init_oracle(tmp_path, monkeypatch):
    """--verify must fail loudly when the YAML-built module loads zero
    checkpoint tensors (otherwise the 'oracle' is random init and the
    parity gate reports a bogus mismatch)."""
    import sys

    from anuraxla.cli import ingest_encoder

    _, pt, _ = _save_foreign(tmp_path)  # alien names
    bt, bm = bottleneck_for(T, M, 2)
    # name-incompatible but shape-compatible YAML (Sequential '0.weight' names)
    yml = tmp_path / "seq_names.yaml"
    yml.write_text(
        "encoder:\n"
        "  _target_: torch.nn.Sequential\n"
        "  _args_:\n"
        "    - _target_: torch.nn.Conv2d\n"
        "      in_channels: 1\n      out_channels: 8\n      kernel_size: 3\n"
        "      stride: 2\n      padding: 1\n"
    )
    out_dir = tmp_path / "never_written"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--pt", str(pt), "--yaml", str(yml), "--out", str(out_dir),
        "--n-mels", str(M), "--verify",
    ])
    with pytest.raises(SystemExit, match="could not rebuild the torch oracle"):
        ingest_encoder.main()
    assert not out_dir.exists()


class AvgPoolForeignEncoder(torch_nn.Module):
    """Architecture OUTSIDE the ingest vocabulary: stride-1 conv + AvgPool(2)
    downsampling (floor halving, unlike the conv chain's ceil halving).
    Exists to exercise the opaque-module forward-hook probe."""

    def __init__(self):
        super().__init__()
        chans = [1] + list(WIDTHS)
        self.convs = torch_nn.ModuleList(
            torch_nn.Conv2d(chans[i], chans[i + 1], 3, padding=1)
            for i in range(len(WIDTHS))
        )
        t, m = T, M
        for _ in WIDTHS:
            t, m = t // 2, m // 2  # AvgPool2d(2) floor-halves
        self.proj = torch_nn.Linear(t * m * WIDTHS[-1], DENSE)
        self.head = torch_nn.Linear(DENSE, LATENT)

    def forward(self, x):
        for c in self.convs:
            x = F.avg_pool2d(F.silu(c(x)), 2)
        x = x.flatten(1)
        return self.head(F.silu(self.proj(x)))


class K5Encoder(torch_nn.Module):
    """5x5 convs: outside the ingest vocabulary; pickled-module error path."""

    def __init__(self):
        super().__init__()
        self.c = torch_nn.Conv2d(1, 8, 5, stride=2, padding=2)
        t, m = (T + 1) // 2, (M + 1) // 2
        self.proj = torch_nn.Linear(t * m * 8, DENSE)
        self.head = torch_nn.Linear(DENSE, LATENT)

    def forward(self, x):
        x = F.silu(self.c(x)).flatten(1)
        return self.head(F.silu(self.proj(x)))


def test_probe_frames_with_hook_opaque_module():
    """The forward-hook probe recovers target_frames for (a) the known conv
    chain and (b) an AvgPool module the closed form cannot model — the
    reference's capability (ref:07:316-409)."""
    from anuraxla.models.hydra_ingest import (
        auto_find_frames,
        probe_frames_with_hook,
    )

    torch.manual_seed(0)
    # ceil-halving maps several T to the same bottleneck (45 and 48 both
    # give 12 here); probe and closed form share the smallest-match
    # convention, which is what the ingest cross-check relies on
    enc = ForeignEncoder().eval()
    probed = probe_frames_with_hook(enc, n_mels=M)
    assert probed == auto_find_frames(
        enc.proj.in_features, n_mels=M, widths=WIDTHS
    )
    # closed form has no AvgPool model; probe still finds T. Note multiple
    # T can share a floor-halved bottleneck; the probe returns the SMALLEST,
    # which is the convention the exactness check below pins.
    probed = probe_frames_with_hook(AvgPoolForeignEncoder().eval(), n_mels=M)
    t, m = probed, M
    for _ in WIDTHS:
        t, m = t // 2, m // 2
    assert t * m * WIDTHS[-1] == AvgPoolForeignEncoder().proj.in_features

    with pytest.raises(ValueError, match="no target_frames"):
        probe_frames_with_hook(ForeignEncoder().eval(), n_mels=M, max_frames=16)


def test_ingest_pickled_module_cross_checks_probe(tmp_path):
    """A pickled runnable module: ingest cross-checks the closed-form frame
    search against the real module's probe; an out-of-vocabulary pickled
    module fails with an error carrying the probed target_frames."""
    from anuraxla.models.hydra_ingest import (
        UnsupportedLayerError,
        ingest_foreign_checkpoint,
    )

    torch.manual_seed(0)
    pt = tmp_path / "module.pt"
    torch.save(ForeignEncoder(two_heads=True).eval(), pt)
    cfg, params, meta = ingest_foreign_checkpoint(pt, n_mels=M, groups=GROUPS)
    # smallest-match frames convention (45 ≡ 48 under ceil-halving here);
    # the point is the probe cross-check PASSED on a runnable module
    assert cfg.input_hw[1] == M
    bt, bm = bottleneck_for(cfg.input_hw[0], M, len(WIDTHS))
    assert bt * bm * WIDTHS[-1] == ForeignEncoder().proj.in_features

    pt2 = tmp_path / "k5.pt"
    torch.save(K5Encoder().eval(), pt2)
    with pytest.raises(UnsupportedLayerError, match="forward-hook probe"):
        ingest_foreign_checkpoint(pt2, n_mels=M)


class AvgPoolGNForeignEncoder(torch_nn.Module):
    """AvgPool family WITH GroupNorm: per block one stride-1 conv -> GN ->
    SiLU -> AvgPool2d(2). The second foreign downsampling family the ingest
    vocabulary accepts (VERDICT r2 item 6, 'one notch wider')."""

    def __init__(self):
        super().__init__()
        chans = [1] + list(WIDTHS)
        self.blocks = torch_nn.ModuleList()
        for i in range(len(WIDTHS)):
            blk = torch_nn.Module()
            blk.c = torch_nn.Conv2d(chans[i], chans[i + 1], 3, padding=1)
            blk.g = torch_nn.GroupNorm(GROUPS, chans[i + 1])
            self.blocks.append(blk)
        t, m = bottleneck_for(T, M, len(WIDTHS), "avgpool")
        self.proj = torch_nn.Linear(t * m * WIDTHS[-1], DENSE)
        self.emb = torch_nn.Linear(DENSE, LATENT)

    def forward(self, x):
        for blk in self.blocks:
            x = F.avg_pool2d(F.silu(blk.g(blk.c(x))), 2)
        x = x.reshape(x.shape[0], -1)
        return self.emb(F.silu(self.proj(x)))


def test_avgpool_checkpoint_ingests_to_parity(tmp_path, rng):
    """AvgPool downsampling family: config inference picks downsample=
    'avgpool' (floor-halving bottleneck), the mapped flax encoder matches
    the torch module's latents, and a pickled runnable module passes the
    probe cross-check."""
    torch.manual_seed(5)
    mod = AvgPoolGNForeignEncoder().eval()
    pt = tmp_path / "avgpool_gn.pt"
    torch.save(mod, pt)  # runnable pickle: exercises the probe cross-check

    cfg, params, meta = ingest_foreign_checkpoint(pt, n_mels=M, groups=GROUPS)
    assert cfg.downsample == "avgpool" and meta["downsample"] == "avgpool"
    assert tuple(cfg.widths) == WIDTHS and cfg.norm == "group"
    t = cfg.input_hw[0]
    assert bottleneck_for(t, M, len(WIDTHS), "avgpool") == bottleneck_for(
        T, M, len(WIDTHS), "avgpool"
    )

    x = rng.standard_normal((2, 1, t, M)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x)).numpy()
    out = ConvVAEEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["mu"]), ref, rtol=5e-4, atol=2e-5)

    # int8 serving composes with the avgpool family (r4; drift bounds pinned
    # in tests/test_quant.py::test_quantize_ingested_avgpool_checkpoint)
    from anuraxla.models.quant import encoder_apply_quantized, quantize_encoder

    q = quantize_encoder(params, cfg)
    mu_q = np.asarray(encoder_apply_quantized(q, cfg, jnp.asarray(
        x.transpose(0, 2, 3, 1)))["mu"])
    rel = np.linalg.norm(mu_q - ref, axis=-1) / np.linalg.norm(ref, axis=-1)
    assert rel.max() < 0.25, f"int8 avgpool drift {rel}"


def test_avgpool_norm_free_state_dict_ingests(tmp_path, rng):
    """Norm-free AvgPool chain from a bare state_dict (no runnable module):
    hypothesis inference alone must land on the avgpool reading."""
    torch.manual_seed(6)
    mod = AvgPoolForeignEncoder().eval()
    pt = tmp_path / "avgpool_sd.pt"
    torch.save(mod.state_dict(), pt)
    cfg, params, _ = ingest_foreign_checkpoint(pt, n_mels=M)
    assert cfg.downsample == "avgpool" and cfg.norm == "none"
    t = cfg.input_hw[0]
    x = rng.standard_normal((2, 1, t, M)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x)).numpy()
    out = ConvVAEEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["mu"]), ref, rtol=5e-4, atol=2e-5)


class AmbiguousAvgPoolEncoder(torch_nn.Module):
    """The review's adversarial case: repeated-width avgpool chain
    1→8,8→8,8→16,16→16 with T=512 — the SAME state_dict also parses as
    2-block stride pairs whose frame search succeeds (t=29..32 gives
    ceil-bottleneck 8·8·16 = 1024 = floor-bottleneck(512)·2·16). Shape
    arithmetic alone cannot tell the readings apart."""

    def __init__(self):
        super().__init__()
        chans = [1, 8, 8, 16, 16]
        self.cs = torch_nn.ModuleList(
            torch_nn.Conv2d(chans[i], chans[i + 1], 3, padding=1)
            for i in range(4)
        )
        self.proj = torch_nn.Linear((512 // 16) * (M // 16) * 16, DENSE)
        self.emb = torch_nn.Linear(DENSE, LATENT)

    def forward(self, x):
        for c in self.cs:
            x = F.avg_pool2d(F.silu(c(x)), 2)
        return self.emb(F.silu(self.proj(x.flatten(1))))


def test_ambiguous_chain_probe_and_override(tmp_path, rng, capsys):
    """Ambiguity handling (r3 review finding #1): a runnable pickle is
    disambiguated by the probe (correct avgpool ingest to parity); a bare
    state_dict warns and honors --downsample; and the warned stride default
    is what the warning says it is."""
    from anuraxla.models.hydra_ingest import ingest_foreign_checkpoint

    torch.manual_seed(7)
    mod = AmbiguousAvgPoolEncoder().eval()

    # (a) runnable pickle: probe picks avgpool and parity holds
    pt = tmp_path / "amb_module.pt"
    torch.save(mod, pt)
    cfg, params, _ = ingest_foreign_checkpoint(pt, n_mels=M)
    assert cfg.downsample == "avgpool" and cfg.input_hw == (512, M)
    x = rng.standard_normal((2, 1, 512, M)).astype(np.float32)
    with torch.no_grad():
        ref = mod(torch.from_numpy(x)).numpy()
    out = ConvVAEEncoder(cfg).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["mu"]), ref, rtol=5e-4, atol=2e-5)

    # (b) bare state_dict: stride is preferred but the ambiguity is LOUD —
    # as a real warning (library-filterable; the CLI reprints it on stdout)
    pt_sd = tmp_path / "amb_sd.pt"
    torch.save(mod.state_dict(), pt_sd)
    with pytest.warns(UserWarning, match="ambiguous checkpoint"):
        cfg_sd, _, _ = ingest_foreign_checkpoint(pt_sd, n_mels=M)
    assert cfg_sd.downsample == "stride"

    # (c) explicit override recovers the correct reading from shapes alone
    cfg_ov, params_ov, _ = ingest_foreign_checkpoint(
        pt_sd, n_mels=M, downsample="avgpool"
    )
    assert cfg_ov.downsample == "avgpool" and cfg_ov.input_hw == (512, M)
    out2 = ConvVAEEncoder(cfg_ov).apply(
        params_ov, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out2["mu"]), ref, rtol=5e-4, atol=2e-5)
