"""Noise-robustness evaluation (VERDICT r3 weak #3): deterministic noise
injection, cache-key splitting, the SNR-sweep benchmark, and the noise-margin
operating-point recipe."""

import json
from pathlib import Path

import numpy as np
import pytest

from anuraxla.cli.make_synth_data import make_tree
from anuraxla.constants import SPECIES, MelConfig
from anuraxla.models.checkpoint import save_encoder
from anuraxla.models.vae import VAEConfig, init_encoder
from anuraxla.pipeline.session import EncoderSession, session_fingerprint

SR = 16000
SECONDS = 1.0
TF, NM = 48, 32


def mel_cfg():
    return MelConfig(sr=SR, duration=SECONDS, n_mels=NM, fmin=150.0,
                     fmax=7500.0, hop_length=384, n_fft=2048, target_frames=TF)


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("noise_project")
    make_tree(root / "latent_space_exploration", sr=SR, seconds=SECONDS,
              per_species=4, seed=3)
    (root / "config.json").write_text(
        json.dumps({"species": list(SPECIES), "chunk_seconds": SECONDS}, indent=2)
    )
    vcfg = VAEConfig(latent_dim=16, widths=(8, 16), dense_width=24, groups=4,
                     input_hw=(TF, NM))
    _, params = init_encoder(vcfg, seed=5)
    save_encoder(root / "models" / "anuraxla_vae_encoder_v0", vcfg, params)
    return root


def _session(project, **kw):
    return EncoderSession(
        mel=mel_cfg(), project_root=project, batch_size=4, num_threads=2, **kw
    ).load()


def test_noise_deterministic_across_batch_sizes(project):
    """A file's noised latent depends only on (noise_seed, global row index)
    — never on batch composition (the same reproducibility contract as the
    int8 per-row scales)."""
    wavs = sorted(
        (project / "latent_space_exploration" / "val_chunks" / SPECIES[0]).glob("*.wav")
    )
    s_clean = _session(project)
    z_clean, ok, _ = s_clean.encode_paths(wavs)
    assert ok.all()

    s4 = _session(project, add_noise_db=10.0)
    z4, _, _ = s4.encode_paths(wavs)
    s2 = _session(project, add_noise_db=10.0)
    s2.batch_size = 2
    z2, _, _ = s2.encode_paths(wavs)
    np.testing.assert_array_equal(z4, z2)
    assert not np.allclose(z4, z_clean)  # the noise really does something

    # a different seed gives different noise
    s_seed = _session(project, add_noise_db=10.0, noise_seed=9)
    zs, _, _ = s_seed.encode_paths(wavs)
    assert not np.array_equal(zs, z4)


def test_noise_splits_cache_fingerprint(project):
    s0 = _session(project)
    s1 = _session(project, add_noise_db=14.0)
    s2 = _session(project, add_noise_db=14.0, noise_seed=9)
    fps = {session_fingerprint(s) for s in (s0, s1, s2)}
    assert len(fps) == 3
    assert "_nz14" in session_fingerprint(s1)


def test_snr_sweep_writes_curve_and_artifacts(project):
    """The SNR sweep: fit radial, then benchmark the val tree clean and at
    two injected SNRs in one session; curve CSV + per-SNR artifact dirs."""
    from anuraxla.config import load_config
    from anuraxla.pipeline.benchmark import run_snr_sweep
    from anuraxla.pipeline.fit import fit_radial_tree

    session = _session(project)
    cfg_path = project / "config.json"
    train = project / "latent_space_exploration" / "train_chunks"
    val = project / "latent_space_exploration" / "val_chunks"
    fit_radial_tree(
        cfg_path=cfg_path, cfg=load_config(cfg_path), chunks_dir=train,
        session=session, q_in=0.95, q_out=0.10, cache=False, cache_dir=None,
        max_per_class=0, seed=1, log=lambda *a: None,
    )
    out = project / "outputs" / "snr_bench"
    curve = run_snr_sweep(
        root=val, config_path=cfg_path, detector="radial", session=session,
        out_dir=out, snrs_db=[None, 20.0, -10.0], log=lambda *a: None,
    )
    assert [r["snr_db"] for r in curve] == ["", 20.0, -10.0]
    assert (out / "snr_curve.csv").exists()
    for tag in ("clean", "snr_20db", "snr_-10db"):
        assert (out / tag / "summary.txt").exists(), tag
        assert (out / tag / "results.csv").exists(), tag
    # the sweep leaves the session clean for subsequent callers
    assert session.add_noise_db is None
    # -10 dB SNR (noise 10x the signal power) must not SILENTLY look clean:
    # the distance distribution shifts, so detection metrics move
    clean, heavy = curve[0], curve[2]
    assert (heavy["accuracy"], heavy["no_detect_rate"]) != (
        clean["accuracy"], clean["no_detect_rate"]
    )


def test_recommend_operating_point():
    """Max noised accuracy subject to clean accuracy within 2 points of the
    clean optimum."""
    from anuraxla.cli.run_qout_grid import recommend_operating_point

    q_in = [0.90, 0.95, 0.99]
    q_out = [0.10, 0.20]
    #               q_out:  0.10  0.20
    clean = np.array([[0.90, 0.95],   # q_in 0.90
                      [0.94, 0.96],   # q_in 0.95  <- clean optimum 0.96
                      [0.95, 0.80]])  # q_in 0.99
    noise = np.array([[0.50, 0.60],
                      [0.70, 0.55],
                      [0.85, 0.40]])
    # eligible (clean >= 0.94): (0,1)=0.95, (1,0)=0.94, (1,1)=0.96, (2,0)=0.95
    # best noised among them: (2,0) with 0.85
    qi, qo = recommend_operating_point(clean, noise, q_in, q_out)
    assert (qi, qo) == (0.99, 0.10)

    # all-eligible degenerate case: pure noised argmax
    qi, qo = recommend_operating_point(np.ones_like(clean), noise, q_in, q_out)
    assert (qi, qo) == (0.99, 0.10)


def test_benchmark_cli_noise_flags_parse():
    from anuraxla.cli.benchmark_folder import build_parser

    a = build_parser().parse_args(
        ["--root", "r", "--add-noise-db", "14", "--noise-seed", "3"]
    )
    assert a.add_noise_db == 14.0 and a.noise_seed == 3
    a = build_parser().parse_args(["--root", "r", "--snr-sweep", "clean,20,14,8"])
    assert a.snr_sweep == "clean,20,14,8"


def test_benchmark_cli_rejects_noise_plus_sweep(monkeypatch):
    """--add-noise-db composed with --snr-sweep would be silently clobbered
    by the sweep's per-point noise level — refuse instead."""
    import sys

    from anuraxla.cli.benchmark_folder import run

    monkeypatch.setattr(sys, "argv", [
        "prog", "--root", "r", "--add-noise-db", "8", "--snr-sweep", "clean,20",
    ])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        run("radial", "outputs/x")


def test_scan_rejects_noised_session(project):
    """scan_soundscapes has no noise-injection leg — a session built with
    add_noise_db would scan CLEAN while its fingerprint claims noised."""
    from anuraxla.pipeline.stream import scan_soundscapes

    s = _session(project, add_noise_db=14.0)
    with pytest.raises(ValueError, match="add_noise_db"):
        scan_soundscapes([Path("x.wav")], s, detector="radial", config={},
                         log=lambda *a: None)


def test_augmented_radial_fit_widens_rk(project, tmp_path):
    """fit with --augment-noise-db: the in-class pool gains noised copies of
    the same files, so rk_in grows to absorb the noise-induced latent shift
    (the engineered fix for SNRs the margin sweep can't reach by
    rethresholding); provenance lands in meta_fit and the session's noise
    state is restored afterwards."""
    import json

    from anuraxla.pipeline.fit import fit_radial_tree

    cfgp = tmp_path / "config.json"
    cfgp.write_text((project / "config.json").read_text())
    chunks = project / "latent_space_exploration" / "train_chunks"
    s = _session(project)
    quiet = lambda *a: None  # noqa: E731

    clean = fit_radial_tree(
        cfg_path=cfgp, cfg=json.loads(cfgp.read_text()), chunks_dir=chunks,
        session=s, q_in=0.9, q_out=0.5, cache=False, cache_dir=None,
        max_per_class=0, seed=1, log=quiet,
    )
    aug = fit_radial_tree(
        cfg_path=cfgp, cfg=json.loads(cfgp.read_text()), chunks_dir=chunks,
        session=s, q_in=0.9, q_out=0.5, cache=False, cache_dir=None,
        max_per_class=0, seed=1, augment_noise_db=[6.0], log=quiet,
    )
    assert s.add_noise_db is None
    rk_c, rk_a = np.asarray(clean["rk_in"]), np.asarray(aug["rk_in"])
    assert (rk_a >= rk_c - 1e-7).all() and (rk_a > rk_c).any(), (rk_c, rk_a)
    # each species' pool doubled (every file encoded clean + at 6 dB)
    for sp, m in aug["meta"].items():
        assert m["N_in"] == 2 * clean["meta"][sp]["N_in"]
    saved = json.loads(cfgp.read_text())
    assert saved["radial_detector"]["meta_fit"]["augment_noise_db"] == [6.0]
