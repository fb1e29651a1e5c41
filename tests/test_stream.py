"""Streaming soundscape tests: WavStream random access and the windowed
scan pipeline on a synthetic 'long' recording."""

import json
import numpy as np
import pytest

from anuraxla.utils.wavio import WavStream, read_wav, write_wav


def test_wavstream_matches_full_read(tmp_path, rng):
    y = (rng.standard_normal(48000 * 3) * 0.2).astype(np.float32)
    p = tmp_path / "long.wav"
    write_wav(p, y, 48000, subtype="PCM_16")

    st = WavStream(p)
    assert st.sr == 48000
    assert st.num_frames == len(y)
    full, _ = read_wav(p)
    np.testing.assert_allclose(st.read(0, len(y)), full, atol=1e-7)
    np.testing.assert_allclose(st.read(10_000, 5_000), full[10_000:15_000], atol=1e-7)
    # reads past EOF zero-pad
    tail = st.read(len(y) - 100, 400)
    assert tail.shape == (400,)
    assert np.all(tail[100:] == 0)


def test_wavstream_stereo_float(tmp_path, rng):
    y = (rng.standard_normal((8000, 2)) * 0.1).astype(np.float32)
    p = tmp_path / "st.wav"
    write_wav(p, y, 16000, subtype="FLOAT")
    st = WavStream(p)
    assert st.channels == 2
    np.testing.assert_allclose(st.read(0, 8000), y.mean(axis=1), atol=1e-7)


def test_wavstream_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"nope")
    with pytest.raises(ValueError):
        WavStream(p)


def test_scan_soundscape_finds_planted_calls(tmp_path, rng):
    """Plant one species' call in the middle of a long noise recording; the
    scan must fire in those windows (and mostly not elsewhere)."""
    from anuraxla.cli.make_synth_data import synth_call
    from anuraxla.constants import MelConfig, SPECIES
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.vae import VAEConfig, init_encoder
    from anuraxla.pipeline.fit import fit_radial_tree
    from anuraxla.pipeline.session import EncoderSession
    from anuraxla.pipeline.stream import scan_soundscape, write_detections_csv
    from anuraxla.cli.make_synth_data import make_tree

    SR, SEC, TF, NM = 16000, 1.0, 48, 32
    mel = MelConfig(sr=SR, duration=SEC, target_frames=TF, n_mels=NM, fmax=7500)
    root = tmp_path
    make_tree(root / "latent_space_exploration", sr=SR, seconds=SEC, per_species=6, seed=3)
    (root / "config.json").write_text(json.dumps({"species": list(SPECIES), "chunk_seconds": SEC}))
    vcfg = VAEConfig(latent_dim=24, widths=(8, 16), dense_width=32, groups=4, input_hw=(TF, NM))
    enc, params = init_encoder(vcfg, seed=7)
    save_encoder(root / "models" / "anuraxla_vae_encoder_v0", vcfg, params)

    session = EncoderSession(mel=mel, batch_size=8, project_root=root).load()
    cfg = json.loads((root / "config.json").read_text())
    fit_radial_tree(
        cfg_path=root / "config.json", cfg=cfg,
        chunks_dir=root / "latent_space_exploration" / "train_chunks",
        session=session, q_in=0.98, q_out=0.10, cache=False, cache_dir=None,
        max_per_class=0, seed=1, log=lambda *a: None,
    )

    # 20 s recording: noise everywhere, species-0 call at seconds 8..12
    n = SR * 20
    y = (0.001 * rng.standard_normal(n)).astype(np.float32)
    call = synth_call(np.random.default_rng(3), SR, 4.0, 400.0, 4.0)  # species 0 params
    y[8 * SR : 12 * SR] += call
    wav = tmp_path / "soundscape.wav"
    write_wav(wav, y, SR, subtype="PCM_16")

    cfg = json.loads((root / "config.json").read_text())
    dets = scan_soundscape(
        wav, session, detector="radial", config=cfg, hop_seconds=1.0,
        log=lambda *a: None,
    )
    assert len(dets) == 20
    in_call = [d for d in dets if 8.0 <= d.t_start < 11.0]
    hits = [d for d in in_call if d.detected and d.species == SPECIES[0]]
    # pulsed synthetic calls only phase-align with the training chunks in some
    # windows; at least the aligned one must fire, and nothing outside the call
    assert len(hits) >= 1, [(d.t_start, d.species) for d in dets]
    outside = [d for d in dets if d.detected and not (7.0 <= d.t_start < 12.0)]
    assert not outside, [(d.t_start, d.species) for d in outside]

    out = tmp_path / "dets.csv"
    write_detections_csv(dets, out, "best_distance")
    lines = out.read_text().splitlines()
    assert lines[0].startswith("t_start") and len(lines) == 21

    # chunk extraction: detected windows become labeled chunk WAVs that the
    # fit tools can consume directly
    from anuraxla.pipeline.stream import extract_detected_chunks
    from anuraxla.utils.wavio import read_wav

    n = extract_detected_chunks(wav, dets, tmp_path / "extracted", sr=SR, log=lambda *a: None)
    assert n == sum(d.detected for d in dets)
    wavs_out = list((tmp_path / "extracted" / SPECIES[0]).glob("*.wav"))
    assert len(wavs_out) >= 1
    y_out, sr_out = read_wav(wavs_out[0])
    assert sr_out == SR and y_out.shape[0] == SR  # 1 s windows


def test_scan_device_fused_normalization_matches_host(tmp_path, rng):
    """scan with a normalize_on_device session == scan with host-side
    normalization: identical detections (the fused per-window RMS is the
    same math run inside the device mel op)."""
    from anuraxla.cli.make_synth_data import make_tree, synth_call
    from anuraxla.constants import MelConfig, SPECIES
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.vae import VAEConfig, init_encoder
    from anuraxla.pipeline.fit import fit_radial_tree
    from anuraxla.pipeline.session import EncoderSession
    from anuraxla.pipeline.stream import scan_soundscape

    SR, SEC, TF, NM = 16000, 1.0, 48, 32
    mel = MelConfig(sr=SR, duration=SEC, target_frames=TF, n_mels=NM, fmax=7500)
    root = tmp_path
    make_tree(root / "latent_space_exploration", sr=SR, seconds=SEC, per_species=3, seed=5)
    (root / "config.json").write_text(json.dumps({"species": list(SPECIES), "chunk_seconds": SEC}))
    vcfg = VAEConfig(latent_dim=16, widths=(8, 16), dense_width=32, groups=4, input_hw=(TF, NM))
    enc, params = init_encoder(vcfg, seed=7)
    save_encoder(root / "models" / "anuraxla_vae_encoder_v0", vcfg, params)

    s_host = EncoderSession(mel=mel, batch_size=8, project_root=root).load()
    s_dev = EncoderSession(mel=mel, batch_size=8, project_root=root,
                           normalize_on_device=True).load()
    cfg = json.loads((root / "config.json").read_text())
    fit_radial_tree(
        cfg_path=root / "config.json", cfg=cfg,
        chunks_dir=root / "latent_space_exploration" / "train_chunks",
        session=s_host, q_in=0.98, q_out=0.10, cache=False, cache_dir=None,
        max_per_class=0, seed=1, log=lambda *a: None,
    )

    n = SR * 8
    y = (0.001 * rng.standard_normal(n)).astype(np.float32)
    y[3 * SR : 5 * SR] += synth_call(np.random.default_rng(3), SR, 2.0, 400.0, 4.0)
    wav = tmp_path / "fused.wav"
    write_wav(wav, y, SR, subtype="PCM_16")

    cfg = json.loads((root / "config.json").read_text())
    d_host = scan_soundscape(wav, s_host, detector="radial", config=cfg,
                             hop_seconds=1.0, log=lambda *a: None)
    d_dev = scan_soundscape(wav, s_dev, detector="radial", config=cfg,
                            hop_seconds=1.0, log=lambda *a: None)
    assert [(d.detected, d.species) for d in d_host] == \
           [(d.detected, d.species) for d in d_dev]
    np.testing.assert_allclose([d.score for d in d_host],
                               [d.score for d in d_dev], rtol=1e-4, atol=1e-5)

    # normalize=False on a fused session is a contract violation, not silence
    with pytest.raises(ValueError, match="normalize_on_device"):
        scan_soundscape(wav, s_dev, detector="radial", config=cfg,
                        normalize=False, log=lambda *a: None)
