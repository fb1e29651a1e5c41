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


def _scan_project(tmp_path, rng, *, per_species=3, seed=5):
    """Small fitted project for scan tests: synthetic tree, tiny encoder
    artifact, radial fit. Returns (root, mel, cfg, fitted host session)."""
    from anuraxla.cli.make_synth_data import make_tree
    from anuraxla.constants import MelConfig, SPECIES
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.vae import VAEConfig, init_encoder
    from anuraxla.pipeline.fit import fit_radial_tree
    from anuraxla.pipeline.session import EncoderSession

    SR, SEC, TF, NM = 16000, 1.0, 48, 32
    mel = MelConfig(sr=SR, duration=SEC, target_frames=TF, n_mels=NM, fmax=7500)
    root = tmp_path
    make_tree(root / "latent_space_exploration", sr=SR, seconds=SEC,
              per_species=per_species, seed=seed)
    (root / "config.json").write_text(
        json.dumps({"species": list(SPECIES), "chunk_seconds": SEC})
    )
    vcfg = VAEConfig(latent_dim=16, widths=(8, 16), dense_width=32, groups=4,
                     input_hw=(TF, NM))
    _, params = init_encoder(vcfg, seed=7)
    save_encoder(root / "models" / "anuraxla_vae_encoder_v0", vcfg, params)
    session = EncoderSession(mel=mel, batch_size=8, project_root=root).load()
    cfg = json.loads((root / "config.json").read_text())
    fit_radial_tree(
        cfg_path=root / "config.json", cfg=cfg,
        chunks_dir=root / "latent_space_exploration" / "train_chunks",
        session=session, q_in=0.98, q_out=0.10, cache=False, cache_dir=None,
        max_per_class=0, seed=1, log=lambda *a: None,
    )
    return root, mel, json.loads((root / "config.json").read_text()), session


def _plant_recordings(tmp_path, rng, sr, n_files=3):
    """A few short 'recordings' of different lengths; file 1 carries a
    species-0 call at seconds 8..12 (the phase-aligned planted-call setup of
    test_scan_soundscape_finds_planted_calls)."""
    from anuraxla.cli.make_synth_data import synth_call

    paths = []
    for i, secs in enumerate((7, 15, 6)[:n_files]):
        n = sr * secs
        y = (0.001 * rng.standard_normal(n)).astype(np.float32)
        if i == 1:
            y[8 * sr : 12 * sr] += synth_call(np.random.default_rng(3), sr, 4.0, 400.0, 4.0)
        p = tmp_path / f"rec{i}.wav"
        write_wav(p, y, sr, subtype="PCM_16")
        paths.append(p)
    return paths


def test_fleet_scan_matches_per_file_scans(tmp_path, rng):
    """scan_soundscapes over 3 recordings (windows packed into shared device
    batches across file boundaries) must produce EXACTLY the per-file
    detections of 3 independent scan_soundscape calls — batch packing is an
    execution detail, never a results change."""
    from anuraxla.pipeline.stream import scan_soundscape, scan_soundscapes

    root, mel, cfg, session = _scan_project(tmp_path, rng, per_species=6, seed=3)
    session = session.reconfigure()
    paths = _plant_recordings(tmp_path, rng, mel.sr)

    per_file, stats = scan_soundscapes(
        paths, session, detector="radial", config=cfg, hop_seconds=1.0,
        log=lambda *a: None,
    )
    assert stats["n_files"] == 3 and stats["n_windows"] == 7 + 15 + 6
    assert abs(stats["total_audio_seconds"] - 28.0) < 0.01

    for p in paths:
        single = scan_soundscape(p, session, detector="radial", config=cfg,
                                 hop_seconds=1.0, log=lambda *a: None)
        fleet = per_file[p]
        assert [(d.t_start, d.detected, d.species) for d in fleet] == \
               [(d.t_start, d.detected, d.species) for d in single], p.name
        np.testing.assert_allclose([d.score for d in fleet],
                                   [d.score for d in single], rtol=1e-5)
    # the planted call in file 1 is found, attributed to the right file
    from anuraxla.constants import SPECIES

    hits = [d for d in per_file[paths[1]]
            if d.detected and d.species == SPECIES[0] and 8.0 <= d.t_start < 11.0]
    assert hits, [(d.t_start, d.species) for d in per_file[paths[1]]]
    for p in (paths[0], paths[2]):
        assert not any(d.detected for d in per_file[p]), p.name


def test_fleet_window_batches_prepadded_layout(tmp_path, rng):
    """The extraction thread writes windows directly at the pre-padded
    column offset (ROADMAP item 4): rows are [B, row_len] with the valid
    region at the offset, zeros elsewhere, normalization touching only the
    valid region."""
    from anuraxla.pipeline.stream import fleet_window_batches

    sr, num = 16000, 16000
    paths = _plant_recordings(tmp_path, rng, sr, n_files=2)
    streams = [WavStream(p) for p in paths]
    row_len, off = num + 1024, 640
    got_plain, got_pad = [], []
    for layout, sink in (((None, None), got_plain), ((row_len, off), got_pad)):
        for batch, tags, n_valid in fleet_window_batches(
            streams, num_samples=num, hop_samples=sr, batch_size=4,
            target_sr=sr, normalize=True, prefetch=False,
            layout=None if layout[0] is None else (row_len, off),
        ):
            sink.append((batch.copy(), tags.copy(), n_valid))
    assert len(got_plain) == len(got_pad)
    for (bp, tp, nv), (bq, tq, nq) in zip(got_plain, got_pad):
        assert nv == nq and np.array_equal(tp, tq)
        assert bq.shape[1] == row_len
        np.testing.assert_array_equal(bq[:, off : off + num], bp)
        assert not bq[:, :off].any() and not bq[:, off + num :].any()


def test_fleet_scan_int16_passthrough_matches_float(tmp_path, rng):
    """A transfer_int16 session on PCM16-mono sources ships the raw int16
    samples (WavStream.read_i16, zero host conversion). The link payload is
    bitwise what the float round trip would re-quantize, so detections and
    scores must be IDENTICAL to the float-extraction session."""
    from anuraxla.pipeline.session import EncoderSession
    from anuraxla.pipeline.stream import scan_soundscapes

    root, mel, cfg, s_float = _scan_project(tmp_path, rng, per_species=6, seed=3)
    paths = _plant_recordings(tmp_path, rng, mel.sr, n_files=2)
    s_i16 = EncoderSession(
        mel=mel, batch_size=8, project_root=root, transfer_int16=True,
        normalize_on_device=True,
    ).load()
    s_dev = EncoderSession(
        mel=mel, batch_size=8, project_root=root, normalize_on_device=True,
    ).load()
    d_i16, _ = scan_soundscapes(paths, s_i16, detector="radial", config=cfg,
                                hop_seconds=1.0, log=lambda *a: None)
    d_ref, _ = scan_soundscapes(paths, s_dev, detector="radial", config=cfg,
                                hop_seconds=1.0, log=lambda *a: None)
    for p in paths:
        assert [(d.detected, d.species) for d in d_i16[p]] == \
               [(d.detected, d.species) for d in d_ref[p]], p.name
        np.testing.assert_allclose([d.score for d in d_i16[p]],
                                   [d.score for d in d_ref[p]],
                                   rtol=1e-5, atol=1e-6)


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
