"""EncoderSession option coverage: int16 transfer losslessness for PCM16
sources and fast-frontend decision consistency."""

import numpy as np
from pathlib import Path

from anuraxla.constants import MelConfig
from anuraxla.models.checkpoint import save_encoder
from anuraxla.models.vae import VAEConfig, init_encoder
from anuraxla.pipeline.session import EncoderSession
from anuraxla.utils.wavio import read_wav, write_wav

MEL = MelConfig(sr=16000, duration=0.5, target_frames=32, n_mels=32, fmax=7000)
VCFG = VAEConfig(latent_dim=8, widths=(8, 16), dense_width=16, groups=4, input_hw=(32, 32))


def make_session(tmp_path, **kw) -> EncoderSession:
    enc_dir = tmp_path / "enc"
    if not (enc_dir / "encoder.msgpack").exists():
        _, params = init_encoder(VCFG, 0)
        save_encoder(enc_dir, VCFG, params)
    kw.setdefault("batch_size", 4)
    return EncoderSession(mel=MEL, encoder_dir=enc_dir,
                          project_root=tmp_path, **kw).load()


def test_int16_transfer_lossless_for_pcm16_sources(tmp_path, rng):
    # source chunk stored as PCM16 (the reference's normalized format)
    y = (0.2 * rng.standard_normal(MEL.num_samples)).astype(np.float32)
    p = tmp_path / "c.wav"
    write_wav(p, y, MEL.sr, subtype="PCM_16")
    audio, _ = read_wav(p, sr=MEL.sr)
    batch = audio[None, :]

    z_f32 = make_session(tmp_path).encode_array(batch)
    z_i16 = make_session(tmp_path, transfer_int16=True).encode_array(batch)
    np.testing.assert_array_equal(z_f32, z_i16)  # exactly lossless


def test_reconfigure_recompiles_only_on_change(tmp_path, rng):
    s = make_session(tmp_path)
    fwd0 = s._fwd
    s.reconfigure(duration=MEL.duration)  # no-op: same duration
    assert s._fwd is fwd0

    s.reconfigure(duration=1.0)  # changed: frontend recompiles, mel updates
    assert s.mel.duration == 1.0 and s._fwd is not fwd0
    batch = (0.1 * rng.standard_normal((1, s.mel.num_samples))).astype(np.float32)
    z = s.encode_array(batch)
    assert z.shape == (1, VCFG.latent_dim)

    fwd1 = s._fwd
    s.reconfigure(parity=False)  # frontend-mode change also recompiles
    assert s._fwd is not fwd1 and s.parity is False


def test_fast_frontend_runs_and_differs_slightly(tmp_path, rng):
    batch = (0.1 * rng.standard_normal((2, MEL.num_samples))).astype(np.float32)
    z_par = make_session(tmp_path).encode_array(batch)
    z_fast = make_session(tmp_path, parity=False).encode_array(batch)
    assert z_par.shape == z_fast.shape
    # different op order (crop-first stats) but strongly correlated latents
    c = np.corrcoef(z_par.ravel(), z_fast.ravel())[0, 1]
    assert c > 0.95, c


def test_fingerprint_covers_transfer_int16(tmp_path):
    from anuraxla.pipeline.session import session_fingerprint

    fp_a = session_fingerprint(make_session(tmp_path))
    fp_b = session_fingerprint(make_session(tmp_path, transfer_int16=True))
    assert fp_a != fp_b and fp_b.endswith("_i16")


def test_data_parallel_pads_ragged_batches(tmp_path, rng):
    """A batch smaller than the data-axis count (e.g. encode-wav --wav with
    --data-parallel) must be padded to even shards, not crash."""
    import jax

    assert len(jax.devices()) >= 2  # conftest forces the 8-virtual-device CPU
    # batch_size 4 is NOT divisible by the 8-device data axis: load() must
    # round it up, not raise
    s_dp = make_session(tmp_path, data_parallel=True, batch_size=4)
    assert s_dp.batch_size % len(jax.devices()) == 0
    s_1 = make_session(tmp_path)
    batch = (0.1 * rng.standard_normal((1, MEL.num_samples))).astype(np.float32)
    z_dp = s_dp.encode_array(batch)
    assert z_dp.shape == (1, VCFG.latent_dim)
    np.testing.assert_allclose(z_dp, s_1.encode_array(batch), rtol=1e-5, atol=1e-6)


def test_cache_stale_on_root_and_subsample_change(tmp_path, rng):
    """The latent cache must invalidate when the SAME-named tree comes from a
    different directory, or when max_per_class/seed change (the archive holds
    post-subsample latents)."""
    from anuraxla.pipeline.session import encode_species_tree

    sp = "SpA"
    for site in ("siteA", "siteB"):
        d = tmp_path / site / "train_chunks" / sp
        d.mkdir(parents=True)
        r = np.random.default_rng(hash(site) % 2**32)
        for i in range(4):
            write_wav(d / f"{i}.wav", (0.2 * r.standard_normal(MEL.num_samples)).astype(np.float32), MEL.sr)

    s = make_session(tmp_path)
    cache = tmp_path / "cache"
    logs: list = []
    log = lambda *a: logs.append(" ".join(str(x) for x in a))  # noqa: E731

    Za, _, _ = encode_species_tree(s, tmp_path / "siteA" / "train_chunks", [sp],
                                   cache=True, cache_dir=cache, log=log)
    # same dir name, different site -> must NOT reuse siteA's latents
    Zb, _, _ = encode_species_tree(s, tmp_path / "siteB" / "train_chunks", [sp],
                                   cache=True, cache_dir=cache, log=log)
    assert not np.allclose(Za[sp], Zb[sp])

    # same site, different subsampling -> re-encode, not cache hit
    Zc, _, _ = encode_species_tree(s, tmp_path / "siteB" / "train_chunks", [sp],
                                   cache=True, cache_dir=cache, max_per_class=2, log=log)
    assert Zc[sp].shape[0] == 2


def test_concat_species_latents_empty_is_clear_error():
    import pytest

    from anuraxla.pipeline.session import concat_species_latents

    with pytest.raises(SystemExit, match="no evaluation latents"):
        concat_species_latents({}, ["SpA", "SpB"])
    Z, idx = concat_species_latents({"SpB": np.zeros((3, 4), np.float32)}, ["SpA", "SpB"])
    assert Z.shape == (3, 4) and (idx == 1).all()


def test_quantized_serving_session(tmp_path, rng):
    """quantize=True: int8 encoder contractions produce latents close to the
    f32 session's, and the cache fingerprint distinguishes the two modes."""
    from anuraxla.pipeline.session import session_fingerprint

    batch = (0.2 * rng.standard_normal((4, MEL.num_samples))).astype(np.float32)
    s_f32 = make_session(tmp_path)
    s_q8 = make_session(tmp_path, quantize=True)
    z_f32 = s_f32.encode_array(batch)
    z_q8 = s_q8.encode_array(batch)
    assert z_q8.shape == z_f32.shape
    num = (z_f32 * z_q8).sum(-1)
    den = np.linalg.norm(z_f32, axis=-1) * np.linalg.norm(z_q8, axis=-1)
    assert (num / den).min() > 0.95
    fp_a, fp_b = session_fingerprint(s_f32), session_fingerprint(s_q8)
    assert fp_a != fp_b and fp_b.endswith("_q8")


def test_normalize_on_device_matches_host_normalization(tmp_path, rng):
    """normalize_on_device=True on RAW audio == host rms_normalize then a
    plain session, and the cache fingerprint splits the two modes."""
    from anuraxla.ops.frontend import rms_normalize_batch
    from anuraxla.pipeline.session import session_fingerprint

    raw = (0.03 * rng.standard_normal((4, MEL.num_samples))).astype(np.float32)
    raw[2] *= 1e-6  # silent row: passes through un-normalized (gate)
    y_host = np.asarray(rms_normalize_batch(raw)[0])

    s_plain = make_session(tmp_path)
    s_fused = make_session(tmp_path, normalize_on_device=True)
    z_host = s_plain.encode_array(y_host)
    z_fused = s_fused.encode_array(raw)
    np.testing.assert_allclose(z_fused, z_host, atol=2e-5)

    fp_a, fp_b = session_fingerprint(s_plain), session_fingerprint(s_fused)
    assert fp_a != fp_b and fp_b.endswith("_ndev")


def test_bf16_encoder_serving_session(tmp_path, rng):
    """encoder_dtype='bfloat16': same f32 params, bf16 trunk compute —
    latents close to the f32 session's (heads stay f32), fingerprint split
    via the arch hash, and mutual exclusion with int8 serving enforced."""
    import pytest

    from anuraxla.pipeline.session import session_fingerprint

    batch = (0.2 * rng.standard_normal((4, MEL.num_samples))).astype(np.float32)
    s_f32 = make_session(tmp_path)
    s_bf16 = make_session(tmp_path, encoder_dtype="bfloat16")
    z_f32 = s_f32.encode_array(batch)
    z_bf16 = s_bf16.encode_array(batch)
    assert z_bf16.shape == z_f32.shape and z_bf16.dtype == np.float32
    num = (z_f32 * z_bf16).sum(-1)
    den = np.linalg.norm(z_f32, axis=-1) * np.linalg.norm(z_bf16, axis=-1)
    assert (num / den).min() > 0.99  # ~1e-2 relative drift bound
    assert session_fingerprint(s_f32) != session_fingerprint(s_bf16)

    with pytest.raises(ValueError, match="mutually exclusive"):
        make_session(tmp_path, encoder_dtype="bfloat16", quantize=True)
    with pytest.raises(ValueError, match="encoder_dtype"):
        make_session(tmp_path, encoder_dtype="fp8")


def test_pre_padded_host_session_bitwise_equal(tmp_path, rng):
    """pre_padded_host=True: latents are bitwise the plain session's (same
    kernel data; fused-RMS scale reduced over the sliced valid region), the
    fingerprint does NOT split, and the knob validates its requirements."""
    import pytest

    from anuraxla.pipeline.session import session_fingerprint

    mel = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    enc_dir = tmp_path / "enc2"
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.vae import init_encoder as _init

    vcfg = VAEConfig(latent_dim=8, widths=(8, 16), dense_width=16, groups=4,
                     input_hw=(96, 64))
    _, params = _init(vcfg, 0)
    save_encoder(enc_dir, vcfg, params)

    def mk(**kw):
        return EncoderSession(mel=mel, encoder_dir=enc_dir, batch_size=4,
                              project_root=tmp_path, backend="pallas",
                              normalize_on_device=True, **kw).load()

    batch = (0.1 * rng.standard_normal((3, mel.num_samples))).astype(np.float32)
    s_plain = mk()
    s_pp = mk(pre_padded_host=True)
    z_plain = s_plain.encode_array(batch)
    z_pp = s_pp.encode_array(batch)  # raw rows staged host-side
    np.testing.assert_array_equal(z_pp, z_plain)
    assert session_fingerprint(s_plain) == session_fingerprint(s_pp)

    with pytest.raises(ValueError, match="pre_padded_host requires"):
        mk_bad = EncoderSession(mel=mel, encoder_dir=enc_dir, batch_size=4,
                                project_root=tmp_path, backend="matmul",
                                pre_padded_host=True)
        mk_bad.load()


def test_pre_padded_host_encode_paths(tmp_path, rng):
    """encode_paths with pre_padded_host: the decoder delivers padded rows
    end to end; latents equal the plain session's."""
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.vae import init_encoder as _init
    from anuraxla.utils.wavio import write_wav

    mel = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    enc_dir = tmp_path / "enc3"
    vcfg = VAEConfig(latent_dim=8, widths=(8, 16), dense_width=16, groups=4,
                     input_hw=(96, 64))
    _, params = _init(vcfg, 0)
    save_encoder(enc_dir, vcfg, params)

    paths = []
    for i in range(3):
        y = (0.2 * rng.standard_normal(mel.num_samples)).astype(np.float32)
        p = tmp_path / f"w{i}.wav"
        write_wav(p, y, mel.sr, subtype="PCM_16")
        paths.append(p)

    def mk(**kw):
        return EncoderSession(mel=mel, encoder_dir=enc_dir, batch_size=2,
                              project_root=tmp_path, backend="pallas", **kw).load()

    Z_plain, ok_p, _ = mk().encode_paths(paths)
    Z_pp, ok_pp, _ = mk(pre_padded_host=True).encode_paths(paths)
    np.testing.assert_array_equal(ok_p, ok_pp)
    np.testing.assert_array_equal(Z_pp, Z_plain)


def test_fingerprint_encodes_effective_backend(tmp_path):
    """CLAUDE.md cache-key invariant: the fingerprint names the backend
    whose MATH runs. On this CPU host backend='pallas' falls back to the
    matmul path, so its fingerprint must EQUAL the matmul session's (same
    math, same cache) and must not claim 'pallas'."""
    from anuraxla.pipeline.session import session_fingerprint

    s_pallas = make_session(tmp_path, backend="pallas")
    s_matmul = make_session(tmp_path)
    fp_p, fp_m = session_fingerprint(s_pallas), session_fingerprint(s_matmul)
    assert fp_p == fp_m
    assert "_pallas_" not in fp_p


def test_pre_padded_host_survives_reconfigure(tmp_path, rng):
    """reconfigure(duration=...) reruns load(), which must recompute the
    pre-padded decode layout for the new mel config — stale layouts would
    ship wrong-length rows."""
    mel = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.vae import init_encoder as _init

    enc_dir = tmp_path / "enc_rc"
    vcfg = VAEConfig(latent_dim=8, widths=(8, 16), dense_width=16, groups=4,
                     input_hw=(96, 64))
    _, params = _init(vcfg, 0)
    save_encoder(enc_dir, vcfg, params)

    s = EncoderSession(mel=mel, encoder_dir=enc_dir, batch_size=2,
                       project_root=tmp_path, backend="pallas",
                       pre_padded_host=True).load()
    layout0 = s._layout
    s.reconfigure(duration=2.0)
    assert s._layout != layout0  # longer clips -> longer padded rows
    batch = (0.1 * rng.standard_normal((2, s.mel.num_samples))).astype(np.float32)
    z = s.encode_array(batch)

    s_plain = EncoderSession(mel=s.mel, encoder_dir=enc_dir, batch_size=2,
                             project_root=tmp_path, backend="pallas").load()
    np.testing.assert_array_equal(z, s_plain.encode_array(batch))


def test_cache_stale_on_file_list_change(tmp_path, rng):
    """The archive holds latents for exactly the files that were present —
    adding/renaming a wav must invalidate it (noised latents are seeded by
    row position, so a shifted list silently changes them otherwise)."""
    from anuraxla.pipeline.session import encode_species_tree

    sp = "SpA"
    d = tmp_path / "train_chunks" / sp
    d.mkdir(parents=True)
    for i in range(3):
        write_wav(d / f"{i}.wav",
                  (0.2 * rng.standard_normal(MEL.num_samples)).astype(np.float32), MEL.sr)

    s = make_session(tmp_path)
    cache = tmp_path / "cache"
    logs: list = []
    log = lambda *a: logs.append(" ".join(str(x) for x in a))  # noqa: E731

    encode_species_tree(s, tmp_path / "train_chunks", [sp],
                        cache=True, cache_dir=cache, log=log)
    (d / "0.wav").rename(d / "9.wav")
    logs.clear()
    encode_species_tree(s, tmp_path / "train_chunks", [sp],
                        cache=True, cache_dir=cache, log=log)
    assert any("stale" in m for m in logs), logs
