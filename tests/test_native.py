"""Native WAV decoder vs the pure-Python oracle: identical samples for every
supported encoding, same failure isolation, and a throughput sanity check."""

import numpy as np
import pytest

from anuraxla.native import wavloader
from anuraxla.pipeline.dataset import load_wav_batch
from anuraxla.utils.wavio import read_wav, write_wav

needs_native = pytest.mark.skipif(not wavloader.available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    y = (rng.standard_normal(48000) * 0.2).astype(np.float32)
    write_wav(d / "f32.wav", y, 48000, subtype="FLOAT")
    write_wav(d / "pcm16.wav", y, 48000, subtype="PCM_16")
    stereo = np.stack([y, -0.5 * y], axis=1)
    write_wav(d / "stereo.wav", stereo, 48000, subtype="PCM_16")
    write_wav(d / "short.wav", y[:1000], 48000, subtype="FLOAT")
    (d / "corrupt.wav").write_bytes(b"garbage bytes")
    return d, y


@needs_native
def test_native_matches_python_reader(wav_dir):
    d, y = wav_dir
    paths = [d / "f32.wav", d / "pcm16.wav", d / "stereo.wav", d / "short.wav", d / "corrupt.wav"]
    nb = wavloader.load_batch(paths, sr=48000, num_samples=48000, num_threads=4)
    pb = load_wav_batch(paths, sr=48000, num_samples=48000, use_native=False)

    np.testing.assert_array_equal(nb.ok, pb.ok)
    assert list(nb.ok) == [True, True, True, True, False]
    for i in range(4):
        np.testing.assert_allclose(nb.audio[i], pb.audio[i], atol=1e-7, err_msg=str(paths[i]))
    assert "RIFF" in (nb.errors[4] or "")
    # short file zero-padded identically
    assert nb.audio[3, 1000:].max() == 0.0


@needs_native
def test_native_resample_close_to_python(wav_dir, tmp_path):
    d, y = wav_dir
    t = np.arange(44100) / 44100
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "44k.wav"
    write_wav(p, tone, 44100, subtype="FLOAT")
    nb = wavloader.load_batch([p], sr=48000, num_samples=48000, num_threads=1)
    ref, _ = read_wav(p, sr=48000)
    assert nb.ok[0]
    n = min(len(ref), 47000)
    # both paths are the same Kaiser-polyphase filter now (r5): bit-close
    err = np.abs(nb.audio[0, :n] - ref[:n]).max()
    assert err < 1e-5, err


@needs_native
@pytest.mark.parametrize("sr_in,sr_out", [
    (48000, 16000),   # integer decimate (the common field-data case)
    (44100, 48000),   # CD -> 48k: up=160/down=147, the hard fractional pair
    (22050, 48000),
    (32000, 48000),
    (44100, 16000),
])
def test_native_resampler_matches_scipy_oracle(tmp_path, sr_in, sr_out):
    """The native resampler IS scipy.signal.resample_poly's math (Kaiser 5.0
    window, half_len=10*max_rate, unit-DC firwin, group-delay slicing) — pin
    float32 bit-equality against the scipy oracle on broadband noise, the
    signal class that exposes filter differences (tones don't)."""
    from scipy.signal import resample_poly

    rng = np.random.default_rng(int(sr_in) % 1000)
    yin = (0.4 * rng.standard_normal(sr_in)).astype(np.float32)  # 1 s
    p = tmp_path / f"in_{sr_in}.wav"
    write_wav(p, yin, sr_in, subtype="FLOAT")
    n_out = int(np.ceil(len(yin) * sr_out / sr_in))
    nb = wavloader.load_batch([p], sr=sr_out, num_samples=n_out, num_threads=1)
    assert nb.ok[0]
    g = np.gcd(sr_in, sr_out)
    ref = resample_poly(yin.astype(np.float64),
                        sr_out // g, sr_in // g).astype(np.float32)
    m = min(len(ref), n_out)
    np.testing.assert_allclose(nb.audio[0, :m], ref[:m], rtol=0, atol=5e-6)


@needs_native
def test_native_is_used_by_dataset_layer(wav_dir, monkeypatch):
    d, y = wav_dir
    import anuraxla.pipeline.dataset as ds

    monkeypatch.setattr(ds, "_native_loader", None)
    monkeypatch.setattr(ds, "_native_checked", False)
    b = ds.load_wav_batch([d / "pcm16.wav"], sr=48000, num_samples=48000)
    assert b.ok[0]
    assert ds._native_loader is not None  # the hook picked the native path


@needs_native
def test_native_empty_batch():
    b = wavloader.load_batch([], sr=48000, num_samples=100)
    assert b.audio.shape == (0, 100)


def _write_pcm24(path, samples_f32, sr):
    """Hand-rolled 24-bit PCM writer (write_wav doesn't emit 24-bit)."""
    import struct

    q = np.clip(np.round(samples_f32 * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int64)
    payload = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in q)
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 3, 3, 24)
    buf = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(payload)), payload,
    ])
    path.write_bytes(buf)


def _write_pcm8(path, samples_f32, sr):
    import struct

    q = np.clip(np.round(samples_f32 * 128.0 + 128.0), 0, 255).astype(np.uint8)
    payload = q.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr, 1, 8)
    buf = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(payload)), payload,
    ])
    path.write_bytes(buf)


@needs_native
def test_native_pcm24_and_pcm8_match_python(tmp_path, rng):
    y = (0.4 * np.sin(2 * np.pi * 440 * np.arange(4000) / 16000)).astype(np.float32)
    p24 = tmp_path / "a24.wav"
    p8 = tmp_path / "a8.wav"
    _write_pcm24(p24, y, 16000)
    _write_pcm8(p8, y, 16000)

    nb = wavloader.load_batch([p24, p8], sr=16000, num_samples=4000, num_threads=2)
    pb = load_wav_batch([p24, p8], sr=16000, num_samples=4000, use_native=False)
    assert nb.ok.all() and pb.ok.all()
    np.testing.assert_allclose(nb.audio, pb.audio, atol=1e-7)
    # decoded values approximate the source at the bit depth's resolution
    np.testing.assert_allclose(nb.audio[0], y, atol=1.0 / (1 << 22))
    np.testing.assert_allclose(nb.audio[1], y, atol=1.5 / 128)


def _write_rate_wav(path, sr):
    """Minimal PCM16 mono WAV whose fmt chunk declares an arbitrary rate."""
    import struct

    payload = np.zeros(64, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr & 0xFFFFFFFF, 0, 2, 16)
    buf = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(payload)), payload,
    ])
    path.write_bytes(buf)


@needs_native
def test_native_corrupt_sample_rate_fails_file_not_process(tmp_path):
    """Review r5 findings: sample_rate=0 used to SIGFPE the whole process
    (gcd(0, target) makes down=0) and a 4-billion header rate demanded a
    multi-billion-tap filter design (int overflow + unbounded CPU). Both
    must fail the FILE (ok=0, error string) like every other malformed
    input, alongside a good file that still decodes."""
    bad0 = tmp_path / "rate0.wav"
    badmax = tmp_path / "ratemax.wav"
    badratio = tmp_path / "rateprime.wav"  # plausible magnitude, co-prime
    good = tmp_path / "good.wav"
    _write_rate_wav(bad0, 0)
    _write_rate_wav(badmax, 0xFFFFFFFF)
    _write_rate_wav(badratio, 1_999_993)  # prime: up/down reduce to ~2M
    write_wav(good, np.zeros(256, dtype=np.float32), 48000)

    nb = wavloader.load_batch([bad0, badmax, badratio, good],
                              sr=48000, num_samples=1024, num_threads=2)
    assert list(nb.ok) == [0, 0, 0, 1]
    assert "sample rate" in nb.errors[0] and "sample rate" in nb.errors[1]
    assert "resample ratio" in nb.errors[2]
    # the Python decode path rejects the same headers (parity of behavior)
    from anuraxla.utils.wavio import read_wav

    for bad in (bad0, badmax):
        with pytest.raises(ValueError, match="sample rate"):
            read_wav(bad)
    with pytest.raises(ValueError, match="resample ratio"):
        read_wav(badratio, sr=48000)


@needs_native
def test_native_crop_early_and_generic_paths(tmp_path):
    """Fast paths crop to num_samples without reading the tail; 24-bit and
    empty files take the generic/error paths."""
    rng = np.random.default_rng(5)
    y = (rng.standard_normal(96000) * 0.3).astype(np.float32)
    long16 = tmp_path / "long16.wav"
    write_wav(long16, y, 48000, subtype="PCM_16")
    # hand-rolled 24-bit PCM (write_wav doesn't emit it; the reader must)
    import struct

    v = np.clip(np.round(y[:8000] * 8388608.0), -8388608, 8388607).astype(np.int32)
    b = bytearray()
    for s in v:
        b += int(s & 0xFFFFFF).to_bytes(3, "little")
    hdr = b"RIFF" + struct.pack("<I", 36 + len(b)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000, 48000 * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(b))
    p24 = tmp_path / "p24.wav"
    p24.write_bytes(hdr + bytes(b))
    empty = tmp_path / "empty.wav"
    empty.write_bytes(b"")

    nb = wavloader.load_batch([long16, p24, empty], sr=48000, num_samples=16000, num_threads=2)
    pb = load_wav_batch([long16, p24, empty], sr=48000, num_samples=16000, use_native=False)
    assert list(nb.ok) == [True, True, False]
    for i in range(2):
        np.testing.assert_allclose(nb.audio[i], pb.audio[i], atol=1e-7)


@needs_native
def test_native_strided_layout_matches_plain(wav_dir):
    """layout=(row_len, offset) decode == the plain decode placed at the
    offset, zeros elsewhere — native and pure-Python fallback agree."""
    d, y = wav_dir
    paths = [d / "pcm16.wav", d / "short.wav", d / "corrupt.wav"]
    L, row_len, off = 48000, 50048, 1024
    nb = wavloader.load_batch(paths, sr=48000, num_samples=L, num_threads=2,
                              layout=(row_len, off))
    pb = load_wav_batch(paths, sr=48000, num_samples=L, use_native=False,
                        layout=(row_len, off))
    plain = load_wav_batch(paths, sr=48000, num_samples=L, use_native=False)
    assert nb.audio.shape == pb.audio.shape == (3, row_len)
    np.testing.assert_array_equal(nb.ok, plain.ok)
    for b in (nb, pb):
        np.testing.assert_array_equal(b.audio[:, off : off + L], plain.audio)
        assert b.audio[:, :off].any() == False  # noqa: E712
        assert b.audio[:, off + L :].any() == False  # noqa: E712

    with pytest.raises(ValueError, match="cannot hold"):
        wavloader.load_batch(paths, sr=48000, num_samples=L, layout=(L, 10))
