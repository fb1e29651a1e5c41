"""Golden tests: JAX frontend vs independent NumPy oracle (librosa math)."""

import numpy as np
import pytest

from anuraxla.constants import MelConfig
from anuraxla.ops.frontend import log_mel_batch, rms_normalize_batch
from anuraxla.ops.mel import mel_filterbank
from anuraxla.ops.stft import hann_window, stft_power

from tests.reference_dsp import mel_fb_np, stft_power_np, wav_to_mel_np

CFG = MelConfig(duration=1.0)  # 1 s clips keep CPU tests fast; same math


def synth(rng, n, L):
    t = np.arange(L) / CFG.sr
    sigs = []
    for i in range(n):
        f0 = rng.uniform(200, 8000)
        s = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(L)
        sigs.append(s)
    return np.stack(sigs).astype(np.float32)


def test_hann_matches_scipy():
    from scipy.signal import get_window

    assert np.allclose(hann_window(2048), get_window("hann", 2048, fftbins=True), atol=1e-7)


def test_mel_filterbank_matches_oracle():
    ours = mel_filterbank(48000, 2048, 64, 150.0, 15000.0)  # [F, M]
    ref = mel_fb_np(48000, 2048, 64, 150.0, 15000.0)  # [M, F]
    assert ours.shape == (1025, 64)
    np.testing.assert_allclose(ours.T, ref, rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("backend", ["fft", "matmul"])
def test_stft_power_matches_oracle(rng, backend):
    y = synth(rng, 2, CFG.num_samples)
    ours = np.asarray(
        stft_power(
            y,
            n_fft=CFG.n_fft,
            hop_length=CFG.hop_length,
            num_frames=CFG.total_frames,
            backend=backend,
        )
    )  # [B, T, F]
    for b in range(2):
        ref = stft_power_np(y[b], CFG.n_fft, CFG.hop_length)  # [F, T]
        assert ours[b].T.shape == ref.shape
        scale = ref.max()
        atol = 5e-5 if backend == "fft" else 5e-4  # f32 matmul-DFT accumulation
        np.testing.assert_allclose(ours[b].T / scale, ref / scale, atol=atol)


def test_frame_signal_gather_fallback_zero_pads_tail(rng):
    """S = ceil(n_fft/hop) > 16 takes the gather path; frames past the padded
    signal end must read ZEROS like the shifted fast path (JAX gathers clamp
    out-of-bounds indices — regression for silently repeated tail samples)."""
    from anuraxla.ops.stft import frame_signal

    n_fft, hop = 512, 16  # S = 32 -> gather fallback
    L = 1024
    y = synth(rng, 1, L)
    T = 1 + L // hop + 4  # beyond the centered frame count: tail overruns the pad
    frames = np.asarray(
        frame_signal(y, n_fft=n_fft, hop_length=hop, num_frames=T, center=True)
    )
    last_start = (T - 1) * hop  # in padded coordinates
    overrun = last_start + n_fft - (L + 2 * (n_fft // 2))
    assert overrun > 0  # precondition: the tail really is out of range
    np.testing.assert_array_equal(frames[0, -1, -overrun:], 0.0)
    # in-range columns still match the signal
    pad = n_fft // 2
    y_pad = np.pad(np.asarray(y)[0], (pad, pad))
    np.testing.assert_allclose(frames[0, -1, :-overrun],
                               y_pad[last_start : last_start + n_fft - overrun])


@pytest.mark.parametrize("backend", ["fft", "matmul"])
def test_log_mel_parity_mode_matches_reference_chain(rng, backend):
    y = synth(rng, 3, CFG.num_samples)
    ours = np.asarray(log_mel_batch(y, CFG, parity=True, backend=backend))  # [B, T, M]
    assert ours.shape == (3, CFG.target_frames, CFG.n_mels)
    for b in range(3):
        ref = wav_to_mel_np(
            y[b], CFG.sr, CFG.duration, CFG.n_mels, CFG.fmin, CFG.fmax,
            CFG.hop_length, CFG.n_fft, CFG.target_frames,
        )  # [M, T]
        np.testing.assert_allclose(ours[b].T, ref, atol=2e-3)


def test_log_mel_short_clip_pads_time(rng):
    cfg = CFG.replace(duration=0.5)  # fewer frames than target -> center pad
    y = synth(rng, 1, cfg.num_samples)
    ours = np.asarray(log_mel_batch(y, cfg, parity=True))
    ref = wav_to_mel_np(
        y[0], cfg.sr, cfg.duration, cfg.n_mels, cfg.fmin, cfg.fmax,
        cfg.hop_length, cfg.n_fft, cfg.target_frames,
    )
    assert ours[0].T.shape == ref.shape
    np.testing.assert_allclose(ours[0].T, ref, atol=2e-3)


def test_fast_mode_close_to_parity(rng):
    cfg = MelConfig(duration=5.0)
    y = synth(rng, 1, cfg.num_samples)
    full = np.asarray(log_mel_batch(y, cfg, parity=True))
    fast = np.asarray(log_mel_batch(y, cfg, parity=False))
    assert full.shape == fast.shape
    # statistics differ slightly (window-local standardize) but should correlate strongly
    c = np.corrcoef(full.ravel(), fast.ravel())[0, 1]
    assert c > 0.98


def test_rms_normalize_matches_reference(rng):
    L = 1000
    loud = rng.standard_normal(L).astype(np.float32) * 0.3
    quiet = (rng.standard_normal(L) * 1e-5).astype(np.float32)
    y = np.stack([loud, quiet])
    out, scaled = rms_normalize_batch(y)
    out, scaled = np.asarray(out), np.asarray(scaled)

    # reference math (00_normalize_dataset_rms.py:29-38)
    rms = np.sqrt(np.mean(loud**2))
    ref = np.clip(loud * (0.05 / (rms + 1e-8)), -1.0, 1.0)
    np.testing.assert_allclose(out[0], ref, atol=1e-6)
    assert scaled[0] and not scaled[1]
    np.testing.assert_allclose(out[1], quiet, atol=0)  # silence passes through


def test_ct_backend_matches_oracle(rng):
    """Cooley–Tukey matmul factorization: same math as the dense bases, and
    empirically ~1000x closer to the fft oracle (fewer f32 accumulations)."""
    y = synth(rng, 1, CFG.num_samples)
    ours = np.asarray(
        stft_power(y, n_fft=CFG.n_fft, hop_length=CFG.hop_length,
                   num_frames=CFG.total_frames, backend="ct")
    )
    ref = stft_power_np(y[0], CFG.n_fft, CFG.hop_length)
    scale = ref.max()
    np.testing.assert_allclose(ours[0].T / scale, ref / scale, atol=5e-6)


def test_ct_backend_full_frontend(rng):
    y = synth(rng, 1, CFG.num_samples)
    got = np.asarray(log_mel_batch(y, CFG, backend="ct"))
    ref = np.asarray(log_mel_batch(y, CFG, backend="fft"))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_rms_normalize_np_matches_jax(rng):
    """The host-thread numpy twin and the jit path share one implementation;
    pin equality anyway (silent rows, clipping, scaling)."""
    import numpy as np
    import jax.numpy as jnp

    from anuraxla.ops.frontend import rms_normalize_batch, rms_normalize_np

    y = (0.3 * rng.standard_normal((4, 512))).astype(np.float32)
    y[1] *= 1e-6  # silent row: passes through unscaled
    y[2] *= 50.0  # hot row: hits the clip
    out_j, m_j = rms_normalize_batch(jnp.asarray(y))
    out_n, m_n = rms_normalize_np(y)
    np.testing.assert_allclose(np.asarray(out_j), out_n, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_j), m_n)
    np.testing.assert_array_equal(out_n[1], y[1])
    assert np.abs(out_n[2]).max() <= 1.0
