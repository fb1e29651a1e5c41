"""Independent NumPy oracle reimplementing the reference's wav_to_mel math
(librosa semantics) for golden-testing the JAX frontend. Written directly from
the librosa algorithm definitions (librosa is not installed here); kept
separate from the library code so tests don't test code against itself.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import get_window


def stft_power_np(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Centered |STFT|^2, constant (zero) padding. Returns [n_freq, T]."""
    pad = n_fft // 2
    ypad = np.pad(y, (pad, pad))
    win = get_window("hann", n_fft, fftbins=True).astype(np.float64)
    T = 1 + (len(ypad) - n_fft) // hop
    frames = np.stack([ypad[t * hop : t * hop + n_fft] for t in range(T)])
    spec = np.fft.rfft(frames * win, axis=-1)
    return (np.abs(spec) ** 2).T  # [F, T]


def _hz_to_mel(f):
    f = np.asanyarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    f = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def mel_fb_np(sr, n_fft, n_mels, fmin, fmax) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') -> [n_mels, n_freq]."""
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0, sr / 2, n_freq)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = np.subtract.outer(mel_f, fftfreqs)
    weights = np.zeros((n_mels, n_freq))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights


def power_to_db_np(S, amin=1e-10, top_db=80.0):
    ref = S.max()
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def crop_or_pad_time_np(mel, target_frames):
    """Reference crop_or_pad_time on [M, T] (map_detector_core.py:185-195)."""
    _, T = mel.shape
    if T == target_frames:
        return mel
    if T > target_frames:
        start = (T - target_frames) // 2
        return mel[:, start : start + target_frames]
    pad_total = target_frames - T
    pad_left = pad_total // 2
    return np.pad(mel, ((0, 0), (pad_left, pad_total - pad_left)), mode="constant")


def wav_to_mel_np(y, sr, duration, n_mels, fmin, fmax, hop, n_fft, target_frames):
    """Full reference wav_to_mel chain on an in-memory signal -> [M, T]."""
    if duration > 0:
        target_len = int(sr * duration)
        if y.shape[0] < target_len:
            y = np.pad(y, (0, target_len - y.shape[0]))
        else:
            y = y[:target_len]
    P = stft_power_np(y.astype(np.float32), n_fft, hop)  # [F, T]
    S = mel_fb_np(sr, n_fft, n_mels, fmin, fmax) @ P  # [M, T]
    S_db = power_to_db_np(S)
    S_db = (S_db - S_db.mean()) / (S_db.std() + 1e-8)
    return crop_or_pad_time_np(S_db, target_frames)
