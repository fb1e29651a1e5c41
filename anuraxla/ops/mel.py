"""Slaney mel filterbank and dB conversion with librosa-identical math.

Parity targets: ``librosa.filters.mel(htk=False, norm='slaney')`` and
``librosa.power_to_db(S, ref=np.max)`` with its implicit defaults
(amin=1e-10, top_db=80.0) — the exact ops inside the reference's
``wav_to_mel`` (``map_detector_core.py:219-232``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f):
    f = np.asanyarray(f, dtype=np.float64)
    mel = f / _F_SP
    return np.where(f >= _MIN_LOG_HZ, _MIN_LOG_MEL + np.log(f / _MIN_LOG_HZ) / _LOGSTEP, mel)


def mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f = m * _F_SP
    return np.where(m >= _MIN_LOG_MEL, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
) -> np.ndarray:
    """Triangular Slaney-normalized mel filterbank, shaped [n_freq, n_mels]
    (transposed vs librosa's [n_mels, n_freq] so the spectrogram-to-mel step
    is a right matmul over the time-major power spectrum)."""
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freq, dtype=np.float64)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalization
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]

    return np.ascontiguousarray(weights.T.astype(np.float32))  # [n_freq, n_mels]


def power_to_db(
    S: jax.Array,
    *,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
) -> jax.Array:
    """``librosa.power_to_db(S, ref=np.max)`` over the trailing two axes.

    S: [..., T, M] power mel spectrogram; the per-example max (librosa's
    callable ref) and the top_db floor are reduced over (T, M) per example.
    """
    log10 = jnp.log(10.0)
    ref = jnp.max(S, axis=(-2, -1), keepdims=True)
    log_spec = 10.0 * jnp.log(jnp.maximum(S, amin)) / log10
    log_spec = log_spec - 10.0 * jnp.log(jnp.maximum(ref, amin)) / log10
    if top_db is not None:
        # librosa's floor is max(log_spec) - top_db, but with ref = max(S)
        # (the only mode here) max(log_spec) == 0 exactly: the argmax
        # element maps to 0 when ref >= amin, and when ref < amin every
        # element clamps to amin so log_spec ≡ 0. Using the constant saves
        # a full [T, M] reduction pass per batch.
        log_spec = jnp.maximum(log_spec, -top_db)
    return log_spec


# the reference's standardization epsilon (map_detector_core.py:232) — the
# ONE constant; log_mel_batch's stats-first epilogue must use the same value
STANDARDIZE_EPS = 1e-8


def standardize(S_db: jax.Array, eps: float = STANDARDIZE_EPS) -> jax.Array:
    """Global per-example standardization (``map_detector_core.py:232``):
    (x - mean) / (std + eps), statistics over the full [T, M] plane, ddof=0."""
    mean = jnp.mean(S_db, axis=(-2, -1), keepdims=True)
    std = jnp.std(S_db, axis=(-2, -1), keepdims=True)
    return (S_db - mean) / (std + eps)


def crop_or_pad_time(mel_tm: jax.Array, target_frames: int) -> jax.Array:
    """Center crop/pad along the time axis of a time-major [..., T, M] mel
    (``map_detector_core.py:185-195``, which operates on [M, T]; same indices)."""
    T = mel_tm.shape[-2]
    if T == target_frames:
        return mel_tm
    if T > target_frames:
        start = (T - target_frames) // 2
        return jax.lax.slice_in_dim(mel_tm, start, start + target_frames, axis=-2)
    pad_total = target_frames - T
    pad_left = pad_total // 2
    pad = [(0, 0)] * (mel_tm.ndim - 2) + [(pad_left, pad_total - pad_left), (0, 0)]
    return jnp.pad(mel_tm, pad)
