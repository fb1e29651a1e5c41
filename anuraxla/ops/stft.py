"""Batched STFT power spectrum on TPU.

Replaces the per-file ``librosa.feature.melspectrogram`` STFT stage
(``map_detector_core.py:219-228``) with a batched, jit-compiled op.

Two backends:

- ``"matmul"`` (default on TPU): the DFT as two real matmuls against
  precomputed cos/-sin bases — frames [B·T, n_fft] × [n_fft, n_freq] lands on
  the MXU systolic array, which beats the generic FFT lowering for the small
  fixed n_fft=2048 used here and fuses cleanly with the downstream mel matmul.
- ``"fft"``: ``jnp.fft.rfft``, kept as the numerically-canonical oracle and
  for very large n_fft.

librosa parity notes: Hann window is periodic (fftbins=True); ``center=True``
pads n_fft//2 on both sides; pad_mode is constant-zero (librosa ≥0.10 default,
and what the reference's ``wav_to_mel`` uses implicitly).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window, identical to scipy.signal.get_window('hann', n, fftbins=True)."""
    k = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n_fft)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT bases: returns (C, S) of shape [n_fft, n_freq] with
    C[n,k] = w[n]·cos(2πkn/N), S[n,k] = -w[n]·sin(2πkn/N), so that
    frames @ C + i·(frames @ S) == rfft(frames · w)."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_window(n_fft).astype(np.float64)[:, None]
    return (
        (np.cos(ang) * w).astype(np.float32),
        (-np.sin(ang) * w).astype(np.float32),
    )


def frame_signal(
    y: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    num_frames: int,
    first_frame: int = 0,
    center: bool = True,
) -> jax.Array:
    """Slice a batch of signals into overlapping frames.

    y: [B, L] -> [B, num_frames, n_fft]. With ``center=True`` the signal is
    zero-padded n_fft//2 on each side first (librosa centered STFT). A
    ``first_frame`` offset lets the fast path compute only the frames that
    survive the center crop.
    """
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)))
    starts = (first_frame + jnp.arange(num_frames)) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]  # [T, n_fft]
    return y[:, idx]


def stft_power(
    y: jax.Array,
    *,
    n_fft: int,
    hop_length: int,
    num_frames: int,
    first_frame: int = 0,
    backend: Literal["matmul", "fft"] = "matmul",
    center: bool = True,
) -> jax.Array:
    """Power spectrogram |STFT|² of a batch of signals.

    y: [B, L] float32 -> [B, num_frames, n_fft//2 + 1] float32 (time-major,
    the natural layout for the following mel matmul).
    """
    frames = frame_signal(
        y,
        n_fft=n_fft,
        hop_length=hop_length,
        num_frames=num_frames,
        first_frame=first_frame,
        center=center,
    )
    if backend == "fft":
        win = jnp.asarray(hann_window(n_fft))
        spec = jnp.fft.rfft(frames * win, axis=-1)
        return (spec.real**2 + spec.imag**2).astype(jnp.float32)

    cos_b, sin_b = _dft_bases(n_fft)
    cos_b = jnp.asarray(cos_b)
    sin_b = jnp.asarray(sin_b)
    # HIGHEST keeps true-f32 MXU passes; the TPU default would use bf16 inputs
    # and break librosa parity in low-energy bins.
    re = jnp.einsum(
        "btn,nk->btk", frames, cos_b,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    im = jnp.einsum(
        "btn,nk->btk", frames, sin_b,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return re * re + im * im
