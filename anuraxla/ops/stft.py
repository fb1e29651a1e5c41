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
def _ct_tables(n_fft: int, n1: int = 128):
    """Cooley–Tukey tables for the ``ct`` backend: inner DFT-N1 bases,
    twiddles W_N^{n2 r}, outer DFT-N2 bases. Index split n = n1·N2 + n2,
    k = q·N1 + r."""
    n2 = n_fft // n1
    assert n1 * n2 == n_fft
    r = np.arange(n1, dtype=np.float64)
    ang1 = 2.0 * np.pi * r[:, None] * r[None, :] / n1  # [n1, n1] (n1' x r)
    cos1, sin1 = np.cos(ang1), np.sin(ang1)
    s = np.arange(n2, dtype=np.float64)
    ang_t = 2.0 * np.pi * s[:, None] * r[None, :] / n_fft  # [n2, n1]: W_N^{n2 r}
    tw_c, tw_s = np.cos(ang_t), np.sin(ang_t)
    q = np.arange(n2, dtype=np.float64)
    ang2 = 2.0 * np.pi * s[:, None] * q[None, :] / n2  # [n2, n2]
    cos2, sin2 = np.cos(ang2), np.sin(ang2)
    f32 = lambda a: a.astype(np.float32)  # noqa: E731
    return f32(cos1), f32(sin1), f32(tw_c), f32(tw_s), f32(cos2), f32(sin2), n1, n2


def _stft_power_ct(frames: jax.Array, n_fft: int) -> jax.Array:
    """|DFT|² via a radix-(128, N/128) Cooley–Tukey factorization expressed as
    MXU matmuls — ~5× fewer FLOPs than the dense [n_fft, n_freq] bases, same
    f32 math (summation order differs at the usual f32 tolerance).

    frames: [B, T, n_fft] *windowed* frames -> power [B, T, n_fft//2 + 1].
    """
    cos1, sin1, tw_c, tw_s, cos2, sin2, n1, n2 = _ct_tables(n_fft)
    hi = jax.lax.Precision.HIGHEST
    B, T, _ = frames.shape
    # x[n] with n = n1·n2q + s  ->  xs[s, n1]
    xs = frames.reshape(B, T, n1, n2).swapaxes(-1, -2)  # [B, T, n2, n1]
    # inner DFT over n1 (contraction 128 — MXU-shaped)
    c1 = jnp.asarray(cos1)
    s1 = jnp.asarray(sin1)
    Ar = jnp.einsum("btsn,nr->btsr", xs, c1, preferred_element_type=jnp.float32, precision=hi)
    Ai = -jnp.einsum("btsn,nr->btsr", xs, s1, preferred_element_type=jnp.float32, precision=hi)
    # twiddle W_N^{s r} (elementwise complex multiply; fuses into the consumer)
    tc = jnp.asarray(tw_c)[None, None]
    ts = jnp.asarray(tw_s)[None, None]
    Cr = Ar * tc + Ai * ts
    Ci = Ai * tc - Ar * ts
    # outer DFT over s (size n2)
    c2 = jnp.asarray(cos2)
    s2 = jnp.asarray(sin2)
    Xr = (
        jnp.einsum("btsr,sq->btqr", Cr, c2, preferred_element_type=jnp.float32, precision=hi)
        + jnp.einsum("btsr,sq->btqr", Ci, s2, preferred_element_type=jnp.float32, precision=hi)
    )
    Xi = (
        jnp.einsum("btsr,sq->btqr", Ci, c2, preferred_element_type=jnp.float32, precision=hi)
        - jnp.einsum("btsr,sq->btqr", Cr, s2, preferred_element_type=jnp.float32, precision=hi)
    )
    P = (Xr * Xr + Xi * Xi).reshape(B, T, n_fft)  # k = q·n1 + r
    return P[..., : n_fft // 2 + 1]


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

    Implementation: XLA gathers are slow on TPU (measured ~3× the whole
    pipeline cost), so when S·hop ≥ n_fft for a small S, frames are built
    gather-free from S hop-shifted copies of the signal: frame (S·m + k)
    is row k of shifted copy k, columns [m·S·hop : m·S·hop + n_fft] — a
    reshape + static slice per shift. Falls back to the gather only for
    exotic hop/n_fft ratios.
    """
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)))

    S = -(-n_fft // hop_length)  # shifts needed so a row covers one frame
    if S <= 16:
        S = max(S, 2)
        B = y.shape[0]
        n_groups = -(-num_frames // S)  # frames padded up to a multiple of S
        row = S * hop_length  # columns consumed per group within a shift
        L_shift = (n_groups - 1) * row + n_fft
        base = first_frame * hop_length
        need = base + (S - 1) * hop_length + L_shift
        if need > y.shape[1]:
            y = jnp.pad(y, ((0, 0), (0, need - y.shape[1])))
        # shifted[k] = y[base + k·hop : +L_shift]; group m of shift k is
        # frame S·m + k
        shifted = jnp.stack(
            [
                jax.lax.slice_in_dim(y, base + k * hop_length, base + k * hop_length + L_shift, axis=1)
                for k in range(S)
            ],
            axis=1,
        )  # [B, S, L_shift]
        # pad columns so each group is a full `row` wide, then split groups
        grouped = jnp.pad(shifted, ((0, 0), (0, 0), (0, n_groups * row - L_shift)))
        grouped = grouped.reshape(B, S, n_groups, row)[..., :n_fft]  # [B, S, G, n_fft]
        frames = jnp.swapaxes(grouped, 1, 2).reshape(B, n_groups * S, n_fft)
        return frames[:, :num_frames, :]

    # gather fallback must share the fast path's boundary semantics: pad the
    # tail so out-of-range frames read zeros (JAX gathers otherwise CLAMP
    # out-of-bounds indices — silently repeating the final sample)
    need = (first_frame + num_frames - 1) * hop_length + n_fft
    if need > y.shape[1]:
        y = jnp.pad(y, ((0, 0), (0, need - y.shape[1])))
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
    backend: Literal["matmul", "fft", "ct"] = "matmul",
    center: bool = True,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Power spectrogram |STFT|² of a batch of signals.

    y: [B, L] float32 -> [B, num_frames, n_fft//2 + 1] float32 (time-major,
    the natural layout for the following mel matmul).

    Backends: "matmul" (dense windowed-DFT bases, reference-grade), "ct"
    (Cooley–Tukey matmul factorization, ~5× fewer FLOPs, same f32 tolerance),
    "fft" (jnp.fft oracle).
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
    if backend == "ct":
        win = jnp.asarray(hann_window(n_fft))
        return _stft_power_ct(frames * win, n_fft)

    cos_b, sin_b = _dft_bases(n_fft)
    cos_b = jnp.asarray(cos_b)
    sin_b = jnp.asarray(sin_b)
    # Default HIGHEST keeps true-f32 MXU passes; the TPU bf16 default would
    # break librosa parity in low-energy bins. Callers that explicitly opted
    # out of parity (pallas-bf16 fallback) pass DEFAULT.
    re = jnp.einsum(
        "btn,nk->btk", frames, cos_b,
        preferred_element_type=jnp.float32, precision=precision,
    )
    im = jnp.einsum(
        "btn,nk->btk", frames, sin_b,
        preferred_element_type=jnp.float32, precision=precision,
    )
    return re * re + im * im
