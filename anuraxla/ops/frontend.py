"""Fused, batched audio frontend: raw waveform batch -> model-ready log-mels.

Replaces the reference's per-file chain ``librosa.load → melspectrogram →
power_to_db → standardize → crop_or_pad_time`` (``map_detector_core.py:198-237``)
with a single jit-compiled function over a [B, L] waveform batch that XLA
fuses end-to-end on TPU: framing gather → windowed-DFT matmul (MXU) → mel
matmul (MXU) → log/standardize (VPU, fused elementwise).

Two modes:

- ``parity=True`` (default): bit-faithful op order. The STFT covers the FULL
  clip; dB reference (per-example max), the 80 dB floor, and the global
  mean/std standardization are computed over all frames *before* the center
  crop to ``target_frames`` — exactly the reference order, which makes latents
  match within float tolerance.
- ``parity=False``: computes only the ``target_frames`` frames that survive
  the crop (~3.3× fewer STFT/mel FLOPs for 5 s clips) and takes dB ref and
  standardization statistics over that window. Statistically equivalent for
  detection, not bit-identical; used by the streaming soundscape path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from anuraxla.constants import RMS_EPS, RMS_SILENCE_GATE, RMS_TARGET, MelConfig
from anuraxla.ops.mel import (
    STANDARDIZE_EPS,
    crop_or_pad_time,
    mel_filterbank,
    power_to_db,
)
from anuraxla.ops.stft import stft_power


def _rms_normalize_impl(xp, y, target_rms, rms_min, eps):
    """The one normalization implementation (``00_normalize_dataset_rms.py:
    29-38``), parameterized over the array namespace so the jit path (jnp)
    and the host prefetch-thread path (np, pipeline.stream) cannot drift."""
    rms = xp.sqrt(xp.mean(y * y, axis=-1, keepdims=True))
    scaled = rms >= rms_min
    y_norm = xp.clip(y * (target_rms / (rms + eps)), -1.0, 1.0)
    return xp.where(scaled, y_norm, y), scaled[..., 0]


def rms_normalize_batch(
    y: jax.Array,
    *,
    target_rms: float = RMS_TARGET,
    rms_min: float = RMS_SILENCE_GATE,
    eps: float = RMS_EPS,
) -> tuple[jax.Array, jax.Array]:
    """Batched RMS normalization (``00_normalize_dataset_rms.py:29-38``).

    y: [B, L]. Returns (y_norm, scaled_mask). Silent rows (rms < rms_min) pass
    through unscaled, matching the reference's silence gate; scaled rows are
    clipped to [-1, 1].
    """
    return _rms_normalize_impl(jnp, y, target_rms, rms_min, eps)


def rms_scale_batch(
    y: jax.Array,
    *,
    target_rms: float = RMS_TARGET,
    rms_min: float = RMS_SILENCE_GATE,
    eps: float = RMS_EPS,
) -> jax.Array:
    """Per-row fused-normalization scale for ``log_mel_batch(rms_scale=...)``.

    Returns [B] with s > 0 for rows to be ``clip(y*s, -1, 1)``'d downstream
    and s = -1 marking silent rows (rms < rms_min) that pass through raw —
    together exactly ``rms_normalize_batch``, but without materializing the
    normalized signal: the reduction reads y once, and the scale+clip is
    folded into the Pallas mel kernel's VMEM tile (or applied inline by the
    XLA path), saving a signal-sized HBM write + re-read per batch.

    For PRE-PADDED rows (pallas_frontend.phase_padded_layout) pass the
    SLICED valid region, not the padded row: the slice reads fewer bytes
    AND keeps the reduction tree — and therefore the latents and caches —
    bitwise identical to the unpadded path (session.py does this).
    """
    rms = jnp.sqrt(jnp.mean(y * y, axis=-1))
    return jnp.where(rms >= rms_min, target_rms / (rms + eps), -1.0)


def apply_rms_scale(y: jax.Array, scale: jax.Array) -> jax.Array:
    """Materialize ``rms_scale_batch``'s contract on a [B, L] signal (the
    non-Pallas twin of the in-kernel fusion; s <= 0 = silence sentinel)."""
    s = scale[:, None]
    return jnp.where(s > 0, jnp.clip(y * s, -1.0, 1.0), y)


def rms_normalize_np(
    y,
    *,
    target_rms: float = RMS_TARGET,
    rms_min: float = RMS_SILENCE_GATE,
    eps: float = RMS_EPS,
):
    """Numpy twin of rms_normalize_batch (same implementation, host arrays)
    for prefetch threads that prepare batches off the device."""
    import numpy as np

    return _rms_normalize_impl(np, y, target_rms, rms_min, eps)


def resolved_backend(cfg: MelConfig, backend: str) -> str:
    """The frontend whose MATH will actually run for (cfg, backend) on this
    host — the Pallas backends fall back to the XLA matmul path when (a)
    the fused kernels' lane-alignment contracts don't hold (hop outside the
    %32/%16 families, e.g. 441), or (b) there is no TPU (Mosaic kernels
    only interpret on CPU — a test vehicle, not a serving path).
    "pallas-bf16" keeps its reduced-precision intent on fallback by running
    the matmuls at the MXU's native bf16 precision ("matmul-bf16").

    The latent-cache fingerprint (pipeline.session.session_fingerprint)
    encodes THIS value, not the requested name: pallas-exact and matmul
    agree to ~3e-7, not bitwise, so a key naming the requested backend
    would silently mix two numerically different frontends across hosts
    (CLAUDE.md cache-key invariant)."""
    if backend in ("pallas", "pallas-bf16"):
        from anuraxla.ops.pallas_frontend import pallas_supported

        if not pallas_supported(cfg) or jax.default_backend() not in (
            "tpu", "axon"
        ):
            return "matmul-bf16" if backend == "pallas-bf16" else "matmul"
    return backend


@partial(jax.jit, static_argnames=("cfg", "parity", "backend", "pre_padded"))
def log_mel_batch(
    y: jax.Array,
    cfg: MelConfig,
    *,
    parity: bool = True,
    backend: str = "matmul",
    rms_scale: jax.Array | None = None,
    pre_padded: bool = False,
) -> jax.Array:
    """[B, num_samples] float32 waveforms -> [B, target_frames, n_mels] log-mels.

    Input must already be cropped/padded to ``cfg.num_samples`` (the host-side
    loader does this; it is a data-layout step, not math). Output is
    time-major [T, M] — the encoder input layout (reference feeds [B,1,T,M],
    ``map_detector_core.py:268``).

    ``rms_scale`` ([B], from :func:`rms_scale_batch`): fuses the reference's
    RMS normalization into this call — equals
    ``log_mel_batch(rms_normalize_batch(y)[0], ...)`` without the normalized
    signal's HBM round-trip (on the Pallas backends the scale+clip runs
    inside the mel kernel's VMEM tile).

    ``pre_padded``: y rows are already in the phase-kernel layout
    (pallas_frontend.phase_padded_layout for the kernel's frame count) —
    the device-side signal pad is skipped. If the Pallas path is
    unavailable, the valid region is sliced back out for the fallback
    (correct, just without the saving).
    """
    if y.ndim == 1:
        y = y[None]
    fb = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))

    if parity:
        num_frames, first = cfg.total_frames, 0
    else:
        total = cfg.total_frames
        num_frames = min(cfg.target_frames, total)
        first = max(0, (total - cfg.target_frames) // 2)

    backend = resolved_backend(cfg, backend)
    prec = jax.lax.Precision.HIGHEST
    if backend == "matmul-bf16":
        backend, prec = "matmul", jax.lax.Precision.DEFAULT
    if backend in ("pallas", "pallas-bf16"):
        # fused framing+DFT+power+mel kernel (ops.pallas_frontend); computes
        # from frame 0, so the fast path slices afterwards
        from anuraxla.ops.pallas_frontend import mel_power_pallas

        S = mel_power_pallas(
            y, cfg, num_frames=first + num_frames,
            exact=(backend == "pallas"), rms_scale=rms_scale,
            pre_padded=pre_padded,
        )
        if first:
            S = jax.lax.slice_in_dim(S, first, first + num_frames, axis=1)
    else:
        if pre_padded:
            # phase-layout rows on a non-Pallas path: recover the raw signal
            # (zeros outside [pad_l, pad_l + num_samples) by contract). The
            # fast-frontend layout truncates the tail the kernel never
            # reads, so it cannot be recovered for the frame-offset path.
            from anuraxla.ops.pallas_frontend import phase_padded_layout

            if first:
                raise ValueError(
                    "pre_padded input requires the Pallas phase kernel in "
                    "fast-frontend mode (the padded layout drops the tail)"
                )
            _, pad_l = phase_padded_layout(cfg, first + num_frames)
            y = jax.lax.slice_in_dim(
                y, pad_l, pad_l + cfg.num_samples, axis=1
            )
        if rms_scale is not None:
            y = apply_rms_scale(y, rms_scale)
        P = stft_power(
            y,
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            num_frames=num_frames,
            first_frame=first,
            backend=backend,  # type: ignore[arg-type]
            precision=prec,
        )  # [B, T, F]
        S = jnp.einsum(
            "btf,fm->btm", P, fb,
            preferred_element_type=jnp.float32, precision=prec,
        )
    # Epilogue, stats-first: dB statistics (ref=max, mean/std) reduce over
    # the FULL [T, M] plane (librosa-parity order), but the normalize+write
    # touches only the cropped target_frames — identical math to
    # standardize-then-crop (the affine map commutes with the slice), with
    # the full-size normalized plane never materialized (~114 MB/batch of
    # HBM writes saved at B=1024).
    S_db = power_to_db(S, amin=cfg.amin, top_db=cfg.top_db)
    mean = jnp.mean(S_db, axis=(-2, -1), keepdims=True)
    std = jnp.std(S_db, axis=(-2, -1), keepdims=True)
    if S_db.shape[-2] >= cfg.target_frames:
        S_crop = crop_or_pad_time(S_db, cfg.target_frames)
        return (S_crop - mean) / (std + STANDARDIZE_EPS)
    # short clips pad AFTER normalizing — the pad must stay exact zeros
    return crop_or_pad_time((S_db - mean) / (std + STANDARDIZE_EPS), cfg.target_frames)


def mel_to_encoder_input(mel_tm: jax.Array) -> jax.Array:
    """[B, T, M] -> [B, T, M, 1] NHWC encoder input. (The reference uses NCHW
    [B,1,T,M]; NHWC is the TPU-native conv layout.)"""
    return mel_tm[..., None]
