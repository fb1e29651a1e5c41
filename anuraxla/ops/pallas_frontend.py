"""Pallas TPU kernel: fused framing -> windowed DFT -> power -> mel.

The XLA path (ops.stft + ops.frontend) materializes three large HBM
intermediates per batch: frames [B,T,2048] and the re/im spectra [B,T,1025].
This kernel keeps all of them in VMEM: for each (batch row, frame tile) it
DMAs the tile's audio window from HBM once, builds the frame matrix in
scratch with static local offsets, then streams frequency tiles of the
windowed cos/-sin DFT bases, accumulating

    mel[t, m] += ((frames @ C_f)^2 + (frames @ S_f)^2) @ FB_f

directly into the [TILE_T, n_mels] output block — two MXU matmuls plus one
VPU square-add per tile, zero HBM round-trips for frames/spectra. dB
conversion, standardization, and the center crop stay in XLA (tiny
elementwise on [B, T, n_mels], fused into the consumer).

Layout notes (Mosaic constraints):
- The audio stays in HBM (memory_space=ANY) and is windowed via async DMA:
  dynamic slice offsets are legal for DMA but not for VMEM vector loads
  ("cannot statically prove index in bounds"), so in-kernel framing uses
  only static ``i*hop`` offsets within the DMA'd window.
- The signal is host-padded so every tile's full window exists; the
  frequency axis of the bases/filterbank is zero-padded to a 128 multiple
  (exact-zero contributions).

Grid: (B, T_tiles, F_tiles), frequency reduction innermost; the output block
index ignores the reduction dim (standard Pallas TPU accumulation pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anuraxla.constants import MelConfig
from anuraxla.ops.mel import mel_filterbank
from anuraxla.ops.stft import _dft_bases

TILE_T = 128  # frames per tile: [TILE_T, n_fft] MXU operand; 128 amortizes
TILE_F = 128  # frequency tile (lane width)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _padded_tables(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float):
    """(cos, sin, fb) zero-padded to a TILE_F-multiple frequency count."""
    cos_b, sin_b = _dft_bases(n_fft)  # [n_fft, n_freq]
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # [n_freq, n_mels]
    n_freq = cos_b.shape[1]
    n_freq_pad = _round_up(n_freq, TILE_F)
    pad = n_freq_pad - n_freq
    cos_p = np.pad(cos_b, ((0, 0), (0, pad)))
    sin_p = np.pad(sin_b, ((0, 0), (0, pad)))
    fb_p = np.pad(fb, ((0, pad), (0, 0)))
    return cos_p, sin_p, fb_p


def _mel_power_kernel(
    shifted_ref,  # [B, 8, L_shift] HBM (ANY): row k = signal shifted by k·hop
    cos_ref,  # [n_fft, TILE_F] VMEM — streamed per freq tile
    sin_ref,  # [n_fft, TILE_F]
    fb_ref,  # [TILE_F, n_mels]
    out_ref,  # [1, TILE_T, n_mels] — accumulated over the freq grid dim
    window,  # scratch VMEM [8, win_cols]
    frames,  # scratch VMEM [TILE_T, n_fft]
    dma_sem,  # DMA semaphore
    *,
    hop: int,
    n_fft: int,
    win_cols: int,
    exact: bool,
):
    b = pl.program_id(0)
    tt = pl.program_id(1)
    ft = pl.program_id(2)

    # Fetch this tile's audio window and build the frame matrix once per
    # (b, t_tile); both persist in scratch across the sequential freq steps.
    # Mosaic forbids sub-sublane VMEM slices (and row-sliced DMA dsts), so the
    # host supplies an 8-row hop-shifted copy of each signal: frame (8·i8 + k)
    # lives at window[k, i8·8·hop : +n_fft], making every access an aligned
    # [8, n_fft] block (full 8 sublanes; column offsets multiples of 128
    # because hop is).
    @pl.when(ft == 0)
    def _build():
        base = tt * (TILE_T * hop)
        copy = pltpu.make_async_copy(
            shifted_ref.at[b, :, pl.ds(base, win_cols)], window, dma_sem
        )
        copy.start()
        copy.wait()
        for i8 in range(TILE_T // 8):
            c = i8 * 8 * hop
            frames[i8 * 8 : (i8 + 1) * 8, :] = window[:, c : c + n_fft]

    f = frames[:, :]
    # HIGHEST = true-f32 MXU passes; the default bf16 rounding costs ~6e-2
    # in standardized-dB units and breaks librosa parity
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    re = jnp.dot(f, cos_ref[:, :], preferred_element_type=jnp.float32, precision=prec)
    im = jnp.dot(f, sin_ref[:, :], preferred_element_type=jnp.float32, precision=prec)
    p = re * re + im * im
    contrib = jnp.dot(p, fb_ref[:, :], preferred_element_type=jnp.float32, precision=prec)

    @pl.when(ft == 0)
    def _init():
        out_ref[0, :, :] = contrib

    @pl.when(ft != 0)
    def _acc():
        out_ref[0, :, :] = out_ref[0, :, :] + contrib


def mel_power_pallas(
    y: jax.Array,
    cfg: MelConfig,
    *,
    num_frames: int,
    interpret: bool = False,
    exact: bool = True,
) -> jax.Array:
    """[B, num_samples] -> mel power [B, num_frames, n_mels], fused on TPU.

    Matches ops.stft.stft_power(center=True, backend='matmul') composed with
    the mel matmul, to f32 accumulation tolerance when ``exact`` (true-f32
    MXU passes). ``exact=False`` uses the MXU's native bf16 passes — ~1.6x
    faster, |err| ~6e-2 in standardized-dB units, fine for detection but not
    for librosa bit-parity.
    """
    B, L = y.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if hop % 128 != 0:
        raise NotImplementedError(
            f"pallas backend needs hop_length % 128 == 0 (lane alignment); got {hop}. "
            "Use backend='matmul'."
        )
    n_t_tiles = -(-num_frames // TILE_T)
    t_pad = n_t_tiles * TILE_T
    # shifted-window row length: covers frames 0..TILE_T-8 of a tile plus n_fft
    win_cols = _round_up((TILE_T - 8) * hop + n_fft, 128)

    # center padding + enough tail that the last shifted window is in bounds
    pad_l = n_fft // 2
    L_shift = (n_t_tiles - 1) * TILE_T * hop + win_cols
    need = L_shift + 7 * hop
    pad_r = max(0, need - (L + pad_l))
    y_pad = jnp.pad(y, ((0, 0), (pad_l, pad_r)))
    # host-side 8-row hop-shifted view (see kernel docstring)
    shifted = jnp.stack(
        [jax.lax.slice_in_dim(y_pad, k * hop, k * hop + L_shift, axis=1) for k in range(8)],
        axis=1,
    )  # [B, 8, L_shift]

    cos_p, sin_p, fb_p = _padded_tables(cfg.sr, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    n_freq_pad = cos_p.shape[1]
    n_f_tiles = n_freq_pad // TILE_F

    kernel = functools.partial(
        _mel_power_kernel, hop=hop, n_fft=n_fft, win_cols=win_cols, exact=exact
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t_tiles, n_f_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # audio windowed via DMA
            pl.BlockSpec((n_fft, TILE_F), lambda b, tt, ft: (0, ft), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, TILE_F), lambda b, tt, ft: (0, ft), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_F, cfg.n_mels), lambda b, tt, ft: (ft, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_T, cfg.n_mels), lambda b, tt, ft: (b, tt, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, cfg.n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, win_cols), jnp.float32),
            pltpu.VMEM((TILE_T, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_pad * n_fft * n_freq_pad * 2 + 2 * B * t_pad * n_freq_pad * cfg.n_mels,
            bytes_accessed=B * 8 * L_shift * 4 + 2 * n_fft * n_freq_pad * 4 + B * t_pad * cfg.n_mels * 4,
            transcendentals=0,
        ),
    )(shifted, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))
    return out[:, :num_frames, :]
