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


def _split_bf16_np(x: np.ndarray):
    """Host-side twin of _split_bf16: f32 table -> (hi, lo) bf16 pair."""
    import ml_dtypes

    x32 = x.astype(np.float32)
    hi = x32.astype(ml_dtypes.bfloat16)
    lo = (x32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=8)
def _ct_tables_folded(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float):
    """Host tables for the in-kernel Cooley–Tukey factorization
    n = n1·128 + n2 (n1 ∈ [0, R), R = n_fft/128), k = q·R + r — with the
    inter-stage twiddles FOLDED into per-r outer bases, and the conjugate
    symmetry of the power spectrum used to drop blocks r > R/2:

    - C/S [(R//2+1)·128, 128]: rows r·128+n2 hold cos/sin(2π n2 (q·R+r)/n_fft)
      = twiddle W_nfft^{n2 r} × outer DFT-128 base W_128^{n2 q} — one MXU
      matmul per r replaces twiddle-multiply + shared-base matmul (no VPU
      twiddle work, and zero inner-stage components stay elided through the
      MXU stage);
    - FBM [(R//2+1)·128, n_mels]: merged mel filterbank. The input is real, so
      |X[n_fft−k]| = |X[k]|; block R−r at column q equals block r at column
      127−q, so its filterbank rows fold into block r reversed:
      FBM[r·128+q] = fb[qR+r] (direct, k < n_freq ⇔ q ≤ 63 for r ≥ 1)
                   + fb[(127−q)R + (R−r)] (partner, lands on q ≥ 64).
      Self-paired blocks (r = 0, and r = R/2 for even R) keep direct rows
      only. Blocks r > R/2 are never computed — ~44% of the outer-stage MXU
      and VPU work gone for R = 16.
    - win [1, n_fft]: periodic Hann (applied to frames; CT bases can't fold
      a per-sample window the way the dense bases do).

    C/S are returned as host-pre-split (hi, lo) bf16 pairs for the 3-pass
    exact matmuls (hi alone serves the bf16 mode); FBM as ONE lane-packed
    [·, 2·n_mels] hi|lo table (lanes [:n_mels] = hi serve the bf16 mode);
    plus the f32 window.
    """
    from anuraxla.ops.stft import hann_window

    R = n_fft // 128
    n_freq = n_fft // 2 + 1
    n_half = R // 2 + 1
    n2 = np.arange(128, dtype=np.float64)[:, None]
    q = np.arange(128, dtype=np.float64)[None, :]
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # [n_freq, n_mels]
    C = np.zeros((n_half * 128, 128), np.float64)
    S = np.zeros_like(C)
    FBM = np.zeros((n_half * 128, n_mels), np.float64)
    for r in range(n_half):
        ang = 2.0 * np.pi * n2 * (q * R + r) / n_fft
        C[r * 128 : (r + 1) * 128] = np.cos(ang)
        S[r * 128 : (r + 1) * 128] = np.sin(ang)
        self_paired = r == 0 or 2 * r == R
        for qq in range(128):
            k = qq * R + r
            if k < n_freq:
                FBM[r * 128 + qq] += fb[k]
            if not self_paired:
                kp = (127 - qq) * R + (R - r)
                if kp < n_freq:
                    FBM[r * 128 + qq] += fb[kp]
    win = hann_window(n_fft).reshape(1, n_fft)
    fb_hi, fb_lo = _split_bf16_np(FBM)
    return (
        _split_bf16_np(C),
        _split_bf16_np(S),
        # hi | lo packed along lanes: 2*n_mels <= 128 keeps the exact fb's
        # hi passes inside ONE full MXU tile (see _ct_outer_stage)
        np.concatenate([fb_hi, fb_lo], axis=1),
        win,
    )


@functools.lru_cache(maxsize=8)
def _ct_tables_folded_cat(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float, exact: bool
):
    """Concatenated-operand variant of _ct_tables_folded (fused_dots=True):
    instead of 6-12 separate [T,128]x[128,128] bf16 passes per r (the 3-pass
    exact splits of x_re and x_im), each r becomes ONE wide matmul

        [ar_hi ar_hi ar_lo (ai_hi ai_hi ai_lo)] @ RHS_r -> [T, 256] = x_re|x_im

    with the split structure and the x_im negation folded into RHS_r on the
    host: row-blocks (C_hi|-S_hi; C_lo|-S_lo; C_hi|-S_hi) for the ar
    columns and (S_hi|C_hi; S_lo|C_lo; S_hi|C_hi) for ai. Same MACs, ~6x
    fewer MXU ops issued — the kernel is issue-bound, not MAC-bound. The
    merged filterbank gets the same treatment ([p_hi p_hi p_lo] @ FBCAT_r).

    Returns (win, rhs_real [n_real*K1, 256], rhs_cplx [n_cplx*K2, 256],
    fbcat [n_half*K1, n_mels]) with K1 = 3*128 (exact) or 128, K2 = 2*K1;
    real r's are r = 0 and (R even) r = R/2, in ascending order.
    """
    import ml_dtypes

    R = n_fft // 128
    n_half = R // 2 + 1
    (chi, clo), (shi, slo), fbpair, win = _ct_tables_folded(
        sr, n_fft, n_mels, fmin, fmax
    )
    fbhi, fblo = fbpair[:, :n_mels], fbpair[:, n_mels:]
    bf16 = ml_dtypes.bfloat16

    def blocks(r, tab_hi, tab_lo):
        sl = slice(r * 128, (r + 1) * 128)
        return np.asarray(tab_hi[sl]), np.asarray(tab_lo[sl])

    rhs_real, rhs_cplx, fbcat = [], [], []
    for r in range(n_half):
        Ch, Cl = blocks(r, chi, clo)
        Sh, Sl = blocks(r, shi, slo)
        Fh, Fl = blocks(r, fbhi, fblo)
        if exact:
            ar_rows = np.concatenate([
                np.concatenate([Ch, -Sh], axis=1),
                np.concatenate([Cl, -Sl], axis=1),
                np.concatenate([Ch, -Sh], axis=1),
            ])  # [384, 256]
            ai_rows = np.concatenate([
                np.concatenate([Sh, Ch], axis=1),
                np.concatenate([Sl, Cl], axis=1),
                np.concatenate([Sh, Ch], axis=1),
            ])
            fbcat.append(np.concatenate([Fh, Fl, Fh]))  # [384, n_mels]
        else:
            ar_rows = np.concatenate([Ch, -Sh], axis=1)  # [128, 256]
            ai_rows = np.concatenate([Sh, Ch], axis=1)
            fbcat.append(np.asarray(Fh))
        real_only = r == 0 or 2 * r == R
        if real_only:
            rhs_real.append(ar_rows)
        else:
            rhs_cplx.append(np.concatenate([ar_rows, ai_rows]))
    if not rhs_cplx:  # R = 2: r = 0 and r = R/2 are both real-only — pass a
        # never-read dummy block (a 0-row VMEM block is not expressible)
        rhs_cplx.append(np.zeros((768 if exact else 256, 256), np.float32))
    return (
        win,
        np.concatenate(rhs_real).astype(bf16),
        np.concatenate(rhs_cplx).astype(bf16),
        np.concatenate(fbcat).astype(bf16),
    )


def _n_add(x, y):
    """Add with None-as-zero (used to elide provably-zero blocks)."""
    if x is None:
        return y
    if y is None:
        return x
    return x + y


def _n_sub(x, y):
    if y is None:
        return x
    if x is None:
        return -y
    return x - y


def _n_scale(x, c: float):
    if x is None or c == 0.0:
        return None
    if c == 1.0:
        return x
    if c == -1.0:
        return -x
    return x * c


def _cmul_w(z, j: int, N: int):
    """(re, im) * W_N^j with W = e^{-2πi/N}; components may be None (zero).
    Trivial angles (0, ±1, ±i) reduce to moves/negations at trace time."""
    re, im = z
    ang = 2.0 * np.pi * (j % N) / N
    c, s = float(np.cos(ang)), float(np.sin(ang))
    if abs(c - round(c)) < 1e-12:
        c = float(round(c))
    if abs(s - round(s)) < 1e-12:
        s = float(round(s))
    # (re + i·im)(c - i·s) = (re·c + im·s) + i(im·c - re·s)
    return (
        _n_add(_n_scale(re, c), _n_scale(im, s)),
        _n_sub(_n_scale(im, c), _n_scale(re, s)),
    )


def _inner_dft16(blocks):
    """Lazy 16-point DFT of 16 real blocks via 4×4 Cooley–Tukey: two
    trivial-weight 4-point stages (pure block adds) + 9 twiddle multiplies
    — ~7× fewer VPU block-ops than the dense 16×16 weight unroll, same math.

    Returns ``inner(r) -> (re, im)`` (components may be None = exact zero).
    Shared stages are cached at trace time, so calling inner(r) lazily from
    the outer-stage loop emits each r's remaining VPU combine BETWEEN the
    previous r's MXU dots and the next — the two units overlap instead of
    the VPU running to completion before the first matmul issues (the
    staged ordering left the MXU idle for the whole inner stage: measured
    26.3 ms melpow at B=1024 vs a ~14.8 ms 3-pass MXU floor).
    ``[inner(r) for r in range(16)]`` reproduces the staged order exactly.
    """
    state: dict = {}

    def dft4_real(x):  # 4 real blocks -> [(re, im)] over r0; W4 = 1,-i,-1,i
        t0, t1 = x[0] + x[2], x[1] + x[3]
        t2, t3 = x[0] - x[2], x[1] - x[3]
        return [(t0 + t1, None), (t2, -t3), (t0 - t1, None), (t2, t3)]

    def G():
        # stage 1: G[n0][r0] = Σ_{n1'} blocks[4·n1'+n0]·W4^{n1' r0}
        if "G" not in state:
            state["G"] = [
                dft4_real([blocks[4 * k + n0] for k in range(4)]) for n0 in range(4)
            ]
        return state["G"]

    def UV(r0):
        # twiddle T[n0] = G[n0][r0]·W16^{n0 r0}, then the shared stage-2
        # half-butterflies for this r0 (u* feed r1 ∈ {0,2}, v* feed {1,3})
        key = ("UV", r0)
        if key not in state:
            g = G()
            z = [_cmul_w(g[n0][r0], n0 * r0, 16) for n0 in range(4)]
            u0 = (_n_add(z[0][0], z[2][0]), _n_add(z[0][1], z[2][1]))
            u1 = (_n_add(z[1][0], z[3][0]), _n_add(z[1][1], z[3][1]))
            v0 = (_n_sub(z[0][0], z[2][0]), _n_sub(z[0][1], z[2][1]))
            v1 = (_n_sub(z[1][0], z[3][0]), _n_sub(z[1][1], z[3][1]))
            state[key] = (u0, u1, v0, v1)
        return state[key]

    def inner(r):
        # A[r0 + 4 r1] = Σ_{n0} T[n0][r0]·W4^{n0 r1}
        r0, r1 = r % 4, r // 4
        u0, u1, v0, v1 = UV(r0)
        if r1 == 0:
            return (_n_add(u0[0], u1[0]), _n_add(u0[1], u1[1]))
        if r1 == 2:
            return (_n_sub(u0[0], u1[0]), _n_sub(u0[1], u1[1]))
        # v0 ∓ i·v1: re = v0.re ± v1.im, im = v0.im ∓ v1.re
        if r1 == 1:
            return (_n_add(v0[0], v1[1]), _n_sub(v0[1], v1[0]))
        return (_n_sub(v0[0], v1[1]), _n_add(v0[1], v1[0]))

    return inner


def _inner_dft_generic(blocks, R: int):
    """Direct R-point DFT of R real blocks with literal weights (zero terms
    skipped, ±1 strength-reduced). Used for small R; R=16 has the fast path.
    Same lazy ``inner(r)`` contract as :func:`_inner_dft16` (each r is
    already independent in the direct form)."""

    def inner(r):
        a_re = None
        a_im = None
        for n1 in range(R):
            ang = 2.0 * np.pi * n1 * r / R
            cw, sw = float(np.cos(ang)), float(-np.sin(ang))
            if abs(abs(cw) - 1.0) < 1e-12:
                cw = float(round(cw))
            if abs(abs(sw) - 1.0) < 1e-12:
                sw = float(round(sw))
            if abs(cw) > 1e-12:
                a_re = _n_add(a_re, _n_scale(blocks[n1], cw))
            if abs(sw) > 1e-12:
                a_im = _n_add(a_im, _n_scale(blocks[n1], sw))
        return (a_re, a_im)

    return inner


def _split_bf16(x):
    """x (f32) -> (hi, lo) bf16 pair with hi + lo ≈ x (error ~2^-16 of 2^-8)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _ct_outer_stage(
    inner, chi_ref, clo_ref, shi_ref, slo_ref, fbpair_ref,
    *, exact: bool, n_half: int, interleave: bool = True,
    ablate: frozenset = frozenset(),
):
    """Outer CT stage shared by the stack- and phase-assembled kernels:
    per-r [T,128]x[128,128] MXU matmuls against twiddle-folded bases, power,
    merged-filterbank accumulation. ``inner`` is the lazy inner-stage
    provider ``inner(r) -> (a_re, a_im)`` (components may be None = exact
    zero). ``interleave=True`` (default) pulls each r's inner combine just
    before its dots so the VPU work hides under the MXU pipeline;
    ``False`` reproduces the legacy staged order (all VPU, then all MXU)
    for A/B measurement. ``ablate`` (PROFILING ONLY — wrong output) drops
    one op class while keeping the rest: 'splits' (lo = hi, no split
    subtract/convert), 'dots' (1 MXU pass per logical matmul instead of 3),
    'power' (skip the squares), 'fb' (skip the filterbank accumulation).

    ``fbpair_ref`` is the merged filterbank's (hi | lo) halves packed along
    LANES ([·, 2·n_mels]): the C/S passes are full 128-lane tiles, but a
    bare [128, n_mels=64] filterbank RHS pads to a full tile and wastes
    half the MXU array per pass. One full-width dot against hi|lo computes
    the p_hi·fb_hi and p_hi·fb_lo terms together — the exact fb goes from
    3 half-width (= 3 padded-tile) passes to 1 full + 1 half, bitwise
    identical (each output column is an independent f32 accumulation, and
    the final adds keep dot3h's left-assoc order)."""
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)  # noqa: E731

    if "splits" in ablate:
        def split(x):
            # lo must stay a DISTINCT value (one cheap negation) so Mosaic
            # cannot CSE the hi/lo dot passes into one matmul — the ablation
            # should remove only the split arithmetic, not an MXU pass.
            h = x.astype(jnp.bfloat16)
            return h, -h
    else:
        split = _split_bf16

    if "dots" in ablate:
        def dot3h(a_split, b_hi, b_lo):
            return d(a_split[0], b_hi)
    else:
        def dot3h(a_split, b_hi, b_lo):
            """~f32-accurate matmul as THREE native bf16 MXU passes (hi·hi +
            hi·lo + lo·hi, f32 accumulation; the dropped lo·lo term is
            ~2^-32 relative). Mosaic lowers only DEFAULT/HIGHEST dot
            precisions; HIGHEST is a 6-pass f32 emulation, so the manual
            split halves exact-mode MXU time — measured ~6e-6 max relative
            error vs the XLA HIGHEST oracle on the mel power (≈3e-5 dB).
            RHS tables arrive pre-split from the host."""
            a_hi, a_lo = a_split
            return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)

    if not interleave:
        staged = [inner(r) for r in range(n_half)]
        inner = lambda r: staged[r]  # noqa: E731

    n_mels = fbpair_ref.shape[1] // 2
    acc = None
    for r in range(n_half):
        a_re, a_im = inner(r)  # a_re is never None for real input
        sl = slice(r * 128, (r + 1) * 128)
        if exact:
            ar = split(a_re)
            # x = a @ (C - iS): re = a_re@C + a_im@S, im = a_im@C - a_re@S
            x_re = dot3h(ar, chi_ref[sl, :], clo_ref[sl, :])
            x_im = -dot3h(ar, shi_ref[sl, :], slo_ref[sl, :])
            if a_im is not None:
                ai = split(a_im)
                x_re = x_re + dot3h(ai, shi_ref[sl, :], slo_ref[sl, :])
                x_im = x_im + dot3h(ai, chi_ref[sl, :], clo_ref[sl, :])
            if "power" in ablate:
                # x_im must stay LIVE (one cheap add) or Mosaic dead-code
                # eliminates its S-dots too and the "power" delta silently
                # includes whole MXU passes (caught in the r4 first run:
                # p = x_re measured a 5.6 ms "power" cost that was really
                # the eliminated imaginary-part dots)
                p = x_re + x_im
            else:
                p = x_re * x_re + x_im * x_im  # [T,128] power at k = q*R + r
            if "fb" in ablate:
                contrib = p[:, :n_mels]
            elif "dots" in ablate:
                contrib = d(split(p)[0], fbpair_ref[sl, :n_mels])
            else:
                p_hi, p_lo = split(p)
                # one full-width pass covers both p_hi terms; the adds keep
                # dot3h's ((hi·hi + hi·lo) + lo·hi) order -> bitwise equal
                full = d(p_hi, fbpair_ref[sl, :])
                contrib = (full[:, :n_mels] + full[:, n_mels:]) + d(
                    p_lo, fbpair_ref[sl, :n_mels]
                )
        else:
            ar = a_re.astype(jnp.bfloat16)
            x_re = d(ar, chi_ref[sl, :])
            x_im = -d(ar, shi_ref[sl, :])
            if a_im is not None:
                ai = a_im.astype(jnp.bfloat16)
                x_re = x_re + d(ai, shi_ref[sl, :])
                x_im = x_im + d(ai, chi_ref[sl, :])
            if "power" in ablate:
                p = x_re + x_im  # keep x_im live (see exact branch)
            else:
                p = x_re * x_re + x_im * x_im
            if "fb" in ablate:
                contrib = p[:, :n_mels]
            else:
                contrib = d(p.astype(jnp.bfloat16), fbpair_ref[sl, :n_mels])
        acc = contrib if acc is None else acc + contrib
    return acc


def _ct_outer_stage_fused(
    inner, rhs_real_ref, rhs_cplx_ref, fbcat_ref, *, exact: bool, n_half: int
):
    """Concatenated-operand outer stage (fused_dots=True; tables from
    _ct_tables_folded_cat): ONE wide matmul per r with the 3-pass split
    structure and the x_im negation pre-folded into the RHS — same MACs,
    ~6× fewer MXU ops issued and, more importantly here, the dot3h VPU
    add-chains (2 adds per logical matmul) replaced by lane-concats.
    ``inner`` is the lazy inner(r) provider."""
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)  # noqa: E731
    idx_real = idx_cplx = 0
    acc = None
    for r in range(n_half):
        a_re, a_im = inner(r)
        if exact:
            ar_hi, ar_lo = _split_bf16(a_re)
            if a_im is None:
                Lh = jnp.concatenate([ar_hi, ar_hi, ar_lo], axis=1)
                sl = slice(idx_real * 384, (idx_real + 1) * 384)
                x = d(Lh, rhs_real_ref[sl, :])
                idx_real += 1
            else:
                ai_hi, ai_lo = _split_bf16(a_im)
                Lh = jnp.concatenate(
                    [ar_hi, ar_hi, ar_lo, ai_hi, ai_hi, ai_lo], axis=1
                )
                sl = slice(idx_cplx * 768, (idx_cplx + 1) * 768)
                x = d(Lh, rhs_cplx_ref[sl, :])
                idx_cplx += 1
        else:
            ar = a_re.astype(jnp.bfloat16)
            if a_im is None:
                sl = slice(idx_real * 128, (idx_real + 1) * 128)
                x = d(ar, rhs_real_ref[sl, :])
                idx_real += 1
            else:
                L = jnp.concatenate([ar, a_im.astype(jnp.bfloat16)], axis=1)
                sl = slice(idx_cplx * 256, (idx_cplx + 1) * 256)
                x = d(L, rhs_cplx_ref[sl, :])
                idx_cplx += 1
        x_re, x_im = x[:, :128], x[:, 128:]
        p = x_re * x_re + x_im * x_im
        if exact:
            p_hi, p_lo = _split_bf16(p)
            Lp = jnp.concatenate([p_hi, p_hi, p_lo], axis=1)
            contrib = d(Lp, fbcat_ref[r * 384 : (r + 1) * 384, :])
        else:
            contrib = d(
                p.astype(jnp.bfloat16), fbcat_ref[r * 128 : (r + 1) * 128, :]
            )
        acc = contrib if acc is None else acc + contrib
    return acc


def _mel_power_ctp_kernel(
    *refs,  # W2 hop-row refs [rb,1,*,h128*128], [scale], table refs, out
    n_fft: int,
    exact: bool,
    W2: int,
    h128: int,
    rb: int,
    with_scale: bool,
    interleave: bool = True,
    fused: bool = False,
    batch_rows: bool = False,
    ablate: frozenset = frozenset(),
):
    """Phase-sliced CT mel kernel for hop % 128 == 0 — ZERO frame assembly
    and ZERO host staging. The padded signal is VIEWED (free reshape) as
    hop-rows of TILE_T frames: yv[b, m, t, :] = y[b, ((m*TILE_T + t)*hop)
    : +hop], so frame F's CT block n1 (the [F, n1*128:+128] slice of the
    would-be frame matrix) is, with q = n1 // h128 and j = n1 % h128
    (h128 = hop/128, n1 = q*h128 + j):

        yv[b, m, F + q, j*128 : (j+1)*128]

    i.e. for a whole TILE_T-frame tile a CONTIGUOUS TILE_T-row window of
    the streamed block, shifted down by q <= (R-1)/h128 sublanes and
    lane-offset by j*128. Both are static VALUE slices — the sub-8-sublane
    shift is legal (and exact) on real Mosaic; it is ref slices that must
    be 8-aligned (verified on-chip vs numpy before adoption). This replaces
    the stack kernel's per-frame single-sublane copies, which run at ~1/8
    VPU efficiency and dominated the kernel (~24 of 27 ms at B=1024).
    No frames scratch, no host pre-transpose pass.

    Everything downstream (window, radix-4x4 inner stage, twiddle-folded
    outer MXU stage, merged filterbank) is identical to the stack kernel —
    see _mel_power_ct_kernel and _ct_tables_folded.
    """
    def _make_inner(blocks, R):
        if "inner" in ablate:
            # PROFILING ONLY (wrong output): drop every inner-stage VPU
            # combine while keeping the exact downstream matmul structure —
            # the same (a_re, a_im)-None pattern per r, distinct operands
            # per r so Mosaic cannot CSE the dots away.
            def inner(r, _blocks=blocks, _R=R):
                a_im = None if (r == 0 or 2 * r == _R) else _blocks[(r + 1) % _R]
                return (_blocks[r], a_im)

            return inner
        return _inner_dft16(blocks) if R == 16 else _inner_dft_generic(blocks, R)

    y_refs = refs[:W2]
    base = W2
    if with_scale:
        # SMEM [B_pad, 1] (FULL array: Mosaic rejects partial sub-(8,128)
        # blocks even in SMEM) — rows picked via program_id below
        scale_ref = refs[base]
        base += 1
    if fused:
        win_ref, rhs_real_ref, rhs_cplx_ref, fbcat_ref = refs[base : base + 4]
        out_ref = refs[base + 4]
        K1 = 3 * 128 if exact else 128
        n_half_f = fbcat_ref.shape[0] // K1
    else:
        win_ref, chi_ref, clo_ref, shi_ref, slo_ref, fbpair_ref = refs[
            base : base + 6
        ]
        out_ref = refs[base + 6]
        n_half = chi_ref.shape[0] // 128
    R = n_fft // 128
    qmax = (R - 1) // h128
    qpad = _round_up(qmax, 8) if qmax > 0 else 0

    if batch_rows and rb > 1:
        # Batched-rows variant (r4): ONE inner+outer stage over all rb rows
        # stacked along sublanes — the MXU dots become [rb*TILE_T,128]x
        # [128,128] (rb x fewer weight-tile loads per grid step: at rb=1 the
        # T=128 dots spend ~half their cycles refilling the systolic array)
        # and the inner-stage/window VPU work issues rb x fewer, larger ops.
        # Row-independent math throughout (slices, elementwise combines,
        # row-wise dots), so the output is BITWISE identical to the per-r_i
        # loop below. 2D ops only: a 3D formulation (middle-dim concat +
        # leading-dim flatten) fails real-Mosaic compile (HTTP 500, like
        # r3's fused_dots) — the per-block sublane-axis concat below is the
        # same op class as the head/tail concat the plain path already uses.
        cats = []
        Tt = None
        for r_i in range(rb):
            head = y_refs[0][r_i, 0, :, :]  # [TILE_T, h128*128]
            Tt = head.shape[0]
            if qpad > 0:
                cat = jnp.concatenate([head, y_refs[1][r_i, 0, :, :]], axis=0)
            else:
                cat = head
            if with_scale:
                s = scale_ref[pl.program_id(0) * rb + r_i, 0]
                cat = jnp.where(s > 0, jnp.clip(cat * s, -1.0, 1.0), cat)
            cats.append(cat)

        def _blockb(n1):
            q = 0 if "shifts" in ablate else (n1 // h128)
            j = (n1 % h128) * 128
            vs = [c[q : q + Tt, j : j + 128] for c in cats]
            v = jnp.concatenate(vs, axis=0)  # [rb*TILE_T, 128]
            if "window" not in ablate:
                v = v * win_ref[0, n1 * 128 : (n1 + 1) * 128][None, :]
            return v

        blocks = [_blockb(n1) for n1 in range(R)]
        inner = _make_inner(blocks, R)
        if fused:
            acc = _ct_outer_stage_fused(
                inner, rhs_real_ref, rhs_cplx_ref, fbcat_ref,
                exact=exact, n_half=n_half_f,
            )
        else:
            acc = _ct_outer_stage(
                inner, chi_ref, clo_ref, shi_ref, slo_ref, fbpair_ref,
                exact=exact, n_half=n_half, interleave=interleave,
                ablate=ablate,
            )
        # per-row slice writes (the stack kernel's proven pattern; a 3D
        # reshape write is another real-Mosaic lowering risk)
        for r_i in range(rb):
            out_ref[r_i, :, :] = acc[r_i * Tt : (r_i + 1) * Tt, :]
        return

    for r_i in range(rb):
        head = y_refs[0][r_i, 0, :, :]  # [TILE_T, h128*128]
        if qpad > 0:
            # tail ref streams only the qpad rows actually read (block dim
            # 2 sized qpad with index 0 = rows [0, qpad) of tile tt+1) —
            # read amplification 1 + qpad/TILE_T instead of 2
            tail = y_refs[1][r_i, 0, :, :]
            cat = jnp.concatenate([head, tail], axis=0)
        else:
            cat = head
        if with_scale:
            # fused RMS normalization, reference order: clip(y*s, -1, 1)
            # BEFORE windowing (ref:00_normalize_dataset_rms.py:29-38) —
            # folding s through the quadratic power would skip the clip.
            # s <= 0 is the silence-gate sentinel: the row passes through
            # raw (no scale, no clip), matching rms_normalize_batch
            s = scale_ref[pl.program_id(0) * rb + r_i, 0]
            cat = jnp.where(s > 0, jnp.clip(cat * s, -1.0, 1.0), cat)
        def _block(n1):
            # 'shifts' (PROFILING ONLY): force the sublane offset to 0 —
            # isolates the cost of the misaligned (non-8-multiple) sublane
            # shifts q = n1 // h128. Blocks stay distinct via the per-n1
            # window slice, so downstream ops cannot CSE.
            q = 0 if "shifts" in ablate else (n1 // h128)
            v = cat[
                q : q + head.shape[0],
                (n1 % h128) * 128 : (n1 % h128 + 1) * 128,
            ]
            if "window" not in ablate:  # 'window' (PROFILING ONLY): skip Hann
                v = v * win_ref[0, n1 * 128 : (n1 + 1) * 128][None, :]
            return v

        blocks = [_block(n1) for n1 in range(R)]
        inner = _make_inner(blocks, R)
        if fused:
            acc = _ct_outer_stage_fused(
                inner, rhs_real_ref, rhs_cplx_ref, fbcat_ref,
                exact=exact, n_half=n_half_f,
            )
        else:
            acc = _ct_outer_stage(
                inner, chi_ref, clo_ref, shi_ref, slo_ref, fbpair_ref,
                exact=exact, n_half=n_half, interleave=interleave,
                ablate=ablate,
            )
        out_ref[r_i, :, :] = acc


def _mel_power_ct_kernel(
    *refs,  # k·W row refs [1,1,1,8,s2], 7 table refs, out [1,TILE_T,n_mels], frames scratch
    hop: int,
    n_fft: int,
    exact: bool,
    W: int,
    k_copies: int,
    tile_t: int,
    rb: int,
    fused: bool,
    interleave: bool = True,
):
    """Whole-spectrum mel power for one (batch row, frame tile), DFT done as
    a radix-(R=n_fft/128, 128) Cooley–Tukey factorization entirely in VMEM:

    - input: the padded signal is reshaped (free, same layout) into
      [B, k, n_rows, stride] stride-rows, and passed k·W times with row
      index maps shifted by 0..W-1 — step (b, tt) sees the W consecutive
      rows [tt, tt+W) covering its TILE_T frames as W single-row blocks
      (BlockSpec indices are in block units, so a single W-row block can't
      express stride-1 overlapping windows — W shifted 1-row views can).
      The k axis holds lane-phase copies: for hop % 128 == 0 it is k = 1
      and the reshape is zero-copy (no host staging at all); for smaller
      hops with hop % 32 == 0 the host stages k = 128/gcd(hop,128) ∈ {2,4}
      copies of the signal shifted by multiples of g = gcd(hop,128), so
      every frame offset j·hop is lane-aligned in copy (j·hop mod 128)/g.
      Pallas's automatic block pipeline prefetches step (b, tt+1)'s rows
      while (b, tt) computes, at ~k·W× read amplification (1·2 default);
    - frames built with static offsets only: each copy's W row blocks are
      flattened and concatenated once (at a 1024-aligned stride boundary),
      then each [8, n_fft] sublane block is a jnp.stack of eight 1-D
      lane-aligned slices of the right phase copy;
    - inner R-point stage: contiguous 128-lane blocks of the frame matrix
      combined in-register — radix-4×4 Cooley–Tukey for R=16 (pure block
      adds + 9 twiddles), literal-weight unroll otherwise; this sidesteps
      the Mosaic sublane-contraction blocker the XLA 'ct' backend hit;
    - outer stage: per-r [T,128]×[128,128] MXU matmuls against bases with
      the inter-stage twiddle PRE-FOLDED in (see _ct_tables_folded) — no
      VPU twiddle multiplies, and exact-zero inner components (a_im ≡ 0 at
      r = 0 and r = R/2) skip their matmuls at trace time;
    - conjugate symmetry: only blocks r ≤ R/2 are computed; the power rows
      of block R−r are column-reversed duplicates, folded into block r's
      merged filterbank — the [T,128]×[128,n_mels] mel accumulation runs
      once per kept block.

    ~(R/2+1)·(4+1)·128³ MXU MACs per tile vs the dense kernel's
    2·T·n_fft·n_freq — ≈13× fewer for n_fft=2048 — with ~1× HBM traffic
    (audio in, mel out).
    """
    y_refs = refs[: k_copies * W]
    base = k_copies * W
    if fused:
        win_ref, rhs_real_ref, rhs_cplx_ref, fbcat_ref = refs[base : base + 4]
        out_ref, frames = refs[base + 4], refs[base + 5]
        K1 = 3 * 128 if exact else 128  # LHS width per real component
        n_half = fbcat_ref.shape[0] // K1
    else:
        win_ref, chi_ref, clo_ref, shi_ref, slo_ref, fbpair_ref = refs[base : base + 6]
        out_ref, frames = refs[base + 6], refs[base + 7]
        n_half = chi_ref.shape[0] // 128
    R = n_fft // 128
    # each row ref is [rb, 1, 1, 8, S2] (stride = 8*S2; 5-D so the block's
    # last two dims are full — a Mosaic block-shape requirement; axis 1 is
    # the lane-phase copy index, axis 0 the row-block of batch rows)
    s2 = y_refs[0].shape[4]
    stride = 8 * s2
    g = 128 // k_copies  # lane-phase granule = gcd(hop, 128)

    # Flatten each copy's W [8, s2] stride-rows into one [W*stride] window
    # per grid step. The per-ref reshape and the single concatenation (at
    # stride boundaries — always lane-aligned since stride = tile_t*hop
    # with hop % 32 == 0) are Mosaic-legal; per-frame multi-piece
    # concatenation across sublane rows is not ("input offsets outside the
    # first tile"). Every frame window is then a pure 1-D lane-aligned
    # slice of its phase copy: copy s is the signal shifted by s·g, so
    # frame j (offset j·hop) reads copy (j·hop mod 128)/g at the aligned
    # offset ⌊j·hop/128⌋·128.
    for r_i in range(rb):
        exts = []
        for s in range(k_copies):
            flats = [
                jnp.reshape(y_refs[s * W + i][r_i, 0, 0, :, :], (stride,))
                for i in range(W)
            ]
            exts.append(flats[0] if W == 1 else jnp.concatenate(flats, axis=0))

        def frame_row(j: int):
            o = j * hop
            s_j = (o % 128) // g
            a_j = (o // 128) * 128
            return jax.lax.slice_in_dim(exts[s_j], a_j, a_j + n_fft)

        o_r = r_i * tile_t
        for i8 in range(tile_t // 8):
            frames[o_r + i8 * 8 : o_r + (i8 + 1) * 8, :] = jnp.stack(
                [frame_row(i8 * 8 + k) for k in range(8)], axis=0
            )

    f = frames[:, :] * win_ref[0, :][None, :]  # Hann
    blocks = [f[:, n1 * 128 : (n1 + 1) * 128] for n1 in range(R)]
    inner = _inner_dft16(blocks) if R == 16 else _inner_dft_generic(blocks, R)

    if fused:
        acc = _ct_outer_stage_fused(
            inner, rhs_real_ref, rhs_cplx_ref, fbcat_ref,
            exact=exact, n_half=n_half,
        )
        if rb == 1:
            out_ref[0, :, :] = acc
        else:
            for r_i in range(rb):
                out_ref[r_i, :, :] = acc[r_i * tile_t : (r_i + 1) * tile_t, :]
        return

    acc = _ct_outer_stage(
        inner, chi_ref, clo_ref, shi_ref, slo_ref, fbpair_ref,
        exact=exact, n_half=n_half, interleave=interleave,
    )
    if rb == 1:
        out_ref[0, :, :] = acc
    else:
        for r_i in range(rb):
            out_ref[r_i, :, :] = acc[r_i * tile_t : (r_i + 1) * tile_t, :]


def phase_padded_layout(cfg: MelConfig, num_frames: int) -> tuple[int, int]:
    """(L_pad, pad_l) of the zero-copy phase-kernel signal layout for
    ``hop % 128 == 0`` configs: a pre-padded row is ``L_pad`` samples with
    the signal starting at ``pad_l`` (= n_fft//2, librosa center=True) and
    zeros elsewhere. Host loaders that decode into this layout let
    ``mel_power_pallas(..., pre_padded=True)`` skip the device-side
    ``jnp.pad`` — at B=1024/5 s/48 kHz that pad is ~2.2 GB of HBM traffic
    (~2.7 ms/batch), while placing the decoded samples at a row offset is
    free for the host (it memcpys into a preallocated row either way)."""
    hop, n_fft = cfg.hop_length, cfg.n_fft
    if hop % 128 != 0:
        raise NotImplementedError(
            f"pre-padded layout is defined for the phase kernel "
            f"(hop % 128 == 0), got hop={hop}"
        )
    h128 = hop // 128
    R = n_fft // 128
    qmax = (R - 1) // h128
    W2 = 1 + (TILE_T - 1 + qmax) // TILE_T
    n_t_tiles = -(-num_frames // TILE_T)
    n_mrows = n_t_tiles - 1 + W2
    return n_mrows * TILE_T * hop, n_fft // 2


def pallas_supported(cfg: MelConfig, algorithm: str = "auto") -> bool:
    """Whether mel_power_pallas can handle this config (the frontend's
    fallback gate). ct: n_fft a >=2 multiple of 128 and hop % 32 == 0
    (lane-phase copies); dense: hop % 16 == 0 (8·hop lane-aligned window
    slices). Covers the librosa-common hop family 128/160/256/320/384/512;
    prime-ish hops (441) fall back to the XLA matmul path."""
    hop, n_fft = cfg.hop_length, cfg.n_fft
    ct_ok = n_fft % 128 == 0 and n_fft >= 256 and hop % 32 == 0
    dense_ok = (8 * hop) % 128 == 0
    if algorithm == "ct":
        return ct_ok
    if algorithm == "dense":
        return dense_ok
    return ct_ok or dense_ok


def mel_power_pallas(
    y: jax.Array,
    cfg: MelConfig,
    *,
    num_frames: int,
    interpret: bool = False,
    exact: bool = True,
    algorithm: str = "auto",
    tile_t: int | None = None,
    row_block: int | None = None,
    fused_dots: bool | None = None,
    assembly: str = "auto",
    rms_scale: jax.Array | None = None,
    interleave: bool = True,
    pre_padded: bool = False,
    batch_rows: bool | None = None,
    ablate: tuple = (),
) -> jax.Array:
    """[B, num_samples] -> mel power [B, num_frames, n_mels], fused on TPU.

    Matches ops.stft.stft_power(center=True, backend='matmul') composed with
    the mel matmul, to f32 accumulation tolerance when ``exact`` (true-f32
    MXU passes). ``exact=False`` uses the MXU's native bf16 passes — faster,
    |err| ~6e-2 in standardized-dB units, fine for detection but not for
    librosa bit-parity.

    ``algorithm``: "ct" (in-VMEM Cooley–Tukey, ~7× fewer MXU MACs — the
    default whenever n_fft is a ≥2 multiple of 128), "dense" (windowed-DFT
    bases, the reference-grade fallback), or "auto".

    ``rms_scale`` ([B], see frontend.rms_scale_batch): fused RMS
    normalization — rows with s > 0 are clip(y*s, -1, 1)'d before
    windowing, s <= 0 rows pass through raw (the silence gate). On the
    phase kernel this happens in the VMEM tile; other paths apply it
    inline before framing.

    ``pre_padded``: y is already in the phase-kernel layout (see
    :func:`phase_padded_layout`) — the device-side ``jnp.pad`` is skipped
    entirely. Phase kernel only (hop % 128 == 0, default assembly/tiling).

    ``batch_rows`` (phase kernel only): run ONE inner+outer stage per grid
    step over all ``row_block`` rows stacked along sublanes ([rb*128, 128]
    MXU dots instead of rb separate [128, 128] ones — rb x fewer weight-tile
    loads and rb x fewer VPU op issues, bitwise-identical output). None =
    auto (resolved from the on-chip A/B, docs/KERNELS.md).

    ``ablate`` (PROFILING ONLY — produces WRONG output): drop one or more
    in-kernel op classes while keeping the rest, for the on-chip op-class
    cost study (scripts/probe_kernel_ablation.py). Classes: 'splits'
    (lo = hi), 'dots' (1 MXU pass per logical matmul), 'power', 'fb',
    'inner' (trivial inner-stage provider), 'window'. Phase kernel only.
    """
    import math as _math

    B, L = y.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    # ONE support gate (pallas_supported) for this raise and log_mel_batch's
    # fallback decision — they must never disagree
    ct_ok = pallas_supported(cfg, "ct")
    dense_ok = pallas_supported(cfg, "dense")
    if algorithm == "auto":
        if ct_ok:
            algorithm = "ct"
        elif dense_ok:
            algorithm = "dense"
        else:
            raise NotImplementedError(
                f"pallas backend needs hop_length % 32 == 0 (ct, lane-phase "
                f"copies) or % 16 == 0 (dense); got hop={hop}. Use "
                "backend='matmul'."
            )
    if algorithm == "ct" and not ct_ok:
        raise NotImplementedError(
            f"ct kernel needs n_fft a >=2 multiple of 128 and hop % 32 == 0, "
            f"got n_fft={n_fft}, hop={hop}"
        )
    if algorithm == "dense" and not dense_ok:
        raise NotImplementedError(f"dense kernel needs hop % 16 == 0, got {hop}")

    if assembly not in ("auto", "phase", "stack"):
        raise ValueError(f"assembly must be auto/phase/stack, got {assembly}")
    use_phase = algorithm == "ct" and (
        assembly == "phase"
        or (
            assembly == "auto"
            and hop % 128 == 0
            and tile_t in (None, TILE_T)
            # fused_dots on the PHASE kernel fails real-Mosaic compile
            # (HTTP 500 in the remote compiler; interpret mode is fine) —
            # measured r3, see docs/KERNELS.md. auto routes fused sweeps to
            # the stack kernel; explicit assembly='phase' still attempts it.
            and not fused_dots
        )
    )
    if ablate and not use_phase:
        raise ValueError(
            "ablate (profiling only) is wired only into the phase kernel"
        )
    if ablate and fused_dots:
        raise ValueError(
            "ablate is not wired into the fused-dots outer stage — drop "
            "fused_dots for profiling runs"
        )
    if ablate and not exact:
        bad = sorted(set(ablate) & {"splits", "dots"})
        if bad:
            raise ValueError(
                f"ablate classes {bad} only exist in the exact (3-pass "
                "bf16-split) outer stage; the bf16 kernel has no split/"
                "multi-pass arithmetic to remove"
            )
    if batch_rows and not use_phase:
        raise ValueError("batch_rows is wired only into the phase kernel")
    if pre_padded and not use_phase:
        raise ValueError(
            "pre_padded=True requires the phase kernel (hop % 128 == 0, "
            "default assembly/tiling) — slice the valid region out for "
            "other paths (log_mel_batch does this on fallback)"
        )
    if rms_scale is not None and not use_phase:
        # the fused-scale contract is wired only into the phase kernel; the
        # stack/dense paths apply the identical math up front (same where/
        # clip order as rms_normalize_batch; s <= 0 = silence sentinel)
        s = rms_scale[:, None]
        y = jnp.where(s > 0, jnp.clip(y * s, -1.0, 1.0), y)

    if use_phase:
        # phase-transposed zero-assembly variant (see _mel_power_ctp_kernel):
        # default whenever hop % 128 == 0 — the stack path's in-kernel frame
        # stacks were the kernel's dominant cost (single-sublane VPU copies)
        if hop % 128 != 0:
            raise NotImplementedError(
                f"assembly='phase' needs hop % 128 == 0, got hop={hop}"
            )
        if tile_t not in (None, TILE_T):
            raise ValueError(
                "assembly='phase' supports only tile_t=128 "
                "(pass assembly='stack' to sweep tile sizes)"
            )
        h128 = hop // 128
        R = n_fft // 128
        if batch_rows is None:
            # r4 on-chip A/B (scripts/probe_batch_rows.py, pre-padded fused-
            # RMS, B=1024): batched rb=4 21.12 ms vs plain rb=8 22.82
            # (1.08x, bitwise identical on real Mosaic); batched rb=8 fails
            # compile (VMEM: the stacked blocks + shared inner-DFT stage at
            # T=1024 exceed the ~16 MB core budget). Auto batches whenever
            # the resolved rb stays within the compile-proven range.
            batch_rows = (row_block is None and B > 1) or (
                row_block is not None and 1 < row_block <= 4
            )
        if row_block is None:
            # adaptive so tiny/odd batches don't pay padding for the default:
            # batched prefers rb=4 (the r4 operating point); the plain
            # fallback keeps the r3 sweep's rb=8 (22.84 / rb=4 22.93 /
            # rb=2 25.33 ms per 1024-batch, bitwise-identical output)
            cands = (4, 2) if batch_rows else (8, 4, 2)
            rb = next((r for r in cands if B % r == 0), 1)
        else:
            rb = row_block
        if rb == 1:
            batch_rows = False
        qmax = (R - 1) // h128
        W2 = 1 + (TILE_T - 1 + qmax) // TILE_T  # phase row-blocks per tile
        n_t_tiles = -(-num_frames // TILE_T)
        t_pad = n_t_tiles * TILE_T
        n_mrows = n_t_tiles - 1 + W2
        # the ONE layout formula — host decoders build rows from
        # phase_padded_layout, so the kernel must derive L_pad identically
        L_pad, pad_l = phase_padded_layout(cfg, num_frames)
        assert L_pad == n_mrows * TILE_T * hop
        if pre_padded:
            if L != L_pad:
                raise ValueError(
                    f"pre_padded input must be the phase_padded_layout "
                    f"length {L_pad} for num_frames={num_frames}, got {L}"
                )
        else:
            pad_r = L_pad - (L + pad_l)
            if pad_r < 0:  # fast-frontend crops the frame range: drop unread tail
                y = y[:, : L_pad - pad_l]
                pad_r = 0
        B_pad = -(-B // rb) * rb
        if B_pad != B:
            y = jnp.pad(y, ((0, B_pad - B), (0, 0)))
            if rms_scale is not None:
                rms_scale = jnp.pad(rms_scale, ((0, B_pad - B),))
        y_pad = y if pre_padded else jnp.pad(y, ((0, 0), (pad_l, pad_r)))
        # zero-copy view: hop-rows of TILE_T frames — the pad above is the
        # ONLY host-side data movement (signal-sized; ~0.4% of the frames
        # matrix the XLA path materializes)
        yv = y_pad.reshape(B_pad, n_mrows, TILE_T, h128 * 128)
        fused = bool(fused_dots)
        if fused:
            win, rhs_real, rhs_cplx, fbcat = _ct_tables_folded_cat(
                cfg.sr, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, exact
            )
            table_args = [
                jnp.asarray(win), jnp.asarray(rhs_real),
                jnp.asarray(rhs_cplx), jnp.asarray(fbcat),
            ]
        else:
            (chi, clo), (shi, slo), fbpair, win = _ct_tables_folded(
                cfg.sr, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
            )
            table_args = [
                jnp.asarray(win), jnp.asarray(chi), jnp.asarray(clo),
                jnp.asarray(shi), jnp.asarray(slo), jnp.asarray(fbpair),
            ]
        n_half = R // 2 + 1
        assert W2 <= 2, f"phase kernel assumes qmax < TILE_T, got qmax={qmax}"
        qpad = _round_up(qmax, 8) if qmax > 0 else 0
        kernel = functools.partial(
            _mel_power_ctp_kernel, n_fft=n_fft, exact=exact, W2=W2,
            h128=h128, rb=rb, with_scale=rms_scale is not None,
            interleave=interleave, fused=fused, batch_rows=bool(batch_rows),
            ablate=frozenset(ablate),
        )
        base_spec = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda b, tt: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        # head: the tile's own TILE_T hop-rows; tail: only the qpad rows of
        # tile tt+1 actually read by the q-shift (block dim 2 sized qpad,
        # index 0) — read amplification 1 + qpad/TILE_T instead of 2
        head_spec = pl.BlockSpec(
            (rb, 1, TILE_T, h128 * 128),
            lambda b, tt: (b, tt, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tail_spec = pl.BlockSpec(
            (rb, 1, qpad, h128 * 128),
            lambda b, tt: (b, tt + 1, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [head_spec] + ([tail_spec] if W2 == 2 else [])
        operands = [yv] * W2
        if rms_scale is not None:
            in_specs.append(
                pl.BlockSpec(
                    (B_pad, 1), lambda b, tt: (0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
            operands.append(rms_scale[:, None].astype(jnp.float32))
        out = pl.pallas_call(
            kernel,
            grid=(B_pad // rb, n_t_tiles),
            in_specs=in_specs
            + [base_spec(tuple(a.shape)) for a in table_args],
            out_specs=pl.BlockSpec(
                (rb, TILE_T, cfg.n_mels),
                lambda b, tt: (b, tt, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (B_pad, t_pad, cfg.n_mels), jnp.float32
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * B_pad * t_pad
                * (n_half * 5 * 128 * 128 + n_half * 128 * cfg.n_mels)
                + 2 * B_pad * t_pad * n_fft * R,
                bytes_accessed=B_pad * n_t_tiles * (TILE_T + qpad)
                * h128 * 128 * 4
                + B_pad * t_pad * cfg.n_mels * 4,
                transcendentals=0,
            ),
        )(*operands, *table_args)
        return out[:B, :num_frames, :]

    if algorithm == "ct":
        # per-step amortization knobs (bench_kernel_variants sweeps these):
        # tile_t frames per grid step (must be a multiple of 8; bigger tiles
        # amortize per-step fixed costs against padding waste), row_block
        # batch rows per grid step (pure amortization, no padding cost).
        # Mosaic-legality constraint (measured on-chip r4, hop=160): the
        # kernel's [8, s2] -> [stride] row flatten is a supported shape cast
        # only when each sublane row is a whole number of 1-D (8,128) tiles,
        # i.e. s2 = tile_t*hop/8 must be a multiple of 1024 — so
        # tile_t*hop % 8192 == 0. hop is a multiple of 32, so the minimal
        # legal tile is the power of two t0 = 8192/gcd(hop, 8192) <= 256
        # (128 for the default hop 384; 256 for e.g. hop 160/96).
        t0 = 8192 // _math.gcd(hop, 8192)
        if tile_t is None:
            tile_t = max(TILE_T, t0)
        elif tile_t % t0 != 0:
            raise ValueError(
                f"tile_t={tile_t} is Mosaic-illegal for hop={hop}: "
                f"tile_t*hop must be a multiple of 8192 (min tile {t0})"
            )
        if row_block is None:
            # r3 sweep (scripts/bench_kernel_variants.py on v5e): rb=4 is the
            # winner at 31.8k chunks/s frontend-exact vs 29.8k at rb=1 (rb=8
            # fails Mosaic compile; bigger tile_t LOSES — 320 gives 23.6k).
            # Adaptive so tiny/odd batches don't pay padding for the default.
            # rb*tile_t > 512 also fails remote compile (measured r4 at
            # tile_t=256/rb=4), so bigger tiles cap the row block.
            rb_cap = max(1, 512 // tile_t)
            rb = next(r for r in (4, 2, 1) if r <= rb_cap and B % r == 0)
        else:
            rb = row_block
        # measured negative (same sweep): concatenating the 3-pass split
        # operands into one wide matmul per r is ~4% SLOWER in exact mode
        # (30.5k vs 31.8k) — the kernel is not matmul-issue-bound; the
        # lane-concats cost more VPU than the batched issue saves.
        fused = False if fused_dots is None else fused_dots
        if tile_t % 8 != 0:
            raise ValueError(f"tile_t must be a multiple of 8, got {tile_t}")
        n_t_tiles = -(-num_frames // tile_t)
        t_pad = n_t_tiles * tile_t
        # The padded signal is reshaped (free, same layout) into stride-rows
        # of TILE_T·hop samples, and each grid step's BlockSpec window is
        # the W consecutive rows covering its frames (tile tt starts exactly
        # at row tt). Pallas streams the blocks through VMEM automatically.
        # hop % 128 == 0: zero-copy, no host staging at all. Smaller
        # hop % 32 == 0: k = 128/gcd(hop,128) lane-phase copies of the
        # signal (shifted by multiples of g = gcd) are staged host-side so
        # every frame offset is lane-aligned in one of them (k× HBM for
        # non-default hops; the default 384 stays k = 1).
        g = _math.gcd(hop, 128)
        k_copies = 128 // g
        pad_l = n_fft // 2
        stride = tile_t * hop  # multiple of 128: hop % 32 == 0, tile_t % 8 == 0
        if stride % 128 != 0:
            raise ValueError(f"tile_t*hop must be a multiple of 128, got {stride}")
        tile_w = (tile_t - 1) * hop + n_fft
        W = -(-tile_w // stride)  # rows per block window (2 for defaults)
        n_rows = n_t_tiles - 1 + W
        base_len = n_rows * stride
        shift_max = (k_copies - 1) * g
        pad_r = base_len + shift_max - (L + pad_l)
        if pad_r < 0:
            # num_frames covers fewer samples than the signal holds (the
            # fast-frontend path crops the frame range): drop the tail the
            # kernel will never read instead of under-padding
            y = y[:, : base_len + shift_max - pad_l]
            pad_r = 0
        # pad the batch to a row-block multiple (grid rows cover rb rows each)
        B_pad = -(-B // rb) * rb
        if B_pad != B:
            y = jnp.pad(y, ((0, B_pad - B), (0, 0)))
        # 5-D row layout [B, k, n_rows, 8, stride//8]: Mosaic requires a
        # block's last two dims divisible by (8, 128) or full — the rows
        # axis can then be windowed one row at a time per phase copy
        s2 = stride // 8  # multiple of 128 since hop % 32 == 0 (s2 = 2·tile_t/16·hop)
        y_pad = jnp.pad(y, ((0, 0), (pad_l, pad_r)))
        if k_copies == 1:
            y_rows = y_pad.reshape(B_pad, 1, n_rows, 8, s2)
        else:
            y_rows = jnp.stack(
                [
                    jax.lax.slice_in_dim(y_pad, s * g, s * g + base_len, axis=1)
                    for s in range(k_copies)
                ],
                axis=1,
            ).reshape(B_pad, k_copies, n_rows, 8, s2)

        R = n_fft // 128
        n_half = R // 2 + 1
        if fused:
            win, rhs_real, rhs_cplx, fbcat = _ct_tables_folded_cat(
                cfg.sr, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, exact
            )
            table_args = [
                jnp.asarray(win), jnp.asarray(rhs_real), jnp.asarray(rhs_cplx),
                jnp.asarray(fbcat),
            ]
        else:
            (chi, clo), (shi, slo), fbpair, win = _ct_tables_folded(
                cfg.sr, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
            )
            table_args = [
                jnp.asarray(win), jnp.asarray(chi), jnp.asarray(clo),
                jnp.asarray(shi), jnp.asarray(slo), jnp.asarray(fbpair),
            ]
        kernel = functools.partial(
            _mel_power_ct_kernel, hop=hop, n_fft=n_fft, exact=exact, W=W,
            k_copies=k_copies, tile_t=tile_t, rb=rb, fused=fused,
            interleave=interleave,
        )
        base_spec = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda b, tt: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        row_spec = lambda s, i: pl.BlockSpec(  # noqa: E731
            (rb, 1, 1, 8, s2), lambda b, tt, s=s, i=i: (b, s, tt + i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B_pad // rb, n_t_tiles),
            in_specs=[row_spec(s, i) for s in range(k_copies) for i in range(W)]
            + [base_spec(tuple(a.shape)) for a in table_args],
            out_specs=pl.BlockSpec(
                (rb, tile_t, cfg.n_mels), lambda b, tt: (b, tt, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B_pad, t_pad, cfg.n_mels), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((rb * tile_t, n_fft), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * B_pad * t_pad * (n_half * 5 * 128 * 128 + n_half * 128 * cfg.n_mels)
                + 2 * B_pad * t_pad * n_fft * R,
                bytes_accessed=B_pad * n_t_tiles * k_copies * W * stride * 4
                + B_pad * t_pad * cfg.n_mels * 4,
                transcendentals=0,
            ),
        )(*([y_rows] * (k_copies * W)), *table_args)
        return out[:B, :num_frames, :]

    # dense kernel: 8-row hop-shifted copy + manual DMA (see kernel docstring).
    # ~8x the signal in HBM — bound it by processing the batch in lax.map
    # chunks (the kernel compiles once; the scan re-runs it).
    n_t_tiles = -(-num_frames // TILE_T)
    t_pad = n_t_tiles * TILE_T
    # shifted-window row length: covers frames 0..TILE_T-8 of a tile plus n_fft
    win_cols = _round_up((TILE_T - 8) * hop + n_fft, 128)
    CHUNK_B = 128
    if B > CHUNK_B:
        n_chunks = -(-B // CHUNK_B)
        pad_b = n_chunks * CHUNK_B - B
        y_c = jnp.pad(y, ((0, pad_b), (0, 0))).reshape(n_chunks, CHUNK_B, L)
        out = jax.lax.map(
            lambda yc: mel_power_pallas(
                yc, cfg, num_frames=num_frames, interpret=interpret,
                exact=exact, algorithm=algorithm,
            ),
            y_c,
        )
        return out.reshape(n_chunks * CHUNK_B, num_frames, cfg.n_mels)[:B]

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
