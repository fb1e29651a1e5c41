"""Fused Pallas mel kernel vs the XLA path (interpret mode on CPU; the real
TPU run is covered by bench/verify drives)."""

import numpy as np
import jax.numpy as jnp
import pytest

from anuraxla.constants import MelConfig
from anuraxla.ops.frontend import log_mel_batch
from anuraxla.ops.pallas_frontend import mel_power_pallas
from anuraxla.ops.stft import stft_power
from anuraxla.ops.mel import mel_filterbank

# small config on the kernel's zero-copy fast path (hop % 128 == 0, k = 1)
CFG = MelConfig(sr=16000, duration=0.5, n_mels=32, fmin=100, fmax=7500,
                hop_length=128, n_fft=256, target_frames=48)


@pytest.mark.parametrize("algorithm", ["ct", "dense"])
def test_pallas_mel_power_matches_xla(rng, algorithm):
    y = (0.1 * rng.standard_normal((2, CFG.num_samples))).astype(np.float32)
    T = CFG.total_frames
    got = np.asarray(mel_power_pallas(jnp.asarray(y), CFG, num_frames=T,
                                      interpret=True, algorithm=algorithm))

    P = stft_power(jnp.asarray(y), n_fft=CFG.n_fft, hop_length=CFG.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(CFG.sr, CFG.n_fft, CFG.n_mels, CFG.fmin, CFG.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))

    assert got.shape == ref.shape == (2, T, CFG.n_mels)
    scale = ref.max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


@pytest.mark.parametrize("assembly", ["phase", "stack"])
def test_pallas_ct_radix16_path(rng, assembly):
    """n_fft=2048 exercises the radix-4×4 inner stage (R=16), via both the
    phase-transposed (zero-assembly) and stack frame-assembly variants."""
    cfg = MelConfig(sr=16000, duration=0.6, n_mels=32, fmin=100, fmax=7500,
                    hop_length=256, n_fft=2048, target_frames=16)
    y = (0.1 * rng.standard_normal((2, cfg.num_samples))).astype(np.float32)
    T = cfg.total_frames
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct",
                                      assembly=assembly))
    P = stft_power(jnp.asarray(y), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)


@pytest.mark.parametrize("n_fft", [384, 512, 1024])
def test_pallas_ct_radix_generality(rng, n_fft):
    """Odd (R=3) and power-of-two (R=4, R=8) block counts through the
    generic inner stage + conjugate-symmetry filterbank merge."""
    cfg = MelConfig(sr=16000, duration=0.3, n_mels=32, fmin=100, fmax=7500,
                    hop_length=128, n_fft=n_fft, target_frames=16)
    y = (0.1 * rng.standard_normal((2, cfg.num_samples))).astype(np.float32)
    T = cfg.total_frames
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct"))
    P = stft_power(jnp.asarray(y), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)


@pytest.mark.parametrize("assembly", ["phase", "stack"])
def test_pallas_ct_multi_tile(rng, assembly):
    """More frames than one TILE_T tile: exercises the overlapping
    stride-row block windows (the shifted row index maps) and frames that
    cross a stride-row boundary. Regression for a block-unit-vs-element-unit
    index-map bug that only multi-tile shapes can catch."""
    cfg = MelConfig(sr=48000, duration=2.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=192)
    y = (0.1 * rng.standard_normal((2, cfg.num_samples))).astype(np.float32)
    T = cfg.total_frames
    assert T > 128  # must span >1 frame tile for this test to mean anything
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct",
                                      assembly=assembly))
    P = stft_power(jnp.asarray(y), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)


def test_pallas_phase_assembly_edges(rng):
    """Phase-transposed variant edge cases: odd batch (row-block padding),
    cropped num_frames (fast-frontend), and a deep q-shift (hop = 128 with
    n_fft = 2048 -> h128 = 1, qmax = 15 crossing the 8-sublane pad)."""
    cfg = MelConfig(sr=48000, duration=2.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=192)
    y = (0.1 * rng.standard_normal((5, cfg.num_samples))).astype(np.float32)
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=192,
                                      interpret=True, assembly="phase"))
    ref = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=192,
                                      interpret=True, assembly="stack"))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)

    deep = MelConfig(sr=16000, duration=1.2, n_mels=32, fmin=100, fmax=7500,
                     hop_length=128, n_fft=2048, target_frames=140)
    y2 = (0.1 * rng.standard_normal((2, deep.num_samples))).astype(np.float32)
    T = deep.total_frames
    got2 = np.asarray(mel_power_pallas(jnp.asarray(y2), deep, num_frames=T,
                                       interpret=True, assembly="phase"))
    P = stft_power(jnp.asarray(y2), n_fft=deep.n_fft, hop_length=deep.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(deep.sr, deep.n_fft, deep.n_mels, deep.fmin, deep.fmax))
    ref2 = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    np.testing.assert_allclose(got2 / ref2.max(), ref2 / ref2.max(), atol=2e-5)


def test_pallas_ct_fast_frontend_long_clip(rng):
    """parity=False (fast-frontend) passes a cropped num_frames while the
    signal keeps full length — the CT tiling must drop the unread tail
    instead of under-padding (regression: 'ct tiling underflow' for
    durations ≳5.2 s)."""
    cfg = MelConfig(sr=48000, duration=6.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=192)
    y = (0.1 * rng.standard_normal((1, cfg.num_samples))).astype(np.float32)
    total = cfg.total_frames
    first = max(0, (total - cfg.target_frames) // 2)
    num = first + min(cfg.target_frames, total)
    # the regression precondition: cropped coverage shorter than the signal
    assert num * cfg.hop_length + cfg.n_fft // 2 < cfg.num_samples + cfg.n_fft
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=num,
                                      interpret=True, algorithm="ct"))
    P = stft_power(jnp.asarray(y), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                   num_frames=num, backend="matmul")
    fb = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)


def test_pallas_backend_full_frontend(rng):
    y = (0.1 * rng.standard_normal((1, CFG.num_samples))).astype(np.float32)
    import anuraxla.ops.frontend as fe
    import anuraxla.ops.pallas_frontend as pf

    # route the frontend's pallas backend through interpret mode for CPU
    orig = pf.mel_power_pallas
    try:
        pf.mel_power_pallas = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        got = np.asarray(log_mel_batch(jnp.asarray(y), CFG, backend="pallas"))
    finally:
        pf.mel_power_pallas = orig
    ref = np.asarray(log_mel_batch(jnp.asarray(y), CFG, backend="matmul"))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pallas_bf16_mode_close(rng):
    """exact=False (the pallas-bf16 backend) stays within the documented
    standardized-dB bound; here in interpret mode the dot precision hint is
    advisory, so just pin shape + looser agreement."""
    y = (0.1 * rng.standard_normal((1, CFG.num_samples))).astype(np.float32)
    T = CFG.total_frames
    got = np.asarray(mel_power_pallas(jnp.asarray(y), CFG, num_frames=T,
                                      interpret=True, exact=False))
    P = stft_power(jnp.asarray(y), n_fft=CFG.n_fft, hop_length=CFG.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(CFG.sr, CFG.n_fft, CFG.n_mels, CFG.fmin, CFG.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=1e-2)


@pytest.mark.parametrize("hop", [160, 96, 320, 512])
def test_pallas_ct_lane_phase_hops(rng, hop):
    """hop % 32 == 0 but % 128 != 0 (and the k=1 hop 512/320 family): the
    lane-phase copy staging must reproduce the XLA path exactly (VERDICT r2
    item 7 — the librosa-common hop family 160/320/512 and 96)."""
    cfg = MelConfig(sr=16000, duration=0.6, n_mels=32, fmin=100, fmax=7500,
                    hop_length=hop, n_fft=2048, target_frames=16)
    y = (0.1 * rng.standard_normal((2, cfg.num_samples))).astype(np.float32)
    T = cfg.total_frames
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct"))
    P = stft_power(jnp.asarray(y), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)


def test_pallas_ct_lane_phase_multi_tile(rng):
    """hop=160 across >1 frame tile: phase copies + shifted row windows."""
    cfg = MelConfig(sr=16000, duration=2.0, n_mels=32, fmin=100, fmax=7500,
                    hop_length=160, n_fft=2048, target_frames=160)
    y = (0.1 * rng.standard_normal((1, cfg.num_samples))).astype(np.float32)
    T = cfg.total_frames
    assert T > 128
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct"))
    P = stft_power(jnp.asarray(y), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                   num_frames=T, backend="matmul")
    fb = jnp.asarray(mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
    ref = np.asarray(jnp.einsum("btf,fm->btm", P, fb))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)


def test_pallas_rejects_unaligned_hop():
    bad = CFG.replace(hop_length=100)  # % 32 and % 16 both fail
    with pytest.raises(NotImplementedError):
        mel_power_pallas(jnp.zeros((1, bad.num_samples)), bad, num_frames=8, interpret=True)


def test_log_mel_pallas_backend_falls_back_for_unaligned_hop(rng):
    """backend='pallas' must be a safe default: hops outside both kernel
    families (e.g. 40: %32 and %16 fail) silently take the XLA matmul path."""
    from anuraxla.ops.pallas_frontend import pallas_supported

    bad = CFG.replace(hop_length=40)
    assert not pallas_supported(bad)
    assert pallas_supported(CFG.replace(hop_length=160))
    y = (0.1 * rng.standard_normal((1, bad.num_samples))).astype(np.float32)
    got = np.asarray(log_mel_batch(jnp.asarray(y), bad, backend="pallas"))
    ref = np.asarray(log_mel_batch(jnp.asarray(y), bad, backend="matmul"))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("assembly", ["phase", "stack"])
def test_pallas_fused_rms_scale(rng, assembly):
    """rms_scale fusion (in-VMEM scale+clip on the phase kernel, inline
    pre-apply on the stack path) must equal normalize-then-mel exactly —
    including the silence-gate pass-through row and a clipping-hot row."""
    from anuraxla.ops.frontend import rms_normalize_batch, rms_scale_batch

    cfg = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    y = (0.1 * rng.standard_normal((4, cfg.num_samples))).astype(np.float32)
    y[1] *= 1e-5          # below RMS_SILENCE_GATE: sentinel pass-through
    y[2] *= 30.0          # scale pushes samples past the [-1, 1] clip
    T = cfg.total_frames
    yj = jnp.asarray(y)
    scale = rms_scale_batch(yj)
    assert float(scale[1]) < 0  # the silent row really takes the sentinel
    got = np.asarray(mel_power_pallas(yj, cfg, num_frames=T, interpret=True,
                                      algorithm="ct", assembly=assembly,
                                      rms_scale=scale))
    y_norm, _ = rms_normalize_batch(yj)
    ref = np.asarray(mel_power_pallas(y_norm, cfg, num_frames=T,
                                      interpret=True, algorithm="ct",
                                      assembly=assembly))
    np.testing.assert_allclose(got / ref.max(), ref / ref.max(), atol=2e-5)


def test_log_mel_fused_rms_scale_matmul(rng):
    """log_mel_batch(rms_scale=...) on the XLA backend equals the two-step
    normalize -> log_mel chain bit-for-bit."""
    from anuraxla.ops.frontend import rms_normalize_batch, rms_scale_batch

    y = (0.3 * rng.standard_normal((3, CFG.num_samples))).astype(np.float32)
    y[1] *= 1e-5
    yj = jnp.asarray(y)
    got = np.asarray(log_mel_batch(yj, CFG, rms_scale=rms_scale_batch(yj)))
    ref = np.asarray(log_mel_batch(rms_normalize_batch(yj)[0], CFG))
    np.testing.assert_allclose(got, ref, atol=0)


def test_log_mel_pallas_backend_lane_phase_hop_full_frontend(rng):
    """hop=96 (previously a fallback) now runs the real CT kernel through
    the full frontend path."""
    import anuraxla.ops.pallas_frontend as pf

    cfg = MelConfig(sr=16000, duration=0.5, n_mels=32, fmin=100, fmax=7500,
                    hop_length=96, n_fft=256, target_frames=48)
    y = (0.1 * rng.standard_normal((1, cfg.num_samples))).astype(np.float32)
    orig = pf.mel_power_pallas
    try:
        pf.mel_power_pallas = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        got = np.asarray(log_mel_batch(jnp.asarray(y), cfg, backend="pallas"))
    finally:
        pf.mel_power_pallas = orig
    ref = np.asarray(log_mel_batch(jnp.asarray(y), cfg, backend="matmul"))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pre_padded_input_matches_device_pad(rng):
    """pre_padded=True on a host-padded phase-layout row is bitwise the
    device-padded run (same kernel, same data), with the fused rms_scale
    reduced over the sliced valid region, and the layout-mismatch guard raises."""
    from anuraxla.ops.frontend import rms_scale_batch
    from anuraxla.ops.pallas_frontend import phase_padded_layout

    cfg = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    T = cfg.total_frames
    y = (0.1 * rng.standard_normal((3, cfg.num_samples))).astype(np.float32)
    y[1] *= 1e-5  # silence-gate row survives the padded-rms path too
    L_pad, pad_l = phase_padded_layout(cfg, T)
    ypad = np.zeros((3, L_pad), np.float32)
    ypad[:, pad_l : pad_l + cfg.num_samples] = y

    # the production convention (session.py): the scale reduces over the
    # SLICED valid region, so it is bitwise the unpadded path's scale
    sc = rms_scale_batch(jnp.asarray(y))
    sc_pad = rms_scale_batch(
        jnp.asarray(ypad[:, pad_l : pad_l + cfg.num_samples])
    )
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc_pad))

    ref = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct",
                                      rms_scale=sc))
    got = np.asarray(mel_power_pallas(jnp.asarray(ypad), cfg, num_frames=T,
                                      interpret=True, algorithm="ct",
                                      rms_scale=sc_pad, pre_padded=True))
    np.testing.assert_array_equal(got, ref)

    with pytest.raises(ValueError, match="phase_padded_layout"):
        mel_power_pallas(jnp.asarray(ypad[:, :-128]), cfg, num_frames=T,
                         interpret=True, algorithm="ct", pre_padded=True)


def test_log_mel_pre_padded_fallback_slices_valid_region(rng):
    """pre_padded rows through log_mel_batch on the matmul backend slice the
    valid region back out — same result as the raw-signal call."""
    cfg = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    from anuraxla.ops.pallas_frontend import phase_padded_layout

    y = (0.1 * rng.standard_normal((2, cfg.num_samples))).astype(np.float32)
    L_pad, pad_l = phase_padded_layout(cfg, cfg.total_frames)
    ypad = np.zeros((2, L_pad), np.float32)
    ypad[:, pad_l : pad_l + cfg.num_samples] = y
    ref = np.asarray(log_mel_batch(jnp.asarray(y), cfg, backend="matmul"))
    got = np.asarray(log_mel_batch(jnp.asarray(ypad), cfg, backend="matmul",
                                   pre_padded=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("exact", [True, False])
def test_phase_kernel_fused_dots(rng, exact):
    """fused_dots on the phase kernel (concatenated-operand outer stage):
    matches the plain phase kernel within the split-structure tolerance."""
    cfg = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    y = (0.1 * rng.standard_normal((2, cfg.num_samples))).astype(np.float32)
    T = cfg.total_frames
    ref = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct"))
    got = np.asarray(mel_power_pallas(jnp.asarray(y), cfg, num_frames=T,
                                      interpret=True, algorithm="ct",
                                      fused_dots=True, exact=exact))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < (1e-5 if exact else 5e-3)


@pytest.mark.parametrize("row_block", [2, 4])
def test_phase_kernel_batch_rows_bitwise(rng, row_block):
    """batch_rows (r4): one inner+outer stage over all row_block rows
    stacked along sublanes — [rb*128,128] MXU dots instead of rb separate
    [128,128] ones. Row-independent math, so the contract is BITWISE
    equality with the per-row loop, including under the fused RMS scale
    (per-row scalar) and the bf16 mode. On-chip the same bitwise check
    runs in scripts/probe_batch_rows.py (real-Mosaic compile proven for
    rb <= 4; rb=8 exceeds VMEM — auto never picks it)."""
    cfg = MelConfig(sr=48000, duration=1.0, n_mels=64, fmin=150, fmax=15000,
                    hop_length=384, n_fft=2048, target_frames=96)
    y = (0.1 * rng.standard_normal((4, cfg.num_samples))).astype(np.float32)
    scale = np.abs(rng.standard_normal(4)).astype(np.float32)
    scale[1] = -1.0  # silence-gate sentinel row
    T = cfg.total_frames
    for exact in (True, False):
        for sc in (None, jnp.asarray(scale)):
            ref = np.asarray(mel_power_pallas(
                jnp.asarray(y), cfg, num_frames=T, interpret=True,
                algorithm="ct", exact=exact, rms_scale=sc,
                row_block=row_block, batch_rows=False))
            got = np.asarray(mel_power_pallas(
                jnp.asarray(y), cfg, num_frames=T, interpret=True,
                algorithm="ct", exact=exact, rms_scale=sc,
                row_block=row_block, batch_rows=True))
            np.testing.assert_array_equal(got, ref)


def test_batch_rows_rejected_off_phase_kernel():
    cfg = MelConfig(sr=16000, duration=0.5, n_mels=32, fmin=100, fmax=7500,
                    hop_length=160, n_fft=2048, target_frames=48)
    y = jnp.zeros((2, cfg.num_samples), jnp.float32)
    with pytest.raises(ValueError, match="batch_rows"):
        mel_power_pallas(y, cfg, num_frames=cfg.total_frames, interpret=True,
                         algorithm="ct", batch_rows=True)


def test_ablate_validation(rng):
    """ablate classes must be rejected when they are not wired into the
    selected mode — a silent no-op would fake profiling evidence."""
    y = (0.1 * rng.standard_normal((1, CFG.num_samples))).astype(np.float32)
    T = CFG.total_frames
    with pytest.raises(ValueError, match="exact"):
        mel_power_pallas(jnp.asarray(y), CFG, num_frames=T, interpret=True,
                         algorithm="ct", exact=False, ablate=("splits",))
    with pytest.raises(ValueError, match="fused-dots"):
        mel_power_pallas(jnp.asarray(y), CFG, num_frames=T, interpret=True,
                         algorithm="ct", assembly="phase", fused_dots=True,
                         ablate=("power",))
    # 'power'/'fb' ARE wired into the bf16 outer stage: runs, right shape
    out = mel_power_pallas(jnp.asarray(y), CFG, num_frames=T, interpret=True,
                           algorithm="ct", exact=False, ablate=("power",))
    assert out.shape == (1, T, CFG.n_mels)
