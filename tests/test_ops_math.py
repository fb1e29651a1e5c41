"""Property/golden tests for quantiles, covariance, and Gaussian scoring."""

import numpy as np

from anuraxla.ops.linalg import (
    gaussian_log_likelihood,
    inv_and_logdet,
    masked_cov,
    masked_mean,
    regularize_cov,
)
from anuraxla.ops.quantiles import masked_quantile


def test_masked_quantile_matches_numpy(rng):
    for n_valid in [1, 2, 7, 50]:
        x = rng.standard_normal(64).astype(np.float32)
        mask = np.zeros(64, bool)
        mask[:n_valid] = True
        for q in [0.0, 0.01, 0.25, 0.5, 0.95, 1.0]:
            ours = float(masked_quantile(x, mask, q))
            ref = float(np.quantile(x[:n_valid], q))
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_masked_quantile_vector_q(rng):
    x = rng.standard_normal((3, 32)).astype(np.float32)
    mask = np.ones((3, 32), bool)
    mask[1, 20:] = False
    qs = np.array([0.1, 0.5, 0.9], np.float32)
    out = np.asarray(masked_quantile(x, mask, qs))
    assert out.shape == (3, 3)
    for b in range(3):
        valid = x[b][mask[b]]
        np.testing.assert_allclose(out[b], np.quantile(valid, qs), rtol=1e-5, atol=1e-6)


def test_masked_quantile_empty_returns_zero():
    x = np.ones(8, np.float32)
    mask = np.zeros(8, bool)
    assert float(masked_quantile(x, mask, 0.5)) == 0.0


def test_masked_cov_matches_numpy(rng):
    Z = rng.standard_normal((40, 6)).astype(np.float32)
    mask = np.ones(40, bool)
    mask[25:] = False
    ours = np.asarray(masked_cov(Z, mask))
    ref = np.cov(Z[:25], rowvar=False, bias=False)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(masked_mean(Z, mask)), Z[:25].mean(0), rtol=1e-5, atol=1e-6
    )


def test_masked_cov_degenerate_returns_identity(rng):
    Z = rng.standard_normal((4, 5)).astype(np.float32)
    mask = np.array([True, False, False, False])
    np.testing.assert_allclose(np.asarray(masked_cov(Z, mask)), np.eye(5), atol=1e-6)


def test_regularize_matches_reference_estimate_cov(rng):
    """Cross-check vs reference estimate_cov math (08b_fit_map_detector.py:60-81)."""
    Z = rng.standard_normal((30, 5)).astype(np.float32)
    cov = np.cov(Z, rowvar=False, bias=False).astype(np.float32)
    eps, shrink = 1e-6, 0.3

    ref = cov.copy()
    avg_var = float(np.mean(np.diag(ref)))
    ref = (1.0 - shrink) * ref + shrink * (avg_var * np.eye(5, dtype=np.float32))
    ref = ref + eps * np.eye(5, dtype=np.float32)

    ours = np.asarray(regularize_cov(np.asarray(cov), eps=eps, shrink=shrink))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)

    # diag structure applied before shrink/eps, as in the reference
    ref_d = np.diag(np.diag(cov)).astype(np.float32)
    avg_var = float(np.mean(np.diag(ref_d)))
    ref_d = (1.0 - shrink) * ref_d + shrink * avg_var * np.eye(5, dtype=np.float32)
    ref_d = ref_d + eps * np.eye(5, dtype=np.float32)
    ours_d = np.asarray(regularize_cov(np.asarray(cov), eps=eps, shrink=shrink, diag_only=True))
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-5, atol=1e-7)


def test_inv_and_logdet_matches_numpy(rng):
    A = rng.standard_normal((6, 6))
    cov = (A @ A.T + 6 * np.eye(6)).astype(np.float32)
    prec, ld = inv_and_logdet(np.asarray(cov))
    sign, ref_ld = np.linalg.slogdet(cov)
    assert sign > 0
    np.testing.assert_allclose(float(ld), ref_ld, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(prec), np.linalg.inv(cov), rtol=2e-3, atol=2e-4)


def test_inv_and_logdet_repairs_non_pd():
    cov = np.diag([1.0, -0.0001, 2.0]).astype(np.float32)  # not PD
    prec, ld = inv_and_logdet(np.asarray(cov))
    assert np.all(np.isfinite(np.asarray(prec)))
    assert np.isfinite(float(ld))


def test_gaussian_log_likelihood_matches_reference_formula(rng):
    """vs gaussian_logpdf_from_precision (map_detector_core.py:319-323)."""
    D, K, B = 5, 3, 7
    Z = rng.standard_normal((B, D)).astype(np.float32)
    means = rng.standard_normal((K, D)).astype(np.float32)
    precs, lds = [], []
    for _ in range(K):
        A = rng.standard_normal((D, D))
        cov = A @ A.T + D * np.eye(D)
        precs.append(np.linalg.inv(cov).astype(np.float32))
        lds.append(np.linalg.slogdet(cov)[1])
    precs, lds = np.stack(precs), np.array(lds, np.float32)

    ours = np.asarray(gaussian_log_likelihood(Z, means, precs, lds))
    for b in range(B):
        for k in range(K):
            diff = Z[b] - means[k]
            quad = float(diff.T @ precs[k] @ diff)
            ref = -0.5 * (quad + float(lds[k]) + D * np.log(2 * np.pi))
            np.testing.assert_allclose(ours[b, k], ref, rtol=1e-4, atol=1e-4)


def test_wav_roundtrip(rng, tmp_path):
    from anuraxla.utils.wavio import read_wav, write_wav

    y = (rng.standard_normal(48000) * 0.2).astype(np.float32)
    p = tmp_path / "t.wav"
    write_wav(p, y, 48000, subtype="FLOAT")
    y2, sr = read_wav(p)
    assert sr == 48000
    np.testing.assert_allclose(y2, y, atol=1e-7)

    write_wav(p, y, 48000, subtype="PCM_16")
    y3, _ = read_wav(p)
    np.testing.assert_allclose(y3, y, atol=0.51 / 32768)

    # stereo -> mono mean, like librosa.load(mono=True)
    stereo = np.stack([y, -y], axis=1)
    write_wav(p, stereo, 48000, subtype="FLOAT")
    m, _ = read_wav(p, mono=True)
    np.testing.assert_allclose(m, np.zeros_like(y), atol=1e-6)
