"""Detector math parity vs an independent NumPy implementation of the
reference rules (08 / 08b / 09 / 09n math, written from SURVEY.md §2)."""

import numpy as np
import jax.numpy as jnp

from anuraxla.detect.radial import fit_radial, radial_decide, thresholds_for_q
from anuraxla.detect.gaussian_map import fit_map, map_decide
from anuraxla.detect.calibrate import map_tau_sweep, radial_qgrid


def make_ragged(rng, K=4, D=8, ns=(20, 13, 7, 17)):
    """Padded [K, Nmax, D] latents with distinct cluster means."""
    Nmax = max(ns)
    Z = np.zeros((K, Nmax, D), np.float32)
    mask = np.zeros((K, Nmax), bool)
    centers = rng.standard_normal((K, D)).astype(np.float32) * 4
    for k, n in enumerate(ns):
        Z[k, :n] = centers[k] + 0.5 * rng.standard_normal((n, D)).astype(np.float32)
        mask[k, :n] = True
    return Z, mask, ns


def ref_fit_radial(Z, mask, q_in, q_out):
    """NumPy reference: 08_fit_radial_detector.py:310-333 per species."""
    K = Z.shape[0]
    mus, rks, rkis, rkos = [], [], [], []
    groups = [Z[k][mask[k]] for k in range(K)]
    for k in range(K):
        Zin = groups[k]
        mu = Zin.mean(0)
        rho_in = np.linalg.norm(Zin - mu, axis=1)
        rk_in = float(np.quantile(rho_in, q_in))
        others = [groups[j] for j in range(K) if j != k and len(groups[j])]
        if others:
            Zout = np.concatenate(others, 0)
            rk_out = float(np.quantile(np.linalg.norm(Zout - mu, axis=1), q_out))
        else:
            rk_out = np.inf
        mus.append(mu)
        rkis.append(rk_in)
        rkos.append(rk_out)
        rks.append(min(rk_in, rk_out))
    return np.stack(mus), np.array(rks), np.array(rkis), np.array(rkos)


def test_fit_radial_matches_reference(rng):
    Z, mask, _ = make_ragged(rng)
    q_in, q_out = 0.95, 0.10
    fit = fit_radial(jnp.asarray(Z), jnp.asarray(mask), q_in, q_out)
    mus, rks, rkis, rkos = ref_fit_radial(Z, mask, q_in, q_out)
    np.testing.assert_allclose(np.asarray(fit.centroids), mus, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fit.rk_in), rkis, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fit.rk_out), rkos, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fit.rk), rks, rtol=1e-4, atol=1e-5)


def test_thresholds_for_q_consistent_with_refit(rng):
    Z, mask, _ = make_ragged(rng)
    fit = fit_radial(jnp.asarray(Z), jnp.asarray(mask), 0.95, 0.10)
    for qi, qo in [(0.8, 0.05), (0.99, 0.25), (0.5, 0.5)]:
        direct = fit_radial(jnp.asarray(Z), jnp.asarray(mask), qi, qo).rk
        fast = thresholds_for_q(fit, qi, qo)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(direct), rtol=1e-5, atol=1e-6)


def test_radial_decide_priority_tiebreak():
    # two overlapping species both accept; priority rank 1 must win even if
    # species 0 is closer (reference priority order, not distance, breaks ties)
    centroids = np.array([[0.0, 0.0], [0.5, 0.0]], np.float32)
    thr = np.array([10.0, 10.0], np.float32)
    z = np.array([[0.1, 0.0]], np.float32)
    rank_b_first = np.array([1.0, 0.0], np.float32)
    det, win, best_d = radial_decide(jnp.asarray(z), centroids, thr, jnp.asarray(rank_b_first))
    assert bool(det[0]) and int(win[0]) == 1
    np.testing.assert_allclose(float(best_d[0]), 0.1, atol=1e-6)

    # boundary: d == rk accepts (reference uses <=)
    thr2 = np.array([0.1, 0.0], np.float32)
    det2, win2, _ = radial_decide(jnp.asarray(z), centroids, thr2, jnp.asarray(rank_b_first))
    assert bool(det2[0]) and int(win2[0]) == 0

    # nothing accepted -> not detected, winner -1
    thr3 = np.array([0.01, 0.01], np.float32)
    det3, win3, _ = radial_decide(jnp.asarray(z), centroids, thr3, jnp.asarray(rank_b_first))
    assert not bool(det3[0]) and int(win3[0]) == -1


def ref_fit_map(Z, mask, cov_type, priors_mode, eps, shrink):
    """NumPy reference: 08b_fit_map_detector.py:258-292."""
    K, _, D = Z.shape
    groups = [Z[k][mask[k]] for k in range(K)]
    ns = np.array([len(g) for g in groups], float)
    if priors_mode == "uniform":
        priors = np.full(K, 1.0 / K)
    else:
        priors = ns / ns.sum()
    means = np.stack([g.mean(0) for g in groups])

    def est(Zc):
        n = len(Zc)
        cov = np.cov(Zc, rowvar=False, bias=False).astype(np.float32) if n >= 2 else np.eye(D, dtype=np.float32)
        if shrink > 0:
            av = float(np.mean(np.diag(cov)))
            cov = (1 - shrink) * cov + shrink * av * np.eye(D, dtype=np.float32)
        return cov + eps * np.eye(D, dtype=np.float32)

    if cov_type == "lda":
        Zc = np.concatenate([groups[k] - means[k] for k in range(K)], 0)
        cov = est(Zc)
        covs = np.stack([cov] * K)
    else:
        covs = np.stack([est(groups[k] - means[k]) for k in range(K)])
    precs = np.stack([np.linalg.inv(c) for c in covs])
    lds = np.array([np.linalg.slogdet(c)[1] for c in covs])
    return means, covs, precs, lds, priors


def test_fit_map_lda_qda_match_reference(rng):
    Z, mask, _ = make_ragged(rng)
    for cov_type in ["lda", "qda"]:
        for priors_mode in ["empirical", "uniform"]:
            fit = fit_map(
                jnp.asarray(Z), jnp.asarray(mask),
                cov_type=cov_type, priors_mode=priors_mode, eps=1e-4, shrink=0.1,
            )
            means, covs, precs, lds, priors = ref_fit_map(Z, mask, cov_type, priors_mode, 1e-4, 0.1)
            np.testing.assert_allclose(np.asarray(fit.means), means, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(fit.covs), covs, rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(np.asarray(fit.priors), priors, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(fit.logdets), lds, rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(np.asarray(fit.precisions), precs, rtol=2e-2, atol=1e-3)


def test_fit_map_tau_quantile(rng):
    Z, mask, _ = make_ragged(rng)
    fit = fit_map(jnp.asarray(Z), jnp.asarray(mask), tau_q=0.05)
    # recompute tau by brute force from the reference score definition
    means, covs, precs, lds, priors = ref_fit_map(Z, mask, "lda", "empirical", 1e-6, 0.0)
    scores = []
    for k in range(Z.shape[0]):
        for z in Z[k][mask[k]]:
            diff = z - means[k]
            quad = float(diff @ precs[k] @ diff)
            ll = -0.5 * (quad + lds[k] + Z.shape[2] * np.log(2 * np.pi))
            scores.append(ll + np.log(priors[k] + 1e-12))
    ref_tau = float(np.quantile(np.array(scores), 0.05))
    np.testing.assert_allclose(float(fit.tau), ref_tau, rtol=1e-3, atol=1e-3)


def test_map_decide_rejection(rng):
    Z, mask, _ = make_ragged(rng)
    fit = fit_map(jnp.asarray(Z), jnp.asarray(mask), tau_q=0.5)
    # in-distribution points mostly accepted
    test_pts = Z[0][mask[0]][:5]
    det, win, score = map_decide(
        jnp.asarray(test_pts), fit.means, fit.precisions, fit.logdets, fit.priors, fit.tau
    )
    assert np.asarray(win)[np.asarray(det)].tolist().count(0) == int(np.asarray(det).sum())
    # far-away point rejected
    far = np.full((1, Z.shape[2]), 100.0, np.float32)
    det_f, win_f, _ = map_decide(
        jnp.asarray(far), fit.means, fit.precisions, fit.logdets, fit.priors, fit.tau
    )
    assert not bool(det_f[0]) and int(win_f[0]) == -1
    # nan tau disables rejection
    det_n, _, _ = map_decide(
        jnp.asarray(far), fit.means, fit.precisions, fit.logdets, fit.priors, jnp.asarray(jnp.nan)
    )
    assert bool(det_n[0])


def test_radial_qgrid_matches_bruteforce(rng):
    Z, mask, ns = make_ragged(rng)
    K, _, D = Z.shape
    fit = fit_radial(jnp.asarray(Z), jnp.asarray(mask), 0.95, 0.10)

    # eval set: a mix of in-cluster and far points
    Zev = np.concatenate([Z[k][mask[k]][:5] for k in range(K)] + [np.full((3, D), 50.0, np.float32)])
    true_idx = np.concatenate([np.full(5, k) for k in range(K)] + [np.zeros(3)]).astype(np.int32)
    rank = np.arange(K, dtype=np.float32)

    qi_grid = np.array([0.8, 0.95], np.float32)
    qo_grid = np.array([0.10, 0.25], np.float32)
    gm = radial_qgrid(fit, jnp.asarray(Zev), jnp.asarray(true_idx), jnp.asarray(rank), qi_grid, qo_grid)

    for i, qi in enumerate(qi_grid):
        for j, qo in enumerate(qo_grid):
            thr = np.asarray(fit_radial(jnp.asarray(Z), jnp.asarray(mask), float(qi), float(qo)).rk)
            det, win, _ = radial_decide(jnp.asarray(Zev), fit.centroids, jnp.asarray(thr), jnp.asarray(rank))
            det, win = np.asarray(det), np.asarray(win)
            acc = float((det & (win == true_idx)).mean())
            nod = float((~det).mean())
            np.testing.assert_allclose(float(np.asarray(gm.accuracy)[i, j]), acc, atol=1e-6)
            np.testing.assert_allclose(float(np.asarray(gm.no_detect_rate)[i, j]), nod, atol=1e-6)


def test_map_tau_sweep_consistent(rng):
    Z, mask, _ = make_ragged(rng)
    fit = fit_map(jnp.asarray(Z), jnp.asarray(mask))
    Zev = np.concatenate([Z[k][mask[k]][:4] for k in range(4)])
    true_idx = np.concatenate([np.full(4, k) for k in range(4)]).astype(np.int32)
    taus, acc, nodet = map_tau_sweep(
        fit.scores_true_sorted, fit.n_scores, jnp.asarray(Zev), jnp.asarray(true_idx),
        fit.means, fit.precisions, fit.logdets, fit.priors, np.array([0.01, 0.5, 0.99], np.float32),
    )
    taus, acc, nodet = (np.asarray(v) for v in (taus, acc, nodet))
    assert np.all(np.diff(taus) >= 0)
    assert np.all(np.diff(nodet) >= 0)  # higher tau -> more rejection
    # at the highest tau nearly everything is rejected
    assert nodet[-1] >= 0.9
