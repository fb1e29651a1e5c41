"""Gaussian MAP (LDA/QDA) detector in latent space, fully batched.

Math parity target: ``08b_fit_map_detector.py`` (priors :262-266, means :269,
pooled/per-class covariance :276-292, τ from the true-class score quantile
:315-319) and the decision rule of ``09n_evaluate_wav_detection.py:51-140``:

  score_k(z) = log N(z | mu_k, Sigma_k) + log(pi_k + 1e-12)
  pred       = argmax_k score_k
  NO_DETECT  iff tau is set and max_k score_k < tau

The reference scores one z at a time with a Python species loop; here a whole
folder scores as one [B, K] einsum (ops.linalg.gaussian_log_likelihood).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from anuraxla.ops.linalg import gaussian_log_likelihood, inv_and_logdet, masked_cov, regularize_cov
from anuraxla.ops.quantiles import masked_quantile


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapFit:
    means: jax.Array  # [K, D]
    covs: jax.Array  # [K, D, D]
    precisions: jax.Array  # [K, D, D]
    logdets: jax.Array  # [K]
    priors: jax.Array  # [K]
    tau: jax.Array  # scalar (nan == disabled)
    scores_true_sorted: jax.Array  # [K*Nmax] ascending (+inf pad), for tau sweeps
    n_scores: jax.Array  # scalar valid count


@partial(jax.jit, static_argnames=("cov_type", "cov_structure", "priors_mode", "eps", "shrink", "tau_q"))
def fit_map(
    Z: jax.Array,
    mask: jax.Array,
    *,
    cov_type: str = "lda",
    cov_structure: str = "full",
    priors_mode: str = "empirical",
    eps: float = 1e-6,
    shrink: float = 0.0,
    tau_q: float | None = None,
) -> MapFit:
    """Fit the MAP detector over padded per-species latents.

    Z: [K, Nmax, D]; mask: [K, Nmax]. cov_type: "lda" (pooled, shared) or
    "qda" (per-class); cov_structure: "full"/"diag"; priors_mode:
    "empirical"/"uniform". tau_q, if given, sets τ to that quantile of the
    true-class training scores.
    """
    K, Nmax, D = Z.shape
    w = mask.astype(Z.dtype)
    n_k = jnp.sum(w, axis=1)  # [K]
    total = jnp.maximum(jnp.sum(n_k), 1.0)

    means = jnp.sum(Z * w[..., None], axis=1) / jnp.maximum(n_k, 1.0)[:, None]

    if priors_mode == "uniform":
        priors = jnp.full((K,), 1.0 / K, Z.dtype)
    else:
        priors = n_k / total

    diag_only = cov_structure == "diag"
    if cov_type == "lda":
        # pool per-class-centered rows; their masked mean is exactly 0, and the
        # reference's np.cov over the pooled matrix uses divisor N_total - 1.
        Zc = (Z - means[:, None, :]).reshape(K * Nmax, D)
        cov_shared = masked_cov(Zc, mask.reshape(K * Nmax), mu=jnp.zeros((D,), Z.dtype))
        cov_shared = regularize_cov(cov_shared, eps=eps, shrink=shrink, diag_only=diag_only)
        prec_shared, ld_shared = inv_and_logdet(cov_shared)
        covs = jnp.broadcast_to(cov_shared, (K, D, D))
        precs = jnp.broadcast_to(prec_shared, (K, D, D))
        logdets = jnp.broadcast_to(ld_shared, (K,))
    else:
        def per_class(Zk, mk, muk):
            c = masked_cov(Zk, mk, mu=muk)
            c = regularize_cov(c, eps=eps, shrink=shrink, diag_only=diag_only)
            p, ld = inv_and_logdet(c)
            return c, p, ld

        covs, precs, logdets = jax.vmap(per_class)(Z, mask, means)

    # true-class training scores (for tau and meta summaries)
    log_priors = jnp.log(priors + 1e-12)
    flatZ = Z.reshape(K * Nmax, D)
    ll_all = gaussian_log_likelihood(flatZ, means, precs, logdets)  # [K*Nmax, K]
    owner = jnp.repeat(jnp.arange(K), Nmax)
    scores_true = ll_all[jnp.arange(K * Nmax), owner] + log_priors[owner]
    flat_mask = mask.reshape(K * Nmax)
    scores_true_sorted = jnp.sort(jnp.where(flat_mask, scores_true, jnp.inf))
    n_scores = jnp.sum(flat_mask)

    if tau_q is None:
        tau = jnp.asarray(jnp.nan, jnp.float32)
    else:
        tau = masked_quantile(scores_true, flat_mask, jnp.asarray(tau_q, jnp.float32))

    return MapFit(
        means=means.astype(jnp.float32),
        covs=covs.astype(jnp.float32),
        precisions=precs.astype(jnp.float32),
        logdets=logdets.astype(jnp.float32),
        priors=priors.astype(jnp.float32),
        tau=tau,
        scores_true_sorted=scores_true_sorted,
        n_scores=n_scores,
    )


@jax.jit
def map_decide(
    Z: jax.Array,
    means: jax.Array,
    precisions: jax.Array,
    logdets: jax.Array,
    priors: jax.Array,
    tau: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched MAP decision. Z: [B, D] -> (detected [B], winner_idx [B],
    best_score [B]). tau == nan disables rejection (reference tau=None)."""
    scores = gaussian_log_likelihood(Z, means, precisions, logdets) + jnp.log(priors + 1e-12)[None, :]
    best = jnp.argmax(scores, axis=1).astype(jnp.int32)
    best_score = jnp.max(scores, axis=1)
    rejected = jnp.where(jnp.isnan(tau), False, best_score < tau)
    detected = ~rejected
    return detected, jnp.where(detected, best, -1), best_score


def true_class_score_summary(fit: MapFit, Z: jax.Array, mask: jax.Array) -> dict:
    """Per-species min/p05/p50/p95/max of true-class scores — the reference's
    summarize_1d meta (``map_detector_core.py:92-101``)."""
    K, Nmax, D = Z.shape
    log_priors = jnp.log(fit.priors + 1e-12)

    def per_class(k):
        ll = gaussian_log_likelihood(Z[k], fit.means, fit.precisions, fit.logdets)[:, k]
        s = ll + log_priors[k]
        m = mask[k]
        qs = masked_quantile(s, m, jnp.asarray([0.05, 0.5, 0.95], jnp.float32))
        return {
            "min": jnp.min(jnp.where(m, s, jnp.inf)),
            "p05": qs[0],
            "p50": qs[1],
            "p95": qs[2],
            "max": jnp.max(jnp.where(m, s, -jnp.inf)),
        }

    return jax.vmap(per_class)(jnp.arange(K))
