"""Covariance estimation and Gaussian precision/log-determinant on device.

Parity targets: ``08b_fit_map_detector.py:60-81`` (estimate_cov with eps·I and
shrinkage regularization, full/diag structure) and
``map_detector_core.py:306-316`` (inv_and_logdet with non-PD repair).

The reference computes these with NumPy LAPACK per species; here they are
pure-jnp, Cholesky-based, and vmappable over species / shrinkage grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(Z: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over valid rows. Z: [N, D], mask: [N] -> [D]."""
    w = mask.astype(Z.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(Z * w[:, None], axis=0) / n


def masked_cov(Z: jax.Array, mask: jax.Array, mu: jax.Array | None = None) -> jax.Array:
    """Unbiased sample covariance over valid rows (np.cov bias=False).

    Z: [N, D], mask: [N] -> [D, D]. With fewer than 2 valid rows returns I
    (``08b_fit_map_detector.py:68-69``). When ``mu`` is given the data is
    centered at ``mu`` but the divisor stays n-1 — this matches the reference
    LDA path, which centers per class then calls np.cov on the pooled matrix.
    """
    d = Z.shape[1]
    w = mask.astype(Z.dtype)
    n = jnp.sum(w)
    mu = masked_mean(Z, mask) if mu is None else mu
    Zc = (Z - mu[None, :]) * w[:, None]
    cov = jnp.matmul(Zc.T, Zc, precision=jax.lax.Precision.HIGHEST) / jnp.maximum(n - 1.0, 1.0)
    return jnp.where(n >= 2.0, cov, jnp.eye(d, dtype=Z.dtype))


def regularize_cov(
    cov: jax.Array,
    *,
    eps: float,
    shrink: float,
    diag_only: bool = False,
) -> jax.Array:
    """eps·I jitter + shrinkage toward mean-variance·I + optional diagonal
    structure — same order of operations as reference ``estimate_cov``."""
    d = cov.shape[-1]
    eye = jnp.eye(d, dtype=cov.dtype)
    if diag_only:
        cov = eye * jnp.diagonal(cov, axis1=-2, axis2=-1)[..., None, :]
    if shrink > 0:
        avg_var = jnp.mean(jnp.diagonal(cov, axis1=-2, axis2=-1), axis=-1)[..., None, None]
        cov = (1.0 - shrink) * cov + shrink * avg_var * eye
    return cov + eps * eye


def inv_and_logdet(cov: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(precision, logdet) via Cholesky, with the reference's non-PD repair:
    if the factorization fails, retry with +1e-3·I (``map_detector_core.py:306-316``).

    cov: [..., D, D] -> (prec [..., D, D], logdet [...]).
    """
    d = cov.shape[-1]
    eye = jnp.eye(d, dtype=cov.dtype)

    def chol_stats(c):
        L = jnp.linalg.cholesky(c)
        ok = jnp.all(jnp.isfinite(L), axis=(-2, -1))
        return L, ok

    L, ok = chol_stats(cov)
    cov2 = cov + 1e-3 * eye
    L2, _ = chol_stats(cov2)
    L = jnp.where(ok[..., None, None], L, L2)

    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    # L is lower-triangular by construction: a triangular solve beats the
    # general LU path in both work and conditioning
    inv_L = jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)
    prec = jnp.swapaxes(inv_L, -1, -2) @ inv_L
    return prec.astype(jnp.float32), logdet


def gaussian_log_likelihood(
    Z: jax.Array,
    means: jax.Array,
    precisions: jax.Array,
    logdets: jax.Array,
) -> jax.Array:
    """Batched log N(z | mu_k, Sigma_k) from precision matrices.

    Z: [B, D]; means: [K, D]; precisions: [K, D, D]; logdets: [K]
    -> scores [B, K]. One einsum replaces the reference's per-species Python
    loop of ``diff.T @ P @ diff`` (``map_detector_core.py:319-323``).
    """
    d = Z.shape[-1]
    diff = Z[:, None, :] - means[None, :, :]  # [B, K, D]
    quad = jnp.einsum(
        "bkd,kde,bke->bk", diff, precisions, diff,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return -0.5 * (quad + logdets[None, :] + d * jnp.log(2.0 * jnp.pi))
