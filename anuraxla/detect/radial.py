"""Radial (centroid + radius) detector in latent space, fully batched.

Math parity target: ``08_fit_radial_detector.py:310-333``
(fit_species_with_fp_control) and the accept/tie-break rule of
``09_evaluate_wav_detection.py:358-436``:

  mu_k   = mean(Z_k)
  rk_in  = quantile(||Z_k - mu_k||, q_in)
  rk_out = quantile(||Z_other - mu_k||, q_out)   (inf if no other class)
  rk     = min(rk_in, rk_out)
  accept species k for z iff ||z - mu_k|| <= rk; ties broken by a fixed
  priority order, then lexicographic.

The reference loops species in Python over NumPy rows; here species are a
vmapped axis over padded [K, Nmax, D] latents with validity masks, and
decisions for a whole folder are one [B, K] distance computation. The same
padded layout is reused by the calibration sweep (calibrate.py), which is why
fit returns sorted distance tensors as well.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from anuraxla.ops.quantiles import masked_quantile, quantile_sorted


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RadialFit:
    """Fitted radial detector (device arrays; species axis ordered as input)."""

    centroids: jax.Array  # [K, D]
    rk: jax.Array  # [K]
    rk_in: jax.Array  # [K]
    rk_out: jax.Array  # [K]  (inf when no out-of-class samples)
    # sorted distance pools for calibration sweeps:
    rho_in_sorted: jax.Array  # [K, Nmax] ascending, +inf padded
    n_in: jax.Array  # [K]
    rho_out_sorted: jax.Array  # [K, K*Nmax] ascending, +inf padded
    n_out: jax.Array  # [K]


def _pairwise_dist(Z: jax.Array, mus: jax.Array) -> jax.Array:
    """||z_b - mu_k|| for Z [B, D], mus [K, D] -> [B, K]."""
    diff = Z[:, None, :] - mus[None, :, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))


@partial(jax.jit, static_argnames=())
def fit_radial(
    Z: jax.Array,
    mask: jax.Array,
    q_in: jax.Array | float,
    q_out: jax.Array | float,
) -> RadialFit:
    """Fit all species at once.

    Z: [K, Nmax, D] padded latents; mask: [K, Nmax] validity.
    q_in/q_out: scalars (vmap/vectorize over them via calibrate.py).
    """
    K, Nmax, D = Z.shape
    w = mask.astype(Z.dtype)
    n_in = jnp.sum(mask, axis=1)  # [K]
    mus = jnp.sum(Z * w[..., None], axis=1) / jnp.maximum(n_in, 1)[:, None].astype(Z.dtype)

    # in-class distances [K, Nmax]
    diff_in = Z - mus[:, None, :]
    rho_in = jnp.sqrt(jnp.maximum(jnp.sum(diff_in * diff_in, axis=-1), 0.0))
    rk_in = masked_quantile(rho_in, mask, jnp.asarray(q_in, jnp.float32))

    # out-of-class: distances of every sample to every centroid [K, K*Nmax]
    flatZ = Z.reshape(K * Nmax, D)
    flat_valid = mask.reshape(K * Nmax)
    d_all = _pairwise_dist(flatZ, mus).T  # [K, K*Nmax]
    owner = jnp.repeat(jnp.arange(K), Nmax)  # species of each flat sample
    out_mask = flat_valid[None, :] & (owner[None, :] != jnp.arange(K)[:, None])
    n_out = jnp.sum(out_mask, axis=1)
    rk_out_q = masked_quantile(d_all, out_mask, jnp.asarray(q_out, jnp.float32))
    rk_out = jnp.where(n_out > 0, rk_out_q, jnp.inf)  # reference: inf when no others

    rk = jnp.minimum(rk_in, rk_out)

    big = jnp.inf
    rho_in_sorted = jnp.sort(jnp.where(mask, rho_in, big), axis=1)
    rho_out_sorted = jnp.sort(jnp.where(out_mask, d_all, big), axis=1)

    return RadialFit(
        centroids=mus.astype(jnp.float32),
        rk=rk,
        rk_in=rk_in,
        rk_out=rk_out,
        rho_in_sorted=rho_in_sorted,
        n_in=n_in,
        rho_out_sorted=rho_out_sorted,
        n_out=n_out,
    )


def thresholds_for_q(fit: RadialFit, q_in: jax.Array, q_out: jax.Array) -> jax.Array:
    """Recompute rk = min(rk_in(q_in), rk_out(q_out)) from the fit's sorted
    distance pools — O(1) per grid point, no re-encoding. q_in/q_out scalars
    -> [K]."""
    rk_in = quantile_sorted(fit.rho_in_sorted, jnp.asarray(q_in, jnp.float32), fit.n_in)
    rk_out = quantile_sorted(fit.rho_out_sorted, jnp.asarray(q_out, jnp.float32), fit.n_out)
    rk_out = jnp.where(fit.n_out > 0, rk_out, jnp.inf)
    return jnp.minimum(rk_in, rk_out)


@jax.jit
def radial_decide(
    Z: jax.Array,
    centroids: jax.Array,
    thresholds: jax.Array,
    priority_rank: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched accept + tie-break.

    Z: [B, D]; centroids [K, D]; thresholds [K]; priority_rank [K] (lower wins;
    encode the reference's PRIORITY_ORDER position, with unknown species
    ranked after by lexicographic index — see pipeline.session.priority_ranks).

    Returns (detected [B] bool, winner_idx [B] int32 (-1 if none),
             best_distance [B] = min_k ||z - mu_k||, as logged by the
             benchmark session, ``10_benchmark_folder_detection.py:152-199``).
    """
    d = _pairwise_dist(Z, centroids)  # [B, K]
    accepted = d <= thresholds[None, :]
    detected = jnp.any(accepted, axis=1)
    key = jnp.where(accepted, priority_rank[None, :].astype(jnp.float32), jnp.inf)
    winner = jnp.argmin(key, axis=1).astype(jnp.int32)
    winner = jnp.where(detected, winner, -1)
    return detected, winner, jnp.min(d, axis=1)
