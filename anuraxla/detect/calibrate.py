"""On-device calibration sweeps.

Capability target: the reference's q_out grid (``run_qout_grid.sh``,
``9200_run_qout_grid_with_snapshot.py``) — four full subprocess re-runs of
fit-08 + benchmark-10, with rk values scraped back out of stdout logs by regex
(``9105_make_config_snapshot_from_log.py``). Latents do not depend on q, so
the whole grid collapses to: encode once, then vectorize thresholding +
decision metrics over the (q_in × q_out) grid — one jit, entirely on device.
Also sweeps τ for the MAP detector the same way.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from anuraxla.detect.radial import RadialFit, radial_decide
from anuraxla.ops.linalg import gaussian_log_likelihood
from anuraxla.ops.quantiles import quantile_sorted


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridMetrics:
    """Per grid point: global + per-class accuracy and NO_DETECT rates.
    Shapes: [Qi, Qo] or [Qi, Qo, K]."""

    accuracy: jax.Array
    no_detect_rate: jax.Array
    acc_per_class: jax.Array
    no_detect_per_class: jax.Array
    thresholds: jax.Array  # [Qi, Qo, K] fitted rk
    rk_in: jax.Array  # [Qi, K]
    rk_out: jax.Array  # [Qo, K]


def _metrics_from_decisions(detected, winner, true_idx, K, valid=None):
    """Decision tensors [..., B] -> metric dicts; excludes nothing (the
    benchmark's ERROR rows have no analogue on-device). ``valid`` [B] masks
    out padding rows (sharded evaluation pads B to a device-count multiple)."""
    correct = detected & (winner == true_idx)
    if valid is None:
        acc = jnp.mean(correct, axis=-1)
        nodet = jnp.mean(~detected, axis=-1)
        onehot = jax.nn.one_hot(true_idx, K, dtype=jnp.float32)  # [B, K]
    else:
        v = valid.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(v), 1.0)
        acc = jnp.sum(correct.astype(jnp.float32) * v, axis=-1) / n
        nodet = jnp.sum((~detected).astype(jnp.float32) * v, axis=-1) / n
        onehot = jax.nn.one_hot(true_idx, K, dtype=jnp.float32) * v[:, None]
    n_per = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)  # [K]
    accp = jnp.einsum("...b,bk->...k", correct.astype(jnp.float32), onehot) / n_per
    nodp = jnp.einsum("...b,bk->...k", (~detected).astype(jnp.float32), onehot) / n_per
    return acc, nodet, accp, nodp


@partial(jax.jit, static_argnames=())
def radial_qgrid(
    fit: RadialFit,
    Z_eval: jax.Array,
    true_idx: jax.Array,
    priority_rank: jax.Array,
    q_in_grid: jax.Array,
    q_out_grid: jax.Array,
    valid: jax.Array | None = None,
) -> GridMetrics:
    """Evaluate the radial detector over a full (q_in × q_out) grid.

    fit: RadialFit from the train latents (its sorted distance pools make each
    grid point O(K) threshold lookups). Z_eval: [B, D] validation latents with
    integer labels true_idx [B]. Returns GridMetrics over [Qi, Qo].

    Multi-chip serving: put Z_eval/true_idx/valid on a mesh batch-sharded over
    'data' (pad B to a device multiple, mask the pad rows via ``valid``) and
    the decide stage runs SPMD — XLA turns the metric reductions into psums
    over ICI (cli.run_qout_grid._device_sweep does this for --data-parallel).
    """
    K = fit.centroids.shape[0]
    q_in_grid = jnp.asarray(q_in_grid, jnp.float32)
    q_out_grid = jnp.asarray(q_out_grid, jnp.float32)

    rk_in = jax.vmap(lambda q: quantile_sorted(fit.rho_in_sorted, q, fit.n_in))(q_in_grid)  # [Qi, K]
    rk_out_q = jax.vmap(lambda q: quantile_sorted(fit.rho_out_sorted, q, fit.n_out))(q_out_grid)
    rk_out = jnp.where(fit.n_out[None, :] > 0, rk_out_q, jnp.inf)  # [Qo, K]
    thr = jnp.minimum(rk_in[:, None, :], rk_out[None, :, :])  # [Qi, Qo, K]

    def decide(t):
        return radial_decide(Z_eval, fit.centroids, t, priority_rank)

    detected, winner, _ = jax.vmap(jax.vmap(decide))(thr)  # [Qi, Qo, B]
    acc, nodet, accp, nodp = _metrics_from_decisions(detected, winner, true_idx, K, valid)
    return GridMetrics(
        accuracy=acc,
        no_detect_rate=nodet,
        acc_per_class=accp,
        no_detect_per_class=nodp,
        thresholds=thr,
        rk_in=rk_in,
        rk_out=rk_out,
    )


@jax.jit
def map_tau_sweep(
    scores_true_sorted: jax.Array,
    n_scores: jax.Array,
    Z_eval: jax.Array,
    true_idx: jax.Array,
    means: jax.Array,
    precisions: jax.Array,
    logdets: jax.Array,
    priors: jax.Array,
    tau_q_grid: jax.Array,
):
    """Sweep τ over quantiles of the true-class train scores; returns
    (tau [Q], accuracy [Q], no_detect_rate [Q]). Scores computed once."""
    scores = gaussian_log_likelihood(Z_eval, means, precisions, logdets) + jnp.log(priors + 1e-12)[None, :]
    best = jnp.argmax(scores, axis=1)
    best_score = jnp.max(scores, axis=1)
    taus = jax.vmap(lambda q: quantile_sorted(scores_true_sorted, q, n_scores))(
        jnp.asarray(tau_q_grid, jnp.float32)
    )

    def at_tau(tau):
        detected = best_score >= tau
        correct = detected & (best == true_idx)
        return jnp.mean(correct), jnp.mean(~detected)

    acc, nodet = jax.vmap(at_tau)(taus)
    return taus, acc, nodet
