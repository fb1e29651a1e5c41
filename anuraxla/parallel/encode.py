"""Sharded batch encode + distributed detector fitting.

Capability mapping (SURVEY.md §2.3): the reference's only "scheduler" is a
per-WAV Python loop; here the wav->mel->latent pipeline runs SPMD over the
``data`` axis of a mesh — each chip computes its batch shard, XLA inserts the
(ICI) collectives — and the LDA pooled covariance / global quantile fits can
consume latents that stay sharded across chips, reduced with ``psum`` inside
``shard_map`` instead of gathering to one host.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from anuraxla.constants import MelConfig
from anuraxla.ops.frontend import log_mel_batch, mel_to_encoder_input


def make_sharded_encode(
    mesh: Mesh,
    encoder_apply: Callable,
    mel: MelConfig,
    *,
    parity: bool = True,
) -> Callable:
    """Build jit(params, audio [B, L]) -> latents [B, D] with the batch sharded
    over mesh['data'] and params replicated. B must divide by the data axis."""
    from anuraxla.parallel.mesh import jit_batch_sharded

    def encode(params, audio):
        mels = log_mel_batch(audio, mel, parity=parity)
        return encoder_apply(params, mel_to_encoder_input(mels))["mu"]

    jitted, _, _ = jit_batch_sharded(encode, mesh=mesh)
    return jitted


def sharded_pooled_cov(mesh: Mesh):
    """cov over per-class-centered latents that live sharded on the 'data'
    axis: per-shard Gram matrices + psum, never materializing the gathered
    matrix on one chip. Inputs: Zc [N, D] (already centered), mask [N].
    Returns (cov [D, D], n_total) replicated."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=(P(), P()),
    )
    def _cov(Zc, mask):
        w = mask.astype(Zc.dtype)
        Zw = Zc * w[:, None]
        gram = jax.lax.psum(
            jnp.matmul(Zw.T, Zw, precision=jax.lax.Precision.HIGHEST), "data"
        )
        n = jax.lax.psum(jnp.sum(w), "data")
        return gram / jnp.maximum(n - 1.0, 1.0), n

    return _cov


def sharded_distance_histogram(mesh: Mesh, n_bins: int = 8192):
    """Global distance-distribution summary over sharded latents: per-shard
    histograms psum'd across chips — the building block for approximate
    global quantiles without an all-gather when N is huge. Inputs:
    d [N] distances, mask [N], lo/hi scalars. Returns counts [n_bins]."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P()),
        out_specs=P(),
    )
    def _hist(d, mask, lo, hi):
        scaled = (d - lo) / jnp.maximum(hi - lo, 1e-12) * n_bins
        idx = jnp.clip(scaled.astype(jnp.int32), 0, n_bins - 1)
        # scatter-add: O(N + n_bins) memory — a one-hot matmul would
        # materialize [N_shard, n_bins] and defeat the huge-N use case
        counts = jnp.zeros((n_bins,), jnp.float32).at[idx].add(
            mask.astype(jnp.float32)
        )
        return jax.lax.psum(counts, "data")

    return _hist
