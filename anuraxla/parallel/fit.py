"""Distributed detector fitting: latents stay sharded over the mesh 'data'
axis end to end.

The single-device fits (detect.radial / detect.gaussian_map) take the full
padded [K, Nmax, D] latent tensor on one chip — plus a [K, K·Nmax]
out-of-class distance matrix — which caps N at one chip's HBM. Here the
sample axis is sharded over the mesh and only two kinds of data ever cross
ICI:

- psum'd moments: per-class counts/sums (means, priors) and per-class Gram
  matrices (the pooled LDA covariance of ``ref:08b_fit_map_detector.py:
  276-292``, distributed exactly — same n−1 divisor, same HIGHEST-precision
  accumulation as ops.linalg.masked_cov);
- the scalar distance/score pools ([K, N] float32 — D× smaller than the
  latents), gathered for the sort that gives exact ``np.quantile``
  linear-interpolation semantics (``ref:08:109-112``). For N where even the
  pools must stay sharded, ``sharded_quantile`` reproduces the same
  semantics EXACTLY from psum'd histogram + count-bisection passes
  (parallel.encode.sharded_distance_histogram) without any gather.

Both fits return the same RadialFit / MapFit pytrees as the single-device
versions, so every consumer (config writer, calibration sweep, benchmark)
works unchanged; an 8-virtual-device test pins equality to tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anuraxla.detect.gaussian_map import MapFit
from anuraxla.detect.radial import RadialFit, _pairwise_dist
from anuraxla.ops.linalg import gaussian_log_likelihood, inv_and_logdet, regularize_cov
from anuraxla.ops.quantiles import masked_quantile
from anuraxla.parallel.mesh import pad_to_multiple

_HI = jax.lax.Precision.HIGHEST


def shard_species_latents(
    Z: np.ndarray, mask: np.ndarray, mesh: Mesh
) -> tuple[jax.Array, jax.Array]:
    """Place padded [K, Nmax, D] latents on the mesh with the sample axis
    sharded over 'data' (pad rows are masked out) — no chip ever holds the
    full latent matrix.

    Under a multi-process runtime (jax.distributed, mesh spanning hosts)
    ``device_put`` of a host array onto non-addressable devices is illegal;
    there, every process must hold the same full host copy (deterministic
    layout) and a callback materializes only the locally addressable shards.
    The fits themselves are host-count agnostic — their psums ride
    ICI within a host and DCN across (parallel.multihost)."""
    n_data = mesh.shape["data"]
    Zp, _ = pad_to_multiple(np.asarray(Z, np.float32), n_data, axis=1)
    mp, _ = pad_to_multiple(np.asarray(mask, bool), n_data, axis=1)
    sh_Z = NamedSharding(mesh, P(None, "data", None))
    sh_m = NamedSharding(mesh, P(None, "data"))
    if jax.process_count() > 1:
        Zd = jax.make_array_from_callback(Zp.shape, sh_Z, lambda idx: Zp[idx])
        md = jax.make_array_from_callback(mp.shape, sh_m, lambda idx: mp[idx])
    else:
        Zd = jax.device_put(Zp, sh_Z)
        md = jax.device_put(mp, sh_m)
    return Zd, md


def fit_radial_sharded(
    Z,
    mask,
    q_in,
    q_out,
    *,
    mesh: Mesh,
) -> RadialFit:
    """fit_radial over sample-sharded latents. Z: [K, Nmax, D] (host or
    device), mask: [K, Nmax]. Returns the same RadialFit as detect.radial
    (distance-pool shapes padded to a device-count multiple)."""
    Zd, md = shard_species_latents(Z, mask, mesh)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "data", None), P(None, "data")),
        out_specs=(P(), P(), P(None, "data"), P(None, "data"), P(None, "data")),
    )
    def _stats(Zs, ms):
        w = ms.astype(Zs.dtype)
        n_in = jax.lax.psum(jnp.sum(ms.astype(jnp.int32), axis=1), "data")  # [K]
        sums = jax.lax.psum(jnp.sum(Zs * w[..., None], axis=1), "data")
        mus = sums / jnp.maximum(n_in, 1).astype(Zs.dtype)[:, None]
        diff_in = Zs - mus[:, None, :]
        rho_in = jnp.sqrt(jnp.maximum(jnp.sum(diff_in * diff_in, axis=-1), 0.0))
        K, Ns, D = Zs.shape
        d_all = _pairwise_dist(Zs.reshape(K * Ns, D), mus).T  # [K, K·Ns]
        owner = jnp.repeat(jnp.arange(K), Ns)
        out_mask = ms.reshape(K * Ns)[None, :] & (owner[None, :] != jnp.arange(K)[:, None])
        return mus, n_in, rho_in, d_all, out_mask

    @jax.jit
    def _finish(Zd, md, q_in, q_out):
        mus, n_in, rho_in, d_all, out_mask = _stats(Zd, md)
        # quantiles need a global sort: only these scalar pools cross ICI
        rk_in = masked_quantile(rho_in, md, q_in)
        n_out = jnp.sum(out_mask, axis=1)
        rk_out = jnp.where(n_out > 0, masked_quantile(d_all, out_mask, q_out), jnp.inf)
        big = jnp.inf
        return RadialFit(
            centroids=mus.astype(jnp.float32),
            rk=jnp.minimum(rk_in, rk_out),
            rk_in=rk_in,
            rk_out=rk_out,
            rho_in_sorted=jnp.sort(jnp.where(md, rho_in, big), axis=1),
            n_in=n_in,
            rho_out_sorted=jnp.sort(jnp.where(out_mask, d_all, big), axis=1),
            n_out=n_out,
        )

    return _finish(Zd, md, jnp.asarray(q_in, jnp.float32), jnp.asarray(q_out, jnp.float32))


def fit_map_sharded(
    Z,
    mask,
    *,
    mesh: Mesh,
    cov_type: str = "lda",
    cov_structure: str = "full",
    priors_mode: str = "empirical",
    eps: float = 1e-6,
    shrink: float = 0.0,
    tau_q: float | None = None,
) -> MapFit:
    """fit_map over sample-sharded latents: psum'd means/priors and pooled
    (LDA) or per-class (QDA) covariance Grams; τ from exact-quantile over the
    gathered scalar score pool. Same MapFit pytree as detect.gaussian_map."""
    Zd, md = shard_species_latents(Z, mask, mesh)
    K, Npad, D = Zd.shape

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "data", None), P(None, "data")),
        out_specs=(P(), P(), P()),
    )
    def _moments(Zs, ms):
        w = ms.astype(Zs.dtype)
        n_k = jax.lax.psum(jnp.sum(w, axis=1), "data")  # [K] float
        means = jax.lax.psum(jnp.sum(Zs * w[..., None], axis=1), "data") / jnp.maximum(
            n_k, 1.0
        )[:, None]
        Zc = (Zs - means[:, None, :]) * w[..., None]
        gram_k = jax.lax.psum(
            jnp.einsum(
                "kni,knj->kij", Zc, Zc, preferred_element_type=jnp.float32, precision=_HI
            ),
            "data",
        )
        return means, n_k, gram_k

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "data", None), P(None, "data"), P(), P(), P(), P()),
        out_specs=(P("data"), P("data")),
    )
    def _scores(Zs, ms, means, precs, lds, log_priors):
        Kl, Ns, Dl = Zs.shape
        ll = gaussian_log_likelihood(Zs.reshape(Kl * Ns, Dl), means, precs, lds)
        owner = jnp.repeat(jnp.arange(Kl), Ns)
        s = ll[jnp.arange(Kl * Ns), owner] + log_priors[owner]
        return s, ms.reshape(Kl * Ns)

    @jax.jit
    def _finish(Zd, md):
        means, n_k, gram_k = _moments(Zd, md)
        total = jnp.maximum(jnp.sum(n_k), 1.0)
        priors = (
            jnp.full((K,), 1.0 / K, Zd.dtype) if priors_mode == "uniform" else n_k / total
        )
        diag_only = cov_structure == "diag"
        eye = jnp.eye(D, dtype=Zd.dtype)
        if cov_type == "lda":
            # pooled-centered cov, divisor N_total − 1 (masked_cov semantics)
            cov = jnp.sum(gram_k, axis=0) / jnp.maximum(total - 1.0, 1.0)
            cov = jnp.where(total >= 2.0, cov, eye)
            cov = regularize_cov(cov, eps=eps, shrink=shrink, diag_only=diag_only)
            prec, ld = inv_and_logdet(cov)
            covs = jnp.broadcast_to(cov, (K, D, D))
            precs = jnp.broadcast_to(prec, (K, D, D))
            logdets = jnp.broadcast_to(ld, (K,))
        else:
            covs = gram_k / jnp.maximum(n_k - 1.0, 1.0)[:, None, None]
            covs = jnp.where((n_k >= 2.0)[:, None, None], covs, eye[None])
            covs = regularize_cov(covs, eps=eps, shrink=shrink, diag_only=diag_only)
            precs, logdets = inv_and_logdet(covs)

        log_priors = jnp.log(priors + 1e-12)
        scores_true, flat_mask = _scores(Zd, md, means, precs, logdets, log_priors)
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

    return _finish(Zd, md)


def sharded_quantile(
    d,
    mask,
    q: float,
    *,
    mesh: Mesh,
    n_bins: int = 8192,
    n_refine: int = 2,
    empty_fill: float = np.inf,
    max_bisect: int = 160,
) -> jax.Array:
    """EXACT global quantile (``np.quantile`` linear-interpolation semantics,
    ``ref:08_fit_radial_detector.py:109-112``) of sharded per-species pools
    without gathering even the scalar pool. d, mask: [K, N] sharded on
    axis 1 -> [K].

    Three phases, all O(N/devices) per pass with only [K]- or [n_bins]-sized
    psums crossing ICI:

    1. psum'd-histogram refinement (``n_refine`` passes, each narrowing the
       bracket around the rank-⌊q·(n−1)⌋ order statistic n_bins-fold; the
       chosen bin is widened by one on each side so float binning error can
       never break the bracket invariant);
    2. count-threshold bisection (lax.while_loop): maintains
       count(x ≤ lo) ≤ r1 < count(x ≤ hi) and exits as soon as
       min{x > lo} is provably the exact order statistic x_(r1) — the exit
       test IS the exactness certificate, so ties and adversarially close
       values cannot produce a wrong answer, only extra iterations
       (``max_bisect`` bounds the pathological case);
    3. exact finish: s1 = x_(r1) = min{x > lo}; s2 = x_(r1+1) = s1 when the
       rank-(r1+1) sample ties s1 else min{x > s1}; result
       s1·(1−frac) + s2·frac — the same order statistics and the same
       interpolation arithmetic as ops.quantiles, so it matches
       ``masked_quantile`` to within 1 ulp (XLA may fuse the final
       multiply-add differently between the two graphs).

    Empty pools return ``empty_fill``. The right fill is caller convention:
    +inf reproduces the rk_out wrapper's never-constrain semantics
    (parallel.fit's rk_out maps empty→inf); 0.0 reproduces the reference's
    ``quantile_safe`` empty→0 convention used for rk_in-style pools
    (``ref:08:109-112``) — pick explicitly, the two disagree about whether
    an empty pool means always- or never-accept.

    Production fits use the exact sort path; this is the escape hatch for
    N too large to gather even scalars, now with identical semantics.
    """
    from anuraxla.parallel.encode import sharded_distance_histogram

    hist = sharded_distance_histogram(mesh, n_bins=n_bins)
    K = d.shape[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P()),
        out_specs=(P(), P()),
    )
    def _count_le_min_above(dk, mk, t):
        """Per row k: (count(x ≤ t_k), min{x > t_k} or +inf) in one pass —
        a psum'd count plus a pmax'd (negated) min; both exact, no binning."""
        le = jax.lax.psum(
            jnp.sum((mk & (dk <= t[:, None])).astype(jnp.int32), axis=1), "data"
        )
        above = jnp.where(mk & (dk > t[:, None]), dk, jnp.inf)
        mn = -jax.lax.pmax(-jnp.min(above, axis=1), "data")
        return le, mn

    @jax.jit
    def _all(d, mask):
        valid = jnp.where(mask, d, jnp.inf)
        lo0 = jnp.min(valid, axis=1)  # [K]
        hi0 = jnp.max(jnp.where(mask, d, -jnp.inf), axis=1)
        n = jnp.sum(mask, axis=1)  # [K]
        pos = q * jnp.maximum(n - 1, 0).astype(jnp.float32)
        r1 = jnp.floor(pos).astype(jnp.int32)  # [K]
        frac = pos - r1.astype(jnp.float32)
        # f(lo) ≤ r1 needs lo strictly below the pool minimum
        lo_init = lo0 - jnp.maximum(jnp.abs(lo0) * 1e-3, 1e-3)

        def refine(carry, _):
            lo, hi = carry
            bins = jnp.stack(
                [jnp.cumsum(hist(d[k], mask[k], lo[k], hi[k])) for k in range(K)]
            )  # [K, n_bins]
            b = jnp.argmax(bins > r1[:, None].astype(jnp.float32), axis=1)
            width = jnp.maximum(hi - lo, 1e-12) / n_bins
            # ±1-bin safety margin: float binning may misplace edge samples
            return (
                jnp.maximum(lo + (b - 1) * width, lo),
                jnp.minimum(lo + (b + 2) * width, hi),
            ), None

        (lo, hi), _ = jax.lax.scan(refine, (lo_init, hi0), None, length=n_refine)
        # exact-count validation of the refined bracket: float binning (or a
        # zero-width pool, n=1) can collapse an endpoint past the order
        # statistic; fall back to the always-valid initial endpoint so the
        # bisection invariant f(lo) ≤ r1 < f(hi) holds unconditionally
        c_lo, _ = _count_le_min_above(d, mask, lo)
        lo = jnp.where(c_lo <= r1, lo, lo_init)
        c_hi, _ = _count_le_min_above(d, mask, hi)
        hi = jnp.where(c_hi >= r1 + 1, hi, hi0)

        # Loop state carries the exactness certificate (s = min{x > lo},
        # c_s = count(x ≤ s)) instead of the cond re-deriving it: the cond
        # becomes pass-free and each iteration costs TWO data passes
        # (count/min at the midpoint + count at the new s) instead of three
        # — _count_le_min_above returns both the count and the min-above in
        # one pass, so the midpoint's s comes free when the bisection takes
        # the lower half.
        _, s0 = _count_le_min_above(d, mask, lo)
        c_s0, _ = _count_le_min_above(d, mask, s0)

        def cond(state):
            lo, hi, s, c_s, it = state
            exact = c_s >= r1 + 1  # min{x>lo} already IS x_(r1)
            return jnp.logical_and(it < max_bisect, ~jnp.all(exact | (n == 0)))

        def body(state):
            lo, hi, s, c_s, it = state
            m = 0.5 * (lo + hi)
            c_m, s_m = _count_le_min_above(d, mask, m)
            take_lo = c_m <= r1
            s_new = jnp.where(take_lo, s_m, s)
            c_new, _ = _count_le_min_above(d, mask, s_new)
            return (
                jnp.where(take_lo, m, lo),
                jnp.where(take_lo, hi, m),
                s_new,
                c_new,
                it + 1,
            )

        lo, hi, s1, c_s1, _ = jax.lax.while_loop(
            cond, body, (lo, hi, s0, c_s0, jnp.int32(0))
        )
        # s1 = min{x > lo} = x_(r1) (exact on loop exit); one more pass for
        # its successor order statistic
        _, above_s1 = _count_le_min_above(d, mask, s1)
        s2 = jnp.where(c_s1 >= r1 + 2, s1, above_s1)  # x_(r1+1)
        res = jnp.where(frac > 0, s1 * (1.0 - frac) + s2 * frac, s1)
        return jnp.where(n > 0, res, jnp.float32(empty_fill))

    return _all(d, mask)


def sharded_quantile_approx(d, mask, q, *, mesh, n_bins=8192, n_refine=2, **kw):
    """Backward-compatible alias — the escape hatch is exact now."""
    return sharded_quantile(d, mask, q, mesh=mesh, n_bins=n_bins, n_refine=n_refine, **kw)
