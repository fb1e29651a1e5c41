"""Fit orchestration: encode a training tree, fit a detector on device, and
persist the reference-schema config block. Shared by the fit-radial /
fit-map CLIs and the calibration grid.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anuraxla import config as cfgmod
from anuraxla.detect.gaussian_map import fit_map, true_class_score_summary
from anuraxla.detect.radial import fit_radial
from anuraxla.ops.quantiles import quantile_sorted
from anuraxla.pipeline.session import EncoderSession, encode_species_tree, pad_species_latents


def _f(x) -> float:
    return float(np.asarray(x))


def _use_sharded_fit(session: EncoderSession) -> bool:
    """Data-parallel sessions keep the fit sample-sharded over the mesh too
    (latents never gather onto one chip — parallel.fit)."""
    return bool(session.data_parallel) and len(jax.devices()) > 1


def _fit_radial_dispatch(session, Z, mask, q_in, q_out):
    if _use_sharded_fit(session):
        from anuraxla.parallel.fit import fit_radial_sharded
        from anuraxla.parallel.mesh import make_mesh

        return fit_radial_sharded(Z, mask, q_in, q_out, mesh=make_mesh())
    return fit_radial(jnp.asarray(Z), jnp.asarray(mask), q_in, q_out)


def _fit_map_dispatch(session, Z, mask, **kw):
    if _use_sharded_fit(session):
        from anuraxla.parallel.fit import fit_map_sharded
        from anuraxla.parallel.mesh import make_mesh

        return fit_map_sharded(Z, mask, mesh=make_mesh(), **kw)
    return fit_map(jnp.asarray(Z), jnp.asarray(mask), **kw)


def encode_augmented_tree(
    session: EncoderSession,
    chunks_dir: Path,
    species_all,
    *,
    augment_noise_db,
    cache: bool,
    cache_dir: Optional[Path],
    max_per_class: int,
    seed: int,
    log=print,
):
    """Clean encode plus one noised encode per SNR in ``augment_noise_db``,
    concatenated per species — the fit then sees each training chunk once
    clean and once per noise level, so thresholds/covariances absorb the
    latent shift noise causes instead of rejecting it (the engineered answer
    to the r4 finding that RETHRESHOLDING alone cannot rescue the radial
    detector at 14 dB: noised latents sit outside any rk the clean-accuracy
    constraint allows). Each noised leg replays the clean leg's subsampling
    (fresh rng, same seed) so clean/noised pools cover the SAME files, and
    caches under its own ``_nz<db>`` suffix."""
    Z_by, failed, used = encode_species_tree(
        session, chunks_dir, species_all,
        cache=cache, cache_dir=cache_dir, max_per_class=max_per_class,
        seed=seed, log=log,
    )
    for db in augment_noise_db or ():
        session.add_noise_db = float(db)
        session._fingerprint = None  # the cache key embeds the noise config
        try:
            log(f"🌫️ augment: re-encoding at {db:g} dB SNR")
            Zn, f2, u2 = encode_species_tree(
                session, chunks_dir, species_all,
                cache=cache, cache_dir=cache_dir, max_per_class=max_per_class,
                seed=seed, cache_tag=f"_nz{db:g}", log=log,
            )
        finally:
            session.add_noise_db = None
            session._fingerprint = None
        for sp, Zn_sp in Zn.items():
            Z_by[sp] = (
                np.concatenate([Z_by[sp], Zn_sp]) if sp in Z_by else Zn_sp
            )
            failed[sp] = failed.get(sp, 0) + f2.get(sp, 0)
            used[sp] = used.get(sp, 0) + u2.get(sp, 0)
    return Z_by, failed, used


def fit_radial_tree(
    *,
    cfg_path: Path,
    cfg: Dict[str, Any],
    chunks_dir: Path,
    session: EncoderSession,
    q_in: float,
    q_out: float,
    cache: bool,
    cache_dir: Optional[Path],
    max_per_class: int,
    seed: int,
    augment_noise_db=None,
    log=print,
) -> Dict[str, Any]:
    """Full 08-equivalent: encode -> fit -> write config. Returns the fitted
    per-species numbers (also printed in the 9105-parseable ✅ format).
    ``augment_noise_db``: see :func:`encode_augmented_tree`."""
    species_all = cfgmod.require_species(cfg)
    Z_by, failed, used = encode_augmented_tree(
        session, chunks_dir, species_all, augment_noise_db=augment_noise_db,
        cache=cache, cache_dir=cache_dir, max_per_class=max_per_class, seed=seed, log=log,
    )
    if not Z_by:
        raise SystemExit("❌ no species could be encoded — check --root and the pipeline.")

    species, Z, mask = pad_species_latents(Z_by)
    fit = _fit_radial_dispatch(session, Z, mask, q_in, q_out)

    # per-species meta with rho summaries (reference meta_fit shape,
    # 08:544-553), derived from the fit's sorted distance pools — the
    # distances were already computed on device, no host recompute
    def pool_summary(sorted_pool, n_valid):
        sp_arr = np.asarray(sorted_pool)  # [K, N] ascending, +inf padded
        n = np.asarray(n_valid).astype(int)
        qs = np.asarray(
            jax.vmap(lambda q: quantile_sorted(jnp.asarray(sp_arr), q, jnp.asarray(n)))(
                jnp.asarray([0.5, 0.9], jnp.float32)
            )
        )  # [2, K]
        empty = n == 0
        last = np.clip(n - 1, 0, sp_arr.shape[1] - 1)
        return {
            "min": np.where(empty, np.nan, sp_arr[:, 0]),
            "p50": np.where(empty, np.nan, qs[0]),
            "p90": np.where(empty, np.nan, qs[1]),
            "max": np.where(empty, np.nan, sp_arr[np.arange(sp_arr.shape[0]), last]),
        }

    in_summary = pool_summary(fit.rho_in_sorted, fit.n_in)
    out_summary = pool_summary(fit.rho_out_sorted, fit.n_out)

    meta: Dict[str, Dict[str, Any]] = {}
    rk_in = np.asarray(fit.rk_in)
    rk_out = np.asarray(fit.rk_out)
    rk = np.asarray(fit.rk)
    n_in = np.asarray(fit.n_in)
    n_out = np.asarray(fit.n_out)
    for i, sp in enumerate(species):
        meta[sp] = {
            "N_in": int(n_in[i]),
            "N_out": int(n_out[i]),
            "rk_in": _f(rk_in[i]),
            "rk_out": (_f(rk_out[i]) if math.isfinite(_f(rk_out[i])) else None),
            "rk_final": _f(rk[i]),
            "failed": int(failed.get(sp, 0)),
            "used": int(used.get(sp, n_in[i])),
            "rho_in_summary": {k: _f(v[i]) for k, v in in_summary.items()},
            "rho_out_summary": {k: _f(v[i]) for k, v in out_summary.items()},
        }
        rk_out_print = _f(rk_out[i]) if math.isfinite(_f(rk_out[i])) else float("nan")
        # exact line format consumed by the snapshot-from-log regex (9105:11-13)
        log(f"✅ {sp}: rk_in={_f(rk_in[i]):.6f} | rk_out={rk_out_print:.6f} | rk={_f(rk[i]):.6f}")
        log(f"   rho_in:  {meta[sp]['rho_in_summary']}")
        log(f"   rho_out: {meta[sp]['rho_out_summary']}")

    backup = cfgmod.write_radial(
        cfg_path, cfg, species, np.asarray(fit.centroids), rk,
        chunks_dir=chunks_dir, mel=session.mel, q_in=q_in, q_out=q_out,
        max_per_class=max_per_class, seed=seed, per_species_meta=meta,
        augment_noise_db=augment_noise_db,
    )
    log(f"\n💾 saved: {cfg_path}")
    log(f"🗂️ backup: {backup}")
    return {"species": species, "rk": rk, "rk_in": rk_in, "rk_out": rk_out, "meta": meta, "fit": fit,
            "Z": Z, "mask": mask}


def fit_map_tree(
    *,
    cfg_path: Path,
    cfg: Dict[str, Any],
    chunks_dir: Path,
    session: EncoderSession,
    cov_type: str,
    cov_structure: str,
    priors_mode: str,
    eps: float,
    shrink: float,
    tau_q: Optional[float],
    cache: bool,
    cache_dir: Optional[Path],
    max_per_class: int,
    seed: int,
    augment_noise_db=None,
    log=print,
) -> Dict[str, Any]:
    """Full 08b-equivalent: encode -> MAP fit -> write config.
    ``augment_noise_db``: see :func:`encode_augmented_tree`."""
    species_all = cfgmod.require_species(cfg)
    Z_by, failed, used = encode_augmented_tree(
        session, chunks_dir, species_all, augment_noise_db=augment_noise_db,
        cache=cache, cache_dir=cache_dir, max_per_class=max_per_class, seed=seed, log=log,
    )
    if not Z_by:
        raise SystemExit("❌ no species could be encoded — check --root and the pipeline.")

    # the reference fits over sorted(species_present) (08b:258)
    Z_by = {sp: Z_by[sp] for sp in sorted(Z_by)}
    species, Z, mask = pad_species_latents(Z_by)
    # D >> n guard: with fewer samples than latent dims per class, a FULL
    # pooled covariance is rank-deficient — train-class scores blow up and a
    # tau fit on them rejects ~everything at eval (100% NO_DETECT). The
    # reference ships eps/shrink knobs for exactly this
    # (ref:08b_fit_map_detector.py:60-81); point the user at them.
    D = Z.shape[2]
    min_n = int(mask.sum(1).min())
    if cov_structure == "full" and min_n < D and shrink < 0.05:
        log(
            f"⚠️ small-n regime: min class size {min_n} < latent dim {D} with "
            f"cov_structure=full and shrink={shrink}. The fitted detector will "
            "likely reject every input once tau is set. Use `--preset small-n` "
            "(diag + shrink 0.1) or raise --shrink/--eps."
        )
    fit = _fit_map_dispatch(
        session, Z, mask,
        cov_type=cov_type, cov_structure=cov_structure, priors_mode=priors_mode,
        eps=eps, shrink=shrink, tau_q=tau_q,
    )

    summaries = true_class_score_summary(fit, jnp.asarray(Z), jnp.asarray(mask))
    per_meta: Dict[str, Dict[str, Any]] = {}
    n_k = mask.sum(1)
    priors = np.asarray(fit.priors)
    for i, sp in enumerate(species):
        per_meta[sp] = {
            "N": int(n_k[i]),
            "failed": int(failed.get(sp, 0)),
            "used": int(used.get(sp, n_k[i])),
            "prior": _f(priors[i]),
            "score_true_summary": {k: _f(np.asarray(v)[i]) for k, v in summaries.items()},
        }

    sts = np.asarray(fit.scores_true_sorted)
    n_scores = int(np.asarray(fit.n_scores))
    valid_scores = sts[:n_scores]
    global_summary = {
        "min": _f(valid_scores.min()) if n_scores else float("nan"),
        "p05": _f(np.quantile(valid_scores, 0.05)) if n_scores else float("nan"),
        "p50": _f(np.quantile(valid_scores, 0.50)) if n_scores else float("nan"),
        "p95": _f(np.quantile(valid_scores, 0.95)) if n_scores else float("nan"),
        "max": _f(valid_scores.max()) if n_scores else float("nan"),
    }

    tau_val = None if tau_q is None else _f(fit.tau)
    if tau_val is not None:
        log(f"\n✅ tau from train: tau = quantile(score_true_class, q={tau_q}) = {tau_val:.6f}")

    backup = cfgmod.write_map(
        cfg_path, cfg, species,
        np.asarray(fit.means), np.asarray(fit.covs), np.asarray(fit.precisions),
        np.asarray(fit.logdets), priors, tau_val,
        cov_type=cov_type, cov_structure=cov_structure, priors_mode=priors_mode,
        chunks_dir=chunks_dir, mel=session.mel, max_per_class=max_per_class, seed=seed,
        eps=eps, shrink=shrink, tau_q=tau_q,
        score_true_global_summary=global_summary, per_species_meta=per_meta,
        augment_noise_db=augment_noise_db,
    )
    log(f"\n💾 saved: {cfg_path}")
    log(f"🗂️ backup: {backup}")
    log("\n✅ MAP detector fit done. (NO_DETECT is decided via tau at evaluation.)")
    return {"species": species, "fit": fit, "meta": per_meta, "Z": Z, "mask": mask}
