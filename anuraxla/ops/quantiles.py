"""Quantiles with ``np.quantile`` (linear interpolation) semantics under jit.

The reference's threshold math is built on ``np.quantile`` (e.g.
``08_fit_radial_detector.py:109-112``); these kernels reproduce it exactly,
add masking for ragged per-species sample counts under fixed-shape jit, and
vectorize over a whole grid of q values — the op that turns the reference's
4-subprocess q_out calibration grid into one on-device sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantile_sorted(x_sorted: jax.Array, q: jax.Array, n_valid: jax.Array | int) -> jax.Array:
    """Linear-interpolated quantile(s) of pre-sorted data.

    x_sorted: [..., N] ascending, with invalid entries sorted to the end
    (pad with +inf before sorting). ``n_valid`` counts valid entries
    (broadcastable to x_sorted[..., 0]). q may be scalar or any shape; result
    has shape broadcast(q, batch dims of x_sorted).
    """
    n_valid = jnp.asarray(n_valid)
    pos = q * (n_valid - 1).astype(jnp.float32)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x_sorted.shape[-1] - 1)
    hi = jnp.clip(lo + 1, 0, x_sorted.shape[-1] - 1)
    frac = pos - lo.astype(jnp.float32)
    x_lo = jnp.take_along_axis(x_sorted, lo[..., None], axis=-1)[..., 0]
    x_hi = jnp.take_along_axis(x_sorted, hi[..., None], axis=-1)[..., 0]
    # last valid index when hi would step past n_valid-1
    hi_oob = hi.astype(jnp.float32) > (n_valid - 1).astype(jnp.float32)
    x_hi = jnp.where(hi_oob, x_lo, x_hi)
    return x_lo * (1.0 - frac) + x_hi * frac


def masked_quantile(x: jax.Array, mask: jax.Array, q: jax.Array) -> jax.Array:
    """np.quantile(x[mask], q) for each batch row, fixed-shape.

    x, mask: [..., N]; q: a scalar or 1-D [Q] vector — every batch row gets
    the SAME quantile set, appended as a trailing axis (batched per-row q is
    not supported; it would need a different vmap axis pairing). Rows with
    zero valid entries return 0.0 (the reference's ``quantile_safe``
    empty-input convention, ``08_fit_radial_detector.py:109-112``).
    """
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    x_sorted = jnp.sort(jnp.where(mask, x, big), axis=-1)
    n_valid = jnp.sum(mask, axis=-1)
    q = jnp.asarray(q, dtype=jnp.float32)
    if q.ndim > 1:
        raise ValueError(
            f"masked_quantile supports scalar or 1-D q, got shape {q.shape}"
        )
    if q.ndim == 0:
        out = quantile_sorted(x_sorted, q, n_valid)
        return jnp.where(n_valid > 0, out, 0.0)
    out = jax.vmap(lambda qq: quantile_sorted(x_sorted, qq, n_valid), out_axes=-1)(
        q.reshape(-1)
    )
    out = jnp.where((n_valid > 0)[..., None], out, 0.0)
    return out.reshape(*out.shape[:-1], *q.shape)
