"""Device mesh + sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md §2.3: no
torch.distributed, no multiprocessing anywhere); its capability ceiling is one
CPU. The TPU-native equivalent of "more throughput" is SPMD over a device
mesh: batch-shard the encode/benchmark path over a ``data`` axis (ICI
collectives only), and optionally shard the VAE's wide dense layers over a
``model`` axis for the training step. These helpers centralize mesh/sharding
construction for pipeline, training, and the multi-chip dry run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    model_axis: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh over the local devices.

    model_axis=1 gives pure data parallelism (the right default for this
    workload's small model); model_axis>1 carves a tensor-parallel axis for
    the dense bottleneck.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available"
            )
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.asarray(devs).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def jit_batch_sharded(fn, *, mesh: Optional[Mesh] = None, batch_size: Optional[int] = None):
    """jit ``fn(params, batch)`` with the batch sharded over mesh['data'] and
    params replicated — the one place this construction lives (used by both
    parallel.encode and pipeline.session). Returns (jitted_fn, replicated
    sharding, mesh). Validates batch divisibility when batch_size is given."""
    mesh = mesh or make_mesh()
    if batch_size is not None and batch_size % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch_size {batch_size} must divide by the data axis "
            f"({mesh.shape['data']} devices)"
        )
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(fn, in_shardings=(repl, batch_sh), out_shardings=batch_sh)
    return jitted, repl, mesh


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> tuple[np.ndarray, int]:
    """Pad axis 0 to a device-count multiple (SPMD needs even shards).
    Returns (padded, original_length)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.pad(x, pad_width), n
