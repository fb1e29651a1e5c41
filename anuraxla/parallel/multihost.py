"""Multi-host (DCN) data parallelism for fleet-scale encoding/scanning.

The reference is a single-process CPU pipeline (SURVEY.md §2.3); one TPU
host already covers its workload thousands of times over. Scaling past one
host (multi-TPU-pod soundscape fleets) is still embarrassingly data-parallel
at the *file* level, so the design keeps DCN traffic near zero:

- each host decodes + encodes only its shard of the WAV list (round-robin,
  deterministic — no coordinator needed beyond jax.distributed init);
- encode stays host-local (the batch-sharded jit runs on the host's local
  devices; nothing crosses DCN);
- only the detector-fit moments cross hosts: the psum'd per-class
  counts/sums/Gram matrices and scalar distance pools of ``parallel.fit``
  run over the GLOBAL mesh, where XLA routes the reductions ICI-within-host,
  DCN-across-hosts (a few MB total, once per fit).

On a single process everything degrades to the local mesh — all helpers are
no-ops or equivalents, which is what the tests pin (real multi-host needs a
pod; the math that crosses hosts is the same psum already tested on the
8-virtual-device mesh).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax

from anuraxla.parallel.mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize wrapper. Returns True when a multi-process
    runtime was initialized, False for the single-process no-op (no
    coordinator given and no cluster env detected)."""
    if coordinator_address is None and num_processes is None:
        # Single host unless a cluster environment auto-detects (GKE/TPU pod
        # metadata); jax.distributed.initialize() with no args would try to
        # auto-detect, but off-cluster it raises — treat that as single-host.
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(model_axis: int = 1):
    """('data', 'model') mesh over ALL devices in the job (global across
    hosts under jax.distributed; identical to make_mesh on one host).
    Host-crossing collectives on the 'data' axis ride DCN; within a host
    they stay on ICI — the layout parallel.fit's psums need."""
    return make_mesh(model_axis=model_axis)


def shard_paths_for_host(
    paths: Sequence[Path],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list:
    """Deterministic round-robin shard of a file list: host i takes
    paths[i::n]. Disjoint, covering, and balanced to within one file —
    every host computes its shard independently from the same sorted list,
    so no coordination messages are needed."""
    i = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n <= 1:
        return list(paths)
    return list(paths)[i::n]
