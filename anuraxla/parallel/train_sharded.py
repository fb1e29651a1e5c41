"""Multi-chip VAE training: data parallelism over the mesh 'data' axis with
optional tensor parallelism over 'model' for the dense bottleneck.

The reference has no distributed training (or any training) at all; this is
the TPU-native scale-out of anuraxla.models.train: batches sharded over
'data', parameters replicated (or dense kernels sharded over 'model'), and
XLA's sharding propagation inserting the gradient all-reduces over ICI —
no hand-written collectives in the step function.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anuraxla.models.train import TrainConfig, create_train_state, make_train_step
from anuraxla.models.vae import VAEConfig
from anuraxla.parallel.mesh import make_mesh


def param_sharding_rules(mesh: Mesh):
    """Pytree of NamedShardings for a TrainState: 2-D kernels with both dims
    ≥128 and the output dim divisible by the 'model' axis get tensor-sharded
    on that output dim (the flatten->dense bottleneck is the only big matmul);
    everything else is replicated. With model_axis=1 this degrades to pure
    replication (plain DP)."""
    model_size = mesh.shape["model"]

    def rule(leaf):
        if (
            model_size > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and min(leaf.shape) >= 128
            and leaf.shape[1] % model_size == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return rule


def shard_state(state, mesh: Mesh):
    rule = param_sharding_rules(mesh)
    shardings = jax.tree.map(rule, state)
    return jax.device_put(state, shardings), shardings


def make_sharded_train_step(vae, beta: float, mesh: Mesh, state_shardings,
                            kl_warmup_steps: int = 0, kl_delay_steps: int = 0):
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    step = make_train_step(vae, beta, kl_warmup_steps, kl_delay_steps)
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_sh, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )


def train_loop_sharded(
    cfg: VAEConfig,
    tc: TrainConfig,
    batch_iter: Iterator[np.ndarray],
    *,
    num_steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    model_axis: int = 1,
    log_every: int = 50,
    log_fn=print,
):
    """Sharded twin of models.train.train_loop. Batches must be divisible by
    the 'data' axis size (the host loader pads fixed batches, so they are)."""
    mesh = mesh or make_mesh(model_axis=model_axis)
    vae, state = create_train_state(cfg, tc)
    state, state_shardings = shard_state(state, mesh)
    step_fn = make_sharded_train_step(vae, tc.beta, mesh, state_shardings,
                                     tc.kl_warmup_steps, tc.kl_delay_steps)
    batch_sh = NamedSharding(mesh, P("data"))

    rng = jax.random.PRNGKey(tc.seed + 1)
    n = num_steps if num_steps is not None else tc.total_steps
    metrics = {}
    for i, batch in enumerate(batch_iter):
        if i >= n:
            break
        batch = jax.device_put(jnp.asarray(batch), batch_sh)
        state, metrics = step_fn(state, batch, rng)
        if log_every and (i % log_every == 0):
            m = {k: float(v) for k, v in metrics.items()}
            log_fn(
                f"step {i} [{mesh.shape['data']}dp x {mesh.shape['model']}tp]: "
                f"loss={m['loss']:.4f} recon={m['recon']:.4f} kl={m['kl']:.4f}"
            )
            from anuraxla.utils.metrics import log_metrics

            log_metrics(
                {"kind": "train", "dp": mesh.shape["data"], "tp": mesh.shape["model"], **m},
                step=i,
            )
    return vae, state, {k: float(v) for k, v in metrics.items()}
