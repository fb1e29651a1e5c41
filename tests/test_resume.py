"""Checkpoint/resume: orbax train-state save -> restore -> continue."""

import numpy as np
import jax
import jax.numpy as jnp

from anuraxla.models.checkpoint import restore_train_state, save_train_state
from anuraxla.models.train import TrainConfig, create_train_state, make_train_step, train_loop
from anuraxla.models.vae import VAEConfig

SMALL = VAEConfig(latent_dim=8, widths=(8,), dense_width=16, groups=4, input_hw=(16, 16))


def test_save_restore_continue(tmp_path, rng):
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, beta=0.1, seed=0)
    batch = rng.standard_normal((4, 16, 16, 1)).astype(np.float32)

    vae, state = create_train_state(SMALL, tc)
    step = jax.jit(make_train_step(vae, tc.beta))
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, _ = step(state, jnp.asarray(batch), key)
    save_train_state(tmp_path / "ckpt", state)

    _, template = create_train_state(SMALL, tc)
    restored = restore_train_state(tmp_path / "ckpt", template)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restored state matches continuing from the original
    s1, m1 = step(state, jnp.asarray(batch), key)
    s2, m2 = step(restored, jnp.asarray(batch), key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)

    # train_loop accepts the restored state
    _, s3, _ = train_loop(
        SMALL, tc, iter([batch, batch]), num_steps=2, log_every=0, initial_state=restored
    )
    assert int(s3.step) == 5
