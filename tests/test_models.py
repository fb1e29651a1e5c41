"""VAE model, training, checkpointing, and torch-ingest parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anuraxla.models.vae import (
    ConvVAE,
    VAEConfig,
    encoder_params_from_vae,
    init_encoder,
    init_vae,
)

SMALL = VAEConfig(latent_dim=16, widths=(8, 16), dense_width=32, groups=4, input_hw=(48, 32))


def test_encoder_shapes_and_determinism(rng):
    enc, params = init_encoder(SMALL, seed=0)
    x = jnp.asarray(rng.standard_normal((3, 48, 32, 1)), jnp.float32)
    out = enc.apply(params, x)
    assert out["z"].shape == (3, 16)
    assert out["mu"].shape == (3, 16)
    assert out["logvar"].shape == (3, 16)
    np.testing.assert_array_equal(np.asarray(out["z"]), np.asarray(out["mu"]))  # eval: z == mu
    out2 = enc.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out["z"]), np.asarray(out2["z"]))


def test_vae_roundtrip_shapes(rng):
    vae, params = init_vae(SMALL, seed=0)
    x = jnp.asarray(rng.standard_normal((2, 48, 32, 1)), jnp.float32)
    out = vae.apply(params, x, rng=jax.random.PRNGKey(1))
    assert out["recon"].shape == x.shape
    # sampled z differs from mu under an rng
    assert not np.allclose(np.asarray(out["z"]), np.asarray(out["mu"]))


def test_encoder_subtree_extraction(rng):
    vae, params = init_vae(SMALL, seed=0)
    enc_params = encoder_params_from_vae(params)
    from anuraxla.models.vae import ConvVAEEncoder

    enc = ConvVAEEncoder(SMALL)
    x = jnp.asarray(rng.standard_normal((2, 48, 32, 1)), jnp.float32)
    z_direct = enc.apply(enc_params, x)["mu"]
    z_full = vae.apply(params, x)["mu"]
    np.testing.assert_allclose(np.asarray(z_direct), np.asarray(z_full), atol=1e-6)


def test_train_step_reduces_loss(rng):
    from anuraxla.models.train import TrainConfig, create_train_state, make_train_step, vae_loss

    tc = TrainConfig(learning_rate=3e-3, warmup_steps=2, total_steps=60, beta=0.01, seed=0)
    vae, state = create_train_state(SMALL, tc)
    batch = jnp.asarray(rng.standard_normal((8, 48, 32, 1)), jnp.float32)
    step = jax.jit(make_train_step(vae, tc.beta))
    key = jax.random.PRNGKey(0)
    loss0 = float(vae_loss(vae, state.params, batch, key, tc.beta)[0])
    for _ in range(30):
        state, metrics = step(state, batch, key)
    loss1 = float(metrics["loss"])
    assert loss1 < loss0, (loss0, loss1)


def test_kl_delay_and_ramp_schedule(rng):
    """beta_t must be EXACTLY 0 through kl_delay_steps, then ramp linearly to
    beta over kl_warmup_steps (the hard delay protects latent geometry —
    models.train.TrainConfig docstring has the measured numbers). Recovered
    per step from the loss decomposition: beta_t = (loss - recon)/kl."""
    from anuraxla.models.train import TrainConfig, create_train_state, make_train_step

    tc = TrainConfig(learning_rate=1e-4, warmup_steps=2, total_steps=12,
                     beta=0.5, kl_delay_steps=3, kl_warmup_steps=4, seed=0)
    vae, state = create_train_state(SMALL, tc)
    batch = jnp.asarray(rng.standard_normal((4, 48, 32, 1)), jnp.float32)
    step = jax.jit(make_train_step(vae, tc.beta, tc.kl_warmup_steps, tc.kl_delay_steps))
    key = jax.random.PRNGKey(0)
    betas = []
    for _ in range(9):
        state, m = step(state, batch, key)
        betas.append((float(m["loss"]) - float(m["recon"])) / float(m["kl"]))
    # steps 0,1,2 inside the delay; then (i+1-3)/4 * 0.5; capped at beta
    expect = [0.0, 0.0, 0.0, 0.125, 0.25, 0.375, 0.5, 0.5, 0.5]
    np.testing.assert_allclose(betas, expect, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, rng):
    from anuraxla.models.checkpoint import load_encoder, save_encoder

    enc, params = init_encoder(SMALL, seed=3)
    save_encoder(tmp_path / "enc_v0", SMALL, params)
    enc2, params2, cfg2 = load_encoder(tmp_path / "enc_v0")
    assert cfg2 == SMALL
    x = jnp.asarray(rng.standard_normal((2, 48, 32, 1)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(enc.apply(params, x)["mu"]),
        np.asarray(enc2.apply(params2, x)["mu"]),
        atol=0,
    )


def test_load_or_init_encoder_fallback(tmp_path):
    from anuraxla.models.checkpoint import load_or_init_encoder

    enc, params, cfg = load_or_init_encoder(None, tmp_path, allow_init=True, seed=0)
    assert cfg.latent_dim == VAEConfig().latent_dim
    with pytest.raises(FileNotFoundError):
        load_or_init_encoder(None, tmp_path, allow_init=False)


def test_torch_ingest_bit_parity(rng):
    """Converted torch twin weights must reproduce Flax latents (the
    'checkpoint-ingest path ... bit-compatibly' requirement, SURVEY.md §2.2)."""
    torch = pytest.importorskip("torch")
    from anuraxla.models.ingest import torch_state_dict_to_flax, torch_twin_encoder
    from anuraxla.models.vae import ConvVAEEncoder

    twin = torch_twin_encoder(SMALL).eval()
    sd = twin.state_dict()
    flax_params = torch_state_dict_to_flax(sd, SMALL)

    x = rng.standard_normal((2, 48, 32, 1)).astype(np.float32)
    with torch.no_grad():
        t_out = twin(torch.from_numpy(x).permute(0, 3, 1, 2))  # NHWC -> NCHW
    enc = ConvVAEEncoder(SMALL)
    j_out = enc.apply(flax_params, jnp.asarray(x))

    # rtol covers f32 accumulation-order differences between torch BLAS and
    # XLA only (GroupNorm eps now matches flax exactly)
    np.testing.assert_allclose(
        np.asarray(j_out["mu"]), t_out["mu"].numpy(), rtol=5e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_out["logvar"]), t_out["logvar"].numpy(), rtol=5e-4, atol=2e-5
    )


def test_split_model_and_state_containers():
    from anuraxla.models.ingest import split_model_and_state

    raw = {"a": np.zeros(2)}
    assert split_model_and_state(raw) == raw
    assert split_model_and_state({"state_dict": raw}) == raw
    with pytest.raises(ValueError):
        split_model_and_state(42)
