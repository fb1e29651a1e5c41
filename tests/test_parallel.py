"""Multi-device (8 virtual CPU devices) sharding tests: sharded encode
matches single-device results; psum pooled covariance matches masked_cov;
dp and dp×tp training steps run and agree with the unsharded step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anuraxla.parallel.mesh import make_mesh, pad_to_multiple


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices (conftest sets them)"
)


def test_mesh_shapes():
    m = make_mesh()
    assert m.shape["data"] * m.shape["model"] == 8
    m2 = make_mesh(model_axis=2)
    assert m2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_devices=6, model_axis=4)


def test_pad_to_multiple():
    x = np.ones((10, 3))
    p, n = pad_to_multiple(x, 8)
    assert p.shape == (16, 3) and n == 10
    p2, n2 = pad_to_multiple(np.ones((16, 3)), 8)
    assert p2.shape == (16, 3) and n2 == 16


def test_sharded_encode_matches_single_device(rng):
    from anuraxla.constants import MelConfig
    from anuraxla.models.vae import VAEConfig, init_encoder
    from anuraxla.ops.frontend import log_mel_batch, mel_to_encoder_input
    from anuraxla.parallel.encode import make_sharded_encode

    mel = MelConfig(duration=0.25, target_frames=32, n_mels=32, sr=16000, fmax=7000)
    vcfg = VAEConfig(latent_dim=16, widths=(8, 16), dense_width=32, groups=4, input_hw=(32, 32))
    enc, params = init_encoder(vcfg, seed=0)

    mesh = make_mesh()  # 8-way data parallel
    sharded = make_sharded_encode(mesh, enc.apply, mel)
    audio = rng.standard_normal((16, mel.num_samples)).astype(np.float32) * 0.1

    z_sharded = np.asarray(sharded(params, jnp.asarray(audio)))
    mels = log_mel_batch(jnp.asarray(audio), mel)
    z_ref = np.asarray(enc.apply(params, mel_to_encoder_input(mels))["mu"])
    np.testing.assert_allclose(z_sharded, z_ref, rtol=2e-4, atol=2e-5)


def test_sharded_pooled_cov_matches_masked_cov(rng):
    from anuraxla.ops.linalg import masked_cov
    from anuraxla.parallel.encode import sharded_pooled_cov

    mesh = make_mesh()
    N, D = 64, 12
    Zc = rng.standard_normal((N, D)).astype(np.float32)
    Zc -= Zc.mean(0)  # centered, like the LDA pooled input
    mask = np.ones(N, bool)
    mask[50:] = False

    cov_fn = sharded_pooled_cov(mesh)
    cov, n = cov_fn(jnp.asarray(Zc), jnp.asarray(mask))
    ref = np.asarray(masked_cov(jnp.asarray(Zc), jnp.asarray(mask), mu=jnp.zeros(D)))
    assert int(np.asarray(n)) == 50
    np.testing.assert_allclose(np.asarray(cov), ref, rtol=1e-4, atol=1e-5)


def test_sharded_distance_histogram(rng):
    from anuraxla.parallel.encode import sharded_distance_histogram

    mesh = make_mesh()
    d = rng.uniform(0, 10, 64).astype(np.float32)
    mask = np.ones(64, bool)
    hist_fn = sharded_distance_histogram(mesh, n_bins=64)
    counts = np.asarray(hist_fn(jnp.asarray(d), jnp.asarray(mask),
                                jnp.asarray(0.0), jnp.asarray(10.0)))
    assert counts.sum() == 64
    ref, _ = np.histogram(d, bins=64, range=(0, 10.0 + 1e-6))
    # binning boundary conventions may differ by one at edges; compare totals + coarse shape
    np.testing.assert_allclose(counts.reshape(8, 8).sum(1), ref.reshape(8, 8).sum(1), atol=1)


@pytest.mark.parametrize("model_axis", [1, 2])
def test_sharded_train_step_matches_unsharded(rng, model_axis):
    from anuraxla.models.train import TrainConfig, create_train_state, make_train_step
    from anuraxla.models.vae import VAEConfig
    from anuraxla.parallel.train_sharded import (
        make_sharded_train_step,
        shard_state,
    )

    # big enough dense to trigger the tp rule (dense_width 256, min dim 128)
    vcfg = VAEConfig(latent_dim=16, widths=(8, 128), dense_width=256, groups=4, input_hw=(16, 16))
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, beta=0.1, seed=0)
    batch = rng.standard_normal((8, 16, 16, 1)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    from anuraxla.parallel.mesh import make_mesh

    mesh = make_mesh(model_axis=model_axis)
    vae, state0 = create_train_state(vcfg, tc)
    ref_state, ref_metrics = jax.jit(make_train_step(vae, tc.beta))(state0, jnp.asarray(batch), key)

    vae2, state1 = create_train_state(vcfg, tc)
    state1, shardings = shard_state(state1, mesh)
    if model_axis > 1:
        # at least one kernel must actually be tensor-sharded
        specs = jax.tree.leaves(jax.tree.map(lambda s: s.spec, shardings, is_leaf=lambda x: hasattr(x, "spec")))
        assert any("model" in str(s) for s in specs)
    step = make_sharded_train_step(vae2, tc.beta, mesh, shardings)
    from jax.sharding import NamedSharding, PartitionSpec as P

    b = jax.device_put(jnp.asarray(batch), NamedSharding(mesh, P("data")))
    new_state, metrics = step(state1, b, key)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4)
    # parameters after one step agree
    for a, bb in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-3, atol=2e-4)


def test_session_data_parallel_matches_single(tmp_path, rng):
    """EncoderSession(data_parallel=True) on the 8-device mesh must produce
    the same latents as the unsharded session."""
    from anuraxla.constants import MelConfig
    from anuraxla.models.checkpoint import save_encoder
    from anuraxla.models.vae import VAEConfig, init_encoder
    from anuraxla.pipeline.session import EncoderSession

    mel = MelConfig(sr=16000, duration=0.25, target_frames=32, n_mels=32, fmax=7000)
    vcfg = VAEConfig(latent_dim=8, widths=(8, 16), dense_width=16, groups=4, input_hw=(32, 32))
    _, params = init_encoder(vcfg, 0)
    save_encoder(tmp_path / "enc", vcfg, params)

    batch = (0.1 * rng.standard_normal((16, mel.num_samples))).astype(np.float32)
    s1 = EncoderSession(mel=mel, batch_size=16, encoder_dir=tmp_path / "enc",
                        project_root=tmp_path).load()
    s8 = EncoderSession(mel=mel, batch_size=16, encoder_dir=tmp_path / "enc",
                        project_root=tmp_path, data_parallel=True).load()
    np.testing.assert_allclose(s1.encode_array(batch), s8.encode_array(batch),
                               rtol=2e-4, atol=2e-5)

    # batch size not divisible by the data axis -> clean error
    with pytest.raises(ValueError, match="divide"):
        EncoderSession(mel=mel, batch_size=9, encoder_dir=tmp_path / "enc",
                       project_root=tmp_path, data_parallel=True).load()
