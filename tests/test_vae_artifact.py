"""Full-VAE (encoder+decoder) artifact round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from anuraxla.models.checkpoint import load_vae, save_vae
from anuraxla.models.vae import VAEConfig, init_vae

SMALL = VAEConfig(latent_dim=12, widths=(8, 16), dense_width=24, groups=4, input_hw=(32, 32))


def test_vae_artifact_roundtrip(tmp_path, rng):
    vae, params = init_vae(SMALL, seed=0)
    save_vae(tmp_path / "vae_v0", SMALL, params)
    vae2, params2, cfg2 = load_vae(tmp_path / "vae_v0")
    assert cfg2 == SMALL
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
    r1 = vae.apply(params, x, rng=jax.random.PRNGKey(5))
    r2 = vae2.apply(params2, x, rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(r1["recon"]), np.asarray(r2["recon"]))
    np.testing.assert_array_equal(np.asarray(r1["mu"]), np.asarray(r2["mu"]))
