from anuraxla.models.vae import ConvVAE, ConvVAEEncoder, VAEConfig  # noqa: F401
