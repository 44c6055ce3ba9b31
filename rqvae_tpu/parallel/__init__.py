from rqvae_tpu.parallel import mesh  # noqa: F401
