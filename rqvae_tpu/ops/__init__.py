from rqvae_tpu.ops import attention  # noqa: F401
