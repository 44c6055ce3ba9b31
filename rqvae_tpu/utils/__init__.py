from rqvae_tpu.utils import initializers  # noqa: F401
