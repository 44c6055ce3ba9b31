from rqvae_tpu.evaluate import metrics  # noqa: F401
