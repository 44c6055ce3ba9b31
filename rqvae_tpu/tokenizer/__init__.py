from rqvae_tpu.tokenizer import semids  # noqa: F401
