from rqvae_tpu.models import kmeans, losses, mlp, normalize, quantize, rqvae  # noqa: F401
