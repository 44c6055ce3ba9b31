from rqvae_tpu.data.schemas import SeqBatch, TokenizedSeqBatch  # noqa: F401
