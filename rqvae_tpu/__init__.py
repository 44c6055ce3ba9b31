"""TPU-native generative-retrieval framework (RQ-VAE semantic-ID recommender).

A from-scratch JAX/XLA/Pallas re-design of the two-stage TIGER-style pipeline
implemented by the PyTorch reference (RQ-VAE-Recommender):

  stage 1: RQ-VAE tokenizer  -- MLP autoencoder + multi-level residual vector
           quantization mapping item text embeddings to semantic-ID tuples.
  stage 2: generative retrieval -- encoder-decoder transformer over semantic-ID
           sequences with constrained beam search over the corpus prefix trie.

Design notes (TPU-first, not a port):
  * pure-functional models: params are pytrees, every forward is jittable.
  * one jit-compiled train step over a jax.sharding.Mesh ('data', 'model').
  * ragged user histories are dense padded buffers + masks consumed by
    length-aware attention (Pallas flash-attention kernel on TPU).
  * generation is a fixed-shape jit beam search (gumbel top-k sampling,
    sorted-key prefix membership instead of O(n^2) trie scans).
"""

__version__ = "0.1.0"
