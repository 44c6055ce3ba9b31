"""Mixed-precision policy: bf16 compute, fp32 params + optimizer state.

The reference exposes fp16 AMP through HF Accelerate (off by default,
train_rqvae.py:36,62); the TPU-native equivalent is bfloat16 compute — same
exponent range as fp32, no loss scaling needed. Master params and AdamW state
stay fp32; each step casts params to bf16 for the forward/backward, and
gradients flow back through the cast as fp32.

Float32 islands are preserved where they matter: RMSNorm accumulates in fp32
(models/normalize.py), attention softmax runs fp32 (ops/attention.py,
ops/flash_attention.py), and cross-entropy upcasts logits
(models/retrieval.cross_entropy_ignore).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating leaf to ``dtype`` (ints/bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)
