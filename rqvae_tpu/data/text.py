"""Text -> embedding encoding for item features (offline, host-side).

Parity: reference data/preprocessing.py:40-44, which runs
``SentenceTransformer('sentence-transformers/sentence-t5-xl')``. That model is
a T5 encoder + mean pooling + a 768-dim linear projection + L2 normalization;
sentence-transformers is not a dependency here, so we reproduce the pipeline
with the plain HF ``transformers`` T5 encoder (the same weights repo exports
the encoder and the dense head).

This is a one-off offline stage (run on whatever accelerator is handy; the
output .npz is what the TPU training pipeline consumes), so a torch-CPU/GPU
dependency here does not touch the TPU compute path.

All preprocessing entry points accept an ``encode_fn`` override so tests and
airgapped runs can substitute a deterministic stub encoder.
"""
from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

EncodeFn = Callable[[List[str]], np.ndarray]


def hashed_stub_encoder(dim: int = 768, seed: int = 0) -> EncodeFn:
    """Deterministic, download-free stand-in: per-text seeded Gaussian,
    L2-normalized. Distinct texts -> near-orthogonal vectors, identical texts
    -> identical vectors, which preserves the semantics tests care about."""

    def encode(texts: List[str]) -> np.ndarray:
        import hashlib

        out = np.empty((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            # stable across processes/hosts (Python's str hash is
            # PYTHONHASHSEED-randomized; multi-host artifact sharing needs
            # byte-identical embeddings everywhere)
            h = int.from_bytes(
                hashlib.sha256(f"{seed}:{t}".encode()).digest()[:4], "little"
            ) & 0x7FFFFFFF
            rng = np.random.RandomState(h)
            v = rng.randn(dim).astype(np.float32)
            out[i] = v / (np.linalg.norm(v) + 1e-12)
        return out

    return encode


def make_t5_pipeline_encoder(
    tok, enc, dense_w=None, *, batch_size: int = 32, device: str = "cpu",
    max_length: int = 256,
) -> EncodeFn:
    """The sentence-t5 pipeline from provided components: T5 encoder ->
    attention-masked mean pooling -> optional 2_Dense linear -> L2 norm
    (sentence-transformers' Transformer+Pooling+Dense+Normalize stack,
    reference data/preprocessing.py:40-44 runs the packaged equivalent).

    Split out from :func:`sentence_t5_encoder` so the pipeline math is
    testable offline with a locally-constructed tiny T5 — tests assert
    batching/padding invariance and agreement with an independent
    formulation of the recipe (tests/test_text_encoder.py).
    """
    import torch

    @torch.no_grad()
    def encode(texts: List[str]) -> np.ndarray:
        chunks = []
        for i in range(0, len(texts), batch_size):
            batch = tok(
                texts[i : i + batch_size],
                padding=True,
                truncation=True,
                max_length=max_length,
                return_tensors="pt",
            )
            batch = {k: v.to(device) for k, v in dict(batch).items()}
            h = enc(**batch).last_hidden_state          # (B, T, D)
            m = batch["attention_mask"][..., None].to(h.dtype)
            pooled = (h * m).sum(1) / m.sum(1).clamp(min=1e-9)
            if dense_w is not None:
                pooled = pooled @ dense_w.T
            pooled = torch.nn.functional.normalize(pooled, dim=-1)
            chunks.append(pooled.float().cpu().numpy())
        return np.concatenate(chunks, axis=0)

    return encode


def sentence_t5_encoder(
    model_name: str = "sentence-transformers/sentence-t5-xl",
    batch_size: int = 32,
    device: Optional[str] = None,
) -> EncodeFn:
    """T5 encoder + mean pooling + dense projection + L2 norm (the
    sentence-t5 recipe). Requires network/model cache; import is deferred."""
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    dev = device or ("cuda" if torch.cuda.is_available() else "cpu")
    tok = AutoTokenizer.from_pretrained(model_name)
    enc = T5EncoderModel.from_pretrained(model_name).to(dev).eval()

    # sentence-t5 ships a linear 2_Dense head (d_model -> 768); load it if the
    # repo provides it, else fall back to mean-pooled encoder states.
    dense_w = None
    try:  # pragma: no cover - network-dependent
        from huggingface_hub import hf_hub_download
        import safetensors.torch as st

        path = hf_hub_download(model_name, "2_Dense/model.safetensors")
        dense_w = st.load_file(path)["linear.weight"].to(dev)
    except Exception:
        pass

    return make_t5_pipeline_encoder(
        tok, enc, dense_w, batch_size=batch_size, device=dev
    )
