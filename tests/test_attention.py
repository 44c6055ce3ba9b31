"""Tests for masked dense attention (ops/attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from rqvae_tpu.ops import attention as A


def _qkv(b=2, h=3, nq=5, nk=7, dh=4, seed=0):
    """(B, N, H, Dh) layout — the attention stack's canonical layout."""
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, nq, h, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, nk, h, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, nk, h, dh).astype(np.float32))
    return q, k, v


def _ref_sdpa(q, k, v, mask=None):
    q, k, v = map(np.asarray, (q, k, v))
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(q.shape[-1])
    if mask is not None:
        scores = np.where(np.asarray(mask), scores, -1e30)
    scores = scores - scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


def test_unmasked_matches_reference():
    q, k, v = _qkv()
    np.testing.assert_allclose(
        np.asarray(A.sdpa(q, k, v)), _ref_sdpa(q, k, v), rtol=1e-4, atol=1e-5
    )


def test_causal_mask():
    q, k, v = _qkv(nq=6, nk=6)
    mask = A.build_mask(6, 6, causal=True)
    got = np.asarray(A.sdpa(q, k, v, mask))
    expected = _ref_sdpa(q, k, v, np.tril(np.ones((6, 6), bool))[None, None])
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    # position 0 attends only to key 0
    p0 = _ref_sdpa(q[:, :1], k[:, :1], v[:, :1])
    np.testing.assert_allclose(got[:, 0], p0[:, 0], rtol=1e-4, atol=1e-5)


def test_key_padding_equivalent_to_slicing():
    """Masking trailing keys == attention over the sliced keys."""
    q, k, v = _qkv(nq=4, nk=8)
    k_mask = jnp.asarray(np.array([[True] * 5 + [False] * 3, [True] * 8]))
    mask = A.build_mask(4, 8, k_mask=k_mask)
    got = np.asarray(A.sdpa(q, k, v, mask))
    ref_row0 = _ref_sdpa(q[:1], k[:1, :5], v[:1, :5])
    np.testing.assert_allclose(got[0], ref_row0[0], rtol=1e-4, atol=1e-5)


def test_fully_masked_rows_are_zero_not_nan():
    q, k, v = _qkv(nq=3, nk=4)
    k_mask = jnp.zeros((2, 4), dtype=bool)
    out = np.asarray(A.sdpa(q, k, v, A.build_mask(3, 4, k_mask=k_mask)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0)


def test_bf16_path():
    q, k, v = _qkv()
    out = A.sdpa(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), _ref_sdpa(q, k, v), rtol=0.05, atol=0.05
    )


def test_flash_dispatch_requires_head_dim_64(monkeypatch):
    """Dh<64 must stay on the jnp path even when Pallas is forced: sub-64
    head dims fill a quarter of each 128-wide vreg in the kernel and have
    never been compiled on real hardware (ops/attention.py::attend guard)."""
    from rqvae_tpu.ops import flash_attention as fa

    monkeypatch.setenv("RQVAE_TPU_FORCE_PALLAS", "1")

    def boom(*a, **k):
        raise AssertionError("flash kernel reached")

    monkeypatch.setattr(fa, "flash_attention", boom)

    q, k, v = _qkv(b=2, h=2, nq=300, nk=300, dh=32)
    out = A.attend(q, k, v)  # jnp path despite N >= 256
    assert out.shape == q.shape

    q64, k64, v64 = _qkv(b=2, h=2, nq=300, nk=300, dh=64)
    try:
        A.attend(q64, k64, v64)
    except AssertionError as e:
        assert "flash kernel reached" in str(e)
    else:
        raise AssertionError("Dh=64 at N>=256 should route to the flash kernel")
