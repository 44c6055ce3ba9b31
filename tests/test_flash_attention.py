"""Parity: fused Pallas flash attention vs the jnp masked-sdpa reference —
values and gradients, causal/non-causal, with ragged key masks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rqvae_tpu.ops import attention as attn_ops
from rqvae_tpu.ops import flash_attention as fa


def _sdpa_bhqd(q, k, v, mask):
    """sdpa reference in the flash kernel's (B, H, N, Dh) layout (sdpa's
    canonical layout is (B, N, H, Dh))."""
    out = attn_ops.sdpa(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), mask,
    )
    return out.transpose(0, 2, 1, 3)


def _rand_qkv(rng, b, h, nq, nk, dh):
    q = jnp.asarray(rng.randn(b, h, nq, dh).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, nk, dh).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, nk, dh).astype(np.float32))
    return q, k, v


def _ragged_mask(rng, b, nk):
    lengths = rng.randint(1, nk + 1, (b,))
    return jnp.asarray(np.arange(nk)[None, :] < lengths[:, None])


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("nq,nk", [(16, 16), (81, 81), (5, 81)])
def test_flash_matches_sdpa(causal, nq, nk):
    if causal and nq != nk:
        pytest.skip("causal only used for square self-attention")
    rng = np.random.RandomState(0)
    q, k, v = _rand_qkv(rng, 2, 4, nq, nk, 16)
    k_mask = _ragged_mask(rng, 2, nk)

    out = fa.flash_attention(q, k, v, k_mask=k_mask, causal=causal,
                             block_q=32, interpret=True)
    ref_mask = attn_ops.build_mask(nq, nk, causal=causal, k_mask=k_mask)
    ref = _sdpa_bhqd(q, k, v, ref_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_no_mask():
    rng = np.random.RandomState(1)
    q, k, v = _rand_qkv(rng, 1, 2, 33, 33, 8)
    out = fa.flash_attention(q, k, v, block_q=16, interpret=True)
    ref = _sdpa_bhqd(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_fully_masked_rows_zero():
    """A batch row whose keys are all invalid must produce zeros, not NaN."""
    rng = np.random.RandomState(2)
    q, k, v = _rand_qkv(rng, 2, 2, 8, 8, 8)
    k_mask = jnp.asarray(np.stack([np.zeros(8, bool), np.ones(8, bool)]))
    out = fa.flash_attention(q, k, v, k_mask=k_mask, block_q=8,
                             interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_match_sdpa(causal):
    rng = np.random.RandomState(3)
    q, k, v = _rand_qkv(rng, 2, 2, 24, 24, 8)
    k_mask = _ragged_mask(rng, 2, 24)

    def loss_flash(q, k, v):
        out = fa.flash_attention(q, k, v, k_mask=k_mask, causal=causal,
                                 block_q=8, interpret=True)
        return jnp.sum(out * out)

    def loss_ref(q, k, v):
        mask = attn_ops.build_mask(24, 24, causal=causal, k_mask=k_mask)
        out = _sdpa_bhqd(q, k, v, mask)
        return jnp.sum(out * out)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_flash_q_padding_tail():
    """Nq not a multiple of block_q."""
    rng = np.random.RandomState(4)
    q, k, v = _rand_qkv(rng, 1, 2, 21, 40, 8)
    k_mask = _ragged_mask(rng, 1, 40)
    out = fa.flash_attention(q, k, v, k_mask=k_mask, block_q=16,
                             interpret=True)
    ref = _sdpa_bhqd(q, k, v, attn_ops.build_mask(21, 40, k_mask=k_mask))
    assert out.shape == (1, 2, 21, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Short-N variant (flash_attention_small): grid over fused (batch, head)
# groups, whole score tile VMEM-resident, one-shot backward
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("nq,nk", [(16, 16), (81, 81), (5, 81), (13, 13)])
def test_flash_small_matches_sdpa(causal, nq, nk):
    if causal and nq != nk:
        pytest.skip("causal only used for square self-attention")
    rng = np.random.RandomState(0)
    q, k, v = _rand_qkv(rng, 2, 4, nq, nk, 16)
    k_mask = _ragged_mask(rng, 2, nk)

    out = fa.flash_attention_small(q, k, v, k_mask=k_mask, causal=causal,
                                   interpret=True)
    ref_mask = attn_ops.build_mask(nq, nk, causal=causal, k_mask=k_mask)
    ref = _sdpa_bhqd(q, k, v, ref_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_small_bitexact_vs_long_kernel():
    """At the Amazon train shape the short-N kernel must compute the SAME
    pass-minimized algebra as the long-N kernel — bit-exact agreement, which
    is robust to the environment's default matmul precision."""
    rng = np.random.RandomState(5)
    q, k, v = _rand_qkv(rng, 4, 8, 81, 81, 64)
    k_mask = _ragged_mask(rng, 4, 81)
    small = fa.flash_attention_small(q, k, v, k_mask=k_mask, interpret=True)
    long = fa.flash_attention(q, k, v, k_mask=k_mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(small), np.asarray(long))


def test_flash_small_fully_masked_rows_zero():
    rng = np.random.RandomState(2)
    q, k, v = _rand_qkv(rng, 2, 2, 8, 8, 8)
    k_mask = jnp.asarray(np.stack([np.zeros(8, bool), np.ones(8, bool)]))
    out = fa.flash_attention_small(q, k, v, k_mask=k_mask, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_small_gradients_match_sdpa(causal):
    rng = np.random.RandomState(3)
    q, k, v = _rand_qkv(rng, 2, 2, 24, 24, 8)
    k_mask = _ragged_mask(rng, 2, 24)

    def loss_small(q, k, v):
        out = fa.flash_attention_small(q, k, v, k_mask=k_mask, causal=causal,
                                       interpret=True)
        return jnp.sum(out * out)

    def loss_ref(q, k, v):
        mask = attn_ops.build_mask(24, 24, causal=causal, k_mask=k_mask)
        out = _sdpa_bhqd(q, k, v, mask)
        return jnp.sum(out * out)

    g_small = jax.grad(loss_small, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_small, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_flash_small_q_padding_tail():
    """Nq not a multiple of the 8-row sublane tile (81 -> padded 88): output
    is sliced back and padded-row cotangents do not contaminate dk/dv."""
    rng = np.random.RandomState(4)
    q, k, v = _rand_qkv(rng, 1, 2, 21, 40, 8)
    k_mask = _ragged_mask(rng, 1, 40)
    out = fa.flash_attention_small(q, k, v, k_mask=k_mask, interpret=True)
    ref = _sdpa_bhqd(q, k, v, attn_ops.build_mask(21, 40, k_mask=k_mask))
    assert out.shape == (1, 2, 21, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_small_group_divides_bh():
    """default_group always divides B*H, including non-power-of-two B*H."""
    for bh in (6, 24, 2048, 96, 7):
        g = fa.default_group(bh, 81, 81, 64)
        assert g >= 1 and bh % g == 0
