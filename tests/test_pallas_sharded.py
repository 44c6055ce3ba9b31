"""Pallas kernels under a sharded mesh (VERDICT r2 item 4).

The kernels are forced on (RQVAE_TPU_FORCE_PALLAS=1 -> interpret mode on the
8-device CPU mesh) INSIDE jitted computations whose operands are sharded, so
these tests exercise the exact shard_map-wrapped dispatch the real chips
take: per-device kernel execution over the 'data' axis, replicated
broadcast of codebooks/tables, psum of their cotangents. Numerical equality
is asserted against the unsharded jnp reference paths, and the compiled HLO
is checked for manual (shard_map) partitioning rather than full replication.

Reference contrast: the reference's Triton kernel ran under DDP
unconditionally (/root/reference/ops/triton/jagged.py:92-125) because DDP
never splits a single kernel launch; GSPMD does, hence the explicit
shard_map wrapping tested here.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rqvae_tpu.models import rqvae as rqvae_lib
from rqvae_tpu.ops import attention, dispatch
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.tokenizer import semids

pytestmark = pytest.mark.slow


@pytest.fixture
def forced_pallas(monkeypatch):
    monkeypatch.setenv("RQVAE_TPU_FORCE_PALLAS", "1")
    yield
    dispatch.set_execution_mesh(None)


@pytest.fixture
def no_pallas(monkeypatch):
    monkeypatch.setenv("RQVAE_TPU_DISABLE_PALLAS", "1")
    yield


def _assert_manually_partitioned(jitted, *args):
    """The lowered (pre-SPMD-partitioning) IR must contain a shard_map
    manual-computation region — i.e. the kernel runs per-device on its
    shard, not replicated. Shardy emits `sdy.manual_computation`; the legacy
    partitioner emits SPMDFullToShardShape custom-calls."""
    txt = jitted.lower(*args).as_text()
    assert "sdy.manual_computation" in txt or "SPMDFullToShardShape" in txt


# ---------------------------------------------------------------------------
# flash attention
# ---------------------------------------------------------------------------

def _qkv(b=16, n=256, h=4, dh=64, seed=0):  # dh >= 64: attend()'s flash route requires it
    r = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(r.randn(b, n, h, dh).astype(np.float32))
    lens = r.randint(n // 2, n + 1, size=(b,))
    k_mask = jnp.asarray(np.arange(n)[None, :] < lens[:, None])
    return mk(), mk(), mk(), k_mask


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_dp_mesh_matches_jnp(cpu_devices, forced_pallas,
                                             causal):
    q, k, v, k_mask = _qkv()
    dispatch.set_execution_mesh(None)
    mask = attention.build_mask(q.shape[1], k.shape[1], causal=causal,
                                k_mask=k_mask)
    ref = attention.sdpa(q, k, v, mask)

    mesh = mesh_lib.make_mesh()  # 8 x 1, registers the execution mesh
    args = [mesh_lib.shard_batch(x, mesh) for x in (q, k, v)]
    f = jax.jit(lambda q_, k_, v_, m_: attention.attend(
        q_, k_, v_, causal=causal, k_mask=m_))
    out = f(*args, k_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    _assert_manually_partitioned(f, *args, k_mask)


def test_flash_attention_dp_mesh_grads_match_jnp(cpu_devices, forced_pallas):
    q, k, v, k_mask = _qkv()

    def loss(fn, q_, k_, v_):
        return jnp.sum(fn(q_, k_, v_) ** 2)

    dispatch.set_execution_mesh(None)
    mask = attention.build_mask(q.shape[1], k.shape[1], k_mask=k_mask)
    ref_fn = lambda q_, k_, v_: attention.sdpa(q_, k_, v_, mask)
    g_ref = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(q, k, v)

    mesh = mesh_lib.make_mesh()
    sh = [mesh_lib.shard_batch(x, mesh) for x in (q, k, v)]
    fa_fn = lambda q_, k_, v_: attention.attend(q_, k_, v_, k_mask=k_mask)
    g = jax.jit(jax.grad(lambda *a: loss(fa_fn, *a), argnums=(0, 1, 2)))(*sh)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_attention_dp_tp_mesh_matches_jnp(cpu_devices, forced_pallas):
    """dp x tp (4, 2): heads split over 'model', batch over 'data'."""
    q, k, v, k_mask = _qkv()
    dispatch.set_execution_mesh(None)
    mask = attention.build_mask(q.shape[1], k.shape[1], k_mask=k_mask)
    ref = attention.sdpa(q, k, v, mask)

    mesh = mesh_lib.make_mesh((4, 2))
    sh = [mesh_lib.shard_batch(x, mesh) for x in (q, k, v)]
    f = jax.jit(lambda q_, k_, v_: attention.attend(q_, k_, v_, k_mask=k_mask))
    out = f(*sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    _assert_manually_partitioned(f, *sh)


def test_flash_attention_indivisible_heads_fall_back(cpu_devices,
                                                     forced_pallas):
    """3 heads on a model-2 axis: the flash route must decline (jnp path,
    GSPMD-partitioned) instead of a shard_map divisibility error."""
    q, k, v, k_mask = _qkv(h=3)
    dispatch.set_execution_mesh(None)
    mask = attention.build_mask(q.shape[1], k.shape[1], k_mask=k_mask)
    ref = attention.sdpa(q, k, v, mask)
    mesh = mesh_lib.make_mesh((4, 2))
    sh = [mesh_lib.shard_batch(x, mesh) for x in (q, k, v)]
    out = jax.jit(
        lambda q_, k_, v_: attention.attend(q_, k_, v_, k_mask=k_mask)
    )(*sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# fused RQ kernels (the ADVICE r2 medium finding: crossing
# FUSED_TRAIN_MIN_CODEBOOK_VOLUME on a multi-device mesh)
# ---------------------------------------------------------------------------

BIG_CFG = rqvae_lib.RqVaeConfig(
    input_dim=32, embed_dim=64, hidden_dims=(32,), codebook_size=1024,
    n_layers=2, n_cat_feats=0,
    codebook_mode="ROTATION_TRICK", codebook_kmeans_init=False,
)
assert (
    BIG_CFG.codebook_size * BIG_CFG.embed_dim
    >= rqvae_lib.FUSED_TRAIN_MIN_CODEBOOK_VOLUME
)


def _big_x(b=16, seed=3):
    return jnp.asarray(
        np.random.RandomState(seed).randn(b, 32).astype(np.float32)
    )


def test_fused_rq_train_dp_mesh_matches_jnp(cpu_devices, forced_pallas):
    """Training forward+grads of the fused kernel, shard_mapped over an
    8-device 'data' axis, vs the unsharded jnp estimator loop."""
    params = rqvae_lib.init(jax.random.PRNGKey(1), BIG_CFG)
    x = _big_x()

    def loss_fn(p, xx):
        return rqvae_lib.forward(
            p, BIG_CFG, xx, gumbel_t=0.2, training=True
        ).loss

    dispatch.set_execution_mesh(None)
    import os
    os.environ["RQVAE_TPU_DISABLE_PALLAS"] = "1"
    try:
        l_ref, g_ref = jax.value_and_grad(loss_fn)(params, x)
    finally:
        del os.environ["RQVAE_TPU_DISABLE_PALLAS"]

    mesh = mesh_lib.make_mesh()
    params_sh = jax.device_put(
        params, mesh_lib.dp_param_shardings(params, mesh)
    )
    x_sh = mesh_lib.shard_batch(x, mesh)
    f = jax.jit(jax.value_and_grad(loss_fn))
    l, g = f(params_sh, x_sh)
    np.testing.assert_allclose(float(l), float(l_ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g, g_ref,
    )
    _assert_manually_partitioned(f, params_sh, x_sh)


def test_fused_rq_train_declines_tp_codebooks(cpu_devices, forced_pallas):
    """model axis > 1 => the fused route must decline (its BlockSpecs assume
    the full codebook stack in VMEM) and the jnp path must still match."""
    mesh_lib.make_mesh((4, 2))
    assert not rqvae_lib._fused_shardable(_big_x())

    params = rqvae_lib.init(jax.random.PRNGKey(1), BIG_CFG)
    x = _big_x()
    dispatch.set_execution_mesh(None)
    ref = rqvae_lib.forward(params, BIG_CFG, x, gumbel_t=0.2,
                            training=True).loss

    mesh = mesh_lib.make_mesh((4, 2))
    params_sh = jax.device_put(
        params, mesh_lib.rqvae_tp_param_shardings(params, mesh)
    )
    x_sh = mesh_lib.shard_batch(x, mesh)
    loss = jax.jit(
        lambda p, xx: rqvae_lib.forward(
            p, BIG_CFG, xx, gumbel_t=0.2, training=True
        ).loss
    )(params_sh, x_sh)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)


def test_tokenize_dp_mesh_matches_jnp(cpu_devices, forced_pallas):
    params = rqvae_lib.init(jax.random.PRNGKey(2), BIG_CFG)
    x = _big_x(b=32)
    dispatch.set_execution_mesh(None)
    ref = rqvae_lib.get_semantic_ids(params, BIG_CFG, x).sem_ids

    mesh = mesh_lib.make_mesh()
    params_sh = jax.device_put(
        params, mesh_lib.dp_param_shardings(params, mesh)
    )
    x_sh = mesh_lib.shard_batch(x, mesh)
    f = jax.jit(
        lambda p, xx: rqvae_lib.encode_and_tokenize(p, BIG_CFG, xx)
    )
    ids = f(params_sh, x_sh)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref))
    _assert_manually_partitioned(f, params_sh, x_sh)


# ---------------------------------------------------------------------------
# children-window kernel (beam-search validity) under the mesh
# ---------------------------------------------------------------------------

def test_children_mask_dp_mesh_matches_jnp(cpu_devices, forced_pallas,
                                           monkeypatch):
    rng = np.random.RandomState(7)
    k = 16
    cached = jnp.asarray(
        np.unique(rng.randint(0, k, (200, 4)).astype(np.int32), axis=0)
    )
    index = semids.build_index(cached, k)
    prefix = cached[rng.randint(0, cached.shape[0], 64), :2]

    monkeypatch.setenv("RQVAE_TPU_DISABLE_PALLAS", "1")
    dispatch.set_execution_mesh(None)
    ref = semids.children_mask(index, prefix)
    monkeypatch.delenv("RQVAE_TPU_DISABLE_PALLAS")

    mesh = mesh_lib.make_mesh()
    prefix_sh = mesh_lib.shard_batch(prefix, mesh)
    f = jax.jit(lambda p_: semids.children_mask(index, p_))
    out = f(prefix_sh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    _assert_manually_partitioned(f, prefix_sh)


# ---------------------------------------------------------------------------
# multi-host: corpus tokenization must run process-locally (the host-0-only
# diversity-metrics path cannot drive a global mesh alone)
# ---------------------------------------------------------------------------

def test_precompute_corpus_ids_multihost_skips_shard_map(
        cpu_devices, forced_pallas, monkeypatch):
    """With a registered mesh but >1 process, precompute_corpus_ids must
    dispatch its kernels WITHOUT shard_map (train_rqvae runs it on host 0
    only; process-local operands cannot feed a global-mesh shard_map).
    jax.shard_map is booby-trapped to prove the route; the single-process
    control asserts the trap itself works."""
    params = rqvae_lib.init(jax.random.PRNGKey(4), BIG_CFG)
    x = _big_x(b=48)
    dispatch.set_execution_mesh(None)
    ref = semids.precompute_corpus_ids(params, BIG_CFG, x, chunk_size=16)

    def boom(*a, **k):
        raise AssertionError("shard_map reached from a multi-host "
                             "process-local corpus tokenization")

    mesh_lib.make_mesh()
    monkeypatch.setattr(jax, "shard_map", boom)

    # control: single-process with a registered mesh DOES take shard_map
    with pytest.raises(AssertionError, match="shard_map reached"):
        semids.precompute_corpus_ids(params, BIG_CFG, x, chunk_size=16)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    out = semids.precompute_corpus_ids(params, BIG_CFG, x, chunk_size=16)
    np.testing.assert_array_equal(
        np.asarray(out.cached_ids), np.asarray(ref.cached_ids)
    )
