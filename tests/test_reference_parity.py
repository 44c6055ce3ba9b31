"""Direct numerical parity against the reference implementation.

These tests import the PyTorch reference (read-only at /root/reference) and
compare OUR jnp implementations against ITS outputs on identical weights and
inputs — the strongest form of the file:line parity claims in our docstrings.
Skipped wholesale when the reference tree or torch is unavailable.

The reference imports ``gin`` at module scope, which is not installed; a
minimal stub providing the two decorators it uses is injected first.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_modules():
    if "gin" not in sys.modules:
        gin_stub = types.ModuleType("gin")
        gin_stub.constants_from_enum = lambda cls: cls
        gin_stub.configurable = lambda fn=None, **kw: (
            fn if fn is not None else (lambda f: f)
        )
        sys.modules["gin"] = gin_stub
    sys.path.insert(0, REF)
    try:
        from modules import loss as ref_loss            # noqa: F401
        from modules import normalize as ref_norm       # noqa: F401
        from modules import quantize as ref_quant       # noqa: F401
        from modules.encoder import MLP as RefMLP       # noqa: F401
    finally:
        sys.path.remove(REF)
    return types.SimpleNamespace(
        loss=ref_loss, norm=ref_norm, quant=ref_quant, MLP=RefMLP
    )


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_reconstruction_loss_parity(ref_modules):
    from rqvae_tpu.models import losses as our
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = rng.randn(7, 12).astype(np.float32)
    x_hat = rng.randn(7, 12).astype(np.float32)
    ref = ref_modules.loss.ReconstructionLoss()(_t(x_hat), _t(x)).numpy()
    ours = np.asarray(
        our.categorical_reconstruction_loss(jnp.asarray(x_hat), jnp.asarray(x), 0)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_categorical_reconstruction_loss_parity(ref_modules):
    from rqvae_tpu.models import losses as our
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    n_cat = 5
    x = np.concatenate(
        [rng.randn(6, 8), (rng.rand(6, n_cat) > 0.5).astype(float)], axis=1
    ).astype(np.float32)
    x_hat = rng.randn(6, 8 + n_cat).astype(np.float32)
    ref = ref_modules.loss.CategoricalReconstuctionLoss(n_cat)(
        _t(x_hat), _t(x)
    ).numpy()
    ours = np.asarray(
        our.categorical_reconstruction_loss(
            jnp.asarray(x_hat), jnp.asarray(x), n_cat
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_quantize_loss_parity(ref_modules):
    from rqvae_tpu.models.losses import quantize_loss
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    q = rng.randn(5, 8).astype(np.float32)
    v = rng.randn(5, 8).astype(np.float32)
    ref = ref_modules.loss.QuantizeLoss(commitment_weight=0.25)(
        _t(q), _t(v)
    ).detach().numpy()
    ours = np.asarray(quantize_loss(jnp.asarray(q), jnp.asarray(v), 0.25))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def test_rms_norm_parity(ref_modules):
    from rqvae_tpu.models.normalize import rms_norm, rms_norm_init
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    x = rng.randn(4, 10).astype(np.float32)
    scale = rng.rand(10).astype(np.float32) + 0.5

    ref_mod = ref_modules.norm.RMSNorm(10)
    with torch.no_grad():
        list(ref_mod.parameters())[0].copy_(_t(scale))
    ref = ref_mod(_t(x)).detach().numpy()

    ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(scale)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_l2norm_parity(ref_modules):
    from rqvae_tpu.models.normalize import l2norm
    import jax.numpy as jnp

    x = np.random.RandomState(4).randn(5, 6).astype(np.float32)
    ref = ref_modules.norm.l2norm(_t(x)).numpy()
    ours = np.asarray(l2norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------

def test_mlp_forward_parity(ref_modules):
    from rqvae_tpu.models import mlp as our_mlp
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    dims = (12, (16, 8), 6)
    ref_mod = ref_modules.MLP(
        input_dim=dims[0], hidden_dims=list(dims[1]), out_dim=dims[2],
        normalize=True,
    ).eval()

    params = our_mlp.init(jax.random.PRNGKey(0), dims[0], dims[1], dims[2])
    # copy our weights into the reference module (both are bias-free Linears)
    linears = [m for m in ref_mod.mlp if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(params)
    with torch.no_grad():
        for lin, w in zip(linears, params):
            lin.weight.copy_(_t(np.asarray(w).T))  # ours is (in, out)

    x = rng.randn(9, dims[0]).astype(np.float32)
    ref = ref_mod(_t(x)).detach().numpy()
    ours = np.asarray(our_mlp.apply(params, jnp.asarray(x), normalize=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Quantize level: eval path, STE, rotation trick
# ---------------------------------------------------------------------------

def _mk_ref_quantize(ref_modules, mode, k=16, d=8, codebook=None):
    q = ref_modules.quant.Quantize(
        embed_dim=d, n_embed=k, forward_mode=mode, do_kmeans_init=False,
        codebook_normalize=False, sim_vq=False, commitment_weight=0.25,
    )
    with torch.no_grad():
        q.embedding.weight.copy_(_t(codebook))
    return q


@pytest.mark.parametrize("mode_name", ["STE", "ROTATION_TRICK"])
def test_quantize_train_estimators_parity(ref_modules, mode_name):
    from rqvae_tpu.models import quantize as our_q
    import jax.numpy as jnp

    rng = np.random.RandomState(6)
    k, d = 16, 8
    codebook = rng.randn(k, d).astype(np.float32)
    x = rng.randn(10, d).astype(np.float32)

    ref_mode = getattr(ref_modules.quant.QuantizeForwardMode, mode_name)
    ref_mod = _mk_ref_quantize(ref_modules, ref_mode, k, d, codebook).train()
    ref_out = ref_mod(_t(x), temperature=0.2)

    ours = our_q.apply(
        {"codebook": jnp.asarray(codebook)},
        jnp.asarray(x),
        temperature=0.2,
        mode=our_q.QuantizeForwardMode[mode_name],
        training=True,
        rng=None,
    )
    np.testing.assert_array_equal(np.asarray(ours.ids), ref_out.ids.numpy())
    np.testing.assert_allclose(
        np.asarray(ours.embeddings), ref_out.embeddings.detach().numpy(),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.loss), ref_out.loss.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_quantize_eval_path_parity(ref_modules):
    from rqvae_tpu.models import quantize as our_q
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    k, d = 32, 8
    codebook = rng.randn(k, d).astype(np.float32)
    x = rng.randn(20, d).astype(np.float32)

    ref_mod = _mk_ref_quantize(
        ref_modules, ref_modules.quant.QuantizeForwardMode.GUMBEL_SOFTMAX,
        k, d, codebook,
    ).eval()
    ref_out = ref_mod(_t(x), temperature=0.001)

    ours = our_q.apply(
        {"codebook": jnp.asarray(codebook)}, jnp.asarray(x),
        temperature=0.001, training=False,
    )
    np.testing.assert_array_equal(np.asarray(ours.ids), ref_out.ids.numpy())
    np.testing.assert_allclose(
        np.asarray(ours.embeddings), ref_out.embeddings.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.loss), ref_out.loss.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# eval metrics
# ---------------------------------------------------------------------------

def test_topk_accumulator_parity():
    sys.path.insert(0, REF)
    try:
        from evaluate.metrics import TopKAccumulator as RefAcc
    finally:
        sys.path.remove(REF)
    from rqvae_tpu.evaluate.metrics import TopKAccumulator

    rng = np.random.RandomState(8)
    actual = rng.randint(0, 5, (32, 4)).astype(np.int64)
    beams = rng.randint(0, 5, (32, 10, 4)).astype(np.int64)
    # plant some exact hits
    beams[0, 3] = actual[0]
    beams[5, 0] = actual[5]

    ref_acc = RefAcc(ks=[1, 5, 10])
    ref_acc.accumulate(torch.from_numpy(actual), torch.from_numpy(beams))
    ref = ref_acc.reduce()

    ours_acc = TopKAccumulator(ks=(1, 5, 10))
    ours_acc.accumulate(actual, beams)
    ours = ours_acc.reduce()

    for key, val in ref.items():
        assert key in ours, f"missing metric {key}"
        np.testing.assert_allclose(ours[key], val, rtol=1e-6, err_msg=key)


# ---------------------------------------------------------------------------
# full RQ-VAE tokenization chain (encoder MLP + residual quantize loop)
# ---------------------------------------------------------------------------

def test_rqvae_get_semantic_ids_parity(ref_modules):
    import jax
    import jax.numpy as jnp

    from rqvae_tpu.models import rqvae as our_rqvae
    from rqvae_tpu.models.rqvae import RqVaeConfig

    sys.path.insert(0, REF)
    try:
        from modules.rqvae import RqVae as RefRqVae
    finally:
        sys.path.remove(REF)

    cfg = RqVaeConfig(
        input_dim=20, embed_dim=8, hidden_dims=(16, 12), codebook_size=16,
        n_layers=3, n_cat_feats=0, codebook_kmeans_init=False,
    )
    params = our_rqvae.init(jax.random.PRNGKey(0), cfg)

    ref = RefRqVae(
        input_dim=cfg.input_dim, embed_dim=cfg.embed_dim,
        hidden_dims=list(cfg.hidden_dims), codebook_size=cfg.codebook_size,
        codebook_kmeans_init=False, n_layers=cfg.n_layers, n_cat_features=0,
    ).eval()

    # map our params onto the reference module
    with torch.no_grad():
        for ref_mlp, ours in (
            (ref.encoder, params["encoder"]),
            (ref.decoder, params["decoder"]),
        ):
            linears = [
                m for m in ref_mlp.mlp if isinstance(m, torch.nn.Linear)
            ]
            assert len(linears) == len(ours)
            for lin, w in zip(linears, ours):
                lin.weight.copy_(_t(np.asarray(w).T))
        for ref_level, our_level in zip(ref.layers, params["layers"]):
            ref_level.embedding.weight.copy_(_t(our_level["codebook"]))
            ref_level.kmeans_initted = True  # skip lazy kmeans

    x = np.random.RandomState(9).randn(17, cfg.input_dim).astype(np.float32)
    ref_out = ref.get_semantic_ids(_t(x))
    ours_out = our_rqvae.get_semantic_ids(params, cfg, jnp.asarray(x))

    np.testing.assert_array_equal(
        np.asarray(ours_out.sem_ids), ref_out.sem_ids.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours_out.embeddings.sum(axis=-1)),
        ref_out.embeddings.sum(dim=-1).detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours_out.quantize_loss),
        ref_out.quantize_loss.detach().numpy(),
        rtol=1e-4, atol=1e-5,
    )
    # the fused Pallas path agrees too (interpret mode on CPU)
    fused = our_rqvae.encode_and_tokenize(params, cfg, jnp.asarray(x))
    import os as _os
    if _os.environ.get("RQVAE_TPU_DISABLE_PALLAS") != "1":
        np.testing.assert_array_equal(
            np.asarray(fused), ref_out.sem_ids.numpy()
        )
