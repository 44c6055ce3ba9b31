"""RQ-VAE: MLP autoencoder with a residual vector-quantization bottleneck.

Parity: reference modules/rqvae.py:37-165.
  * encoder MLP input_dim -> hidden_dims -> embed_dim (l2-normalized iff
    codebook_normalize).
  * n_layers sequential Quantize levels; residual update res <- res - emb.
  * decoder MLP embed_dim -> reversed(hidden_dims) -> input_dim with a final
    l2-norm layer inside the MLP (reference modules/rqvae.py:83-88).
  * loss = mean(recon + sum_level quantize); recon optionally categorical.
  * debug stats: per-level embedding norms and the fraction of unique ID
    tuples in the batch (reference modules/rqvae.py:152-157).

The whole forward is one jit-compiled function — the reference needed
``torch.compile(mode="reduce-overhead")`` (modules/rqvae.py:140); here the
trace/compile boundary is the train step itself.

Kmeans codebook priming: the reference lazily runs per-level kmeans inside the
first training forward (modules/quantize.py:102-103, train_rqvae.py:139-141),
where level i's kmeans sees residuals after level i-1's *training-mode*
quantization. We reproduce that order explicitly with :func:`kmeans_prime`,
called once at step 0 — explicit state instead of hidden module flags.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rqvae_tpu.models import kmeans as kmeans_lib
from rqvae_tpu.models import mlp
from rqvae_tpu.models import quantize
from rqvae_tpu.models.losses import categorical_reconstruction_loss
from rqvae_tpu.models.normalize import l2norm
from rqvae_tpu.models.quantize import QuantizeForwardMode


@dataclasses.dataclass(frozen=True)
class RqVaeConfig:
    input_dim: int = 18
    embed_dim: int = 16
    hidden_dims: Tuple[int, ...] = (18, 18)
    codebook_size: int = 32
    n_layers: int = 3
    n_cat_feats: int = 18
    commitment_weight: float = 0.25
    codebook_mode: QuantizeForwardMode = QuantizeForwardMode.GUMBEL_SOFTMAX
    codebook_normalize: bool = False
    codebook_sim_vq: bool = False
    codebook_kmeans_init: bool = True

    def __post_init__(self):
        object.__setattr__(self, "hidden_dims", tuple(self.hidden_dims))
        if isinstance(self.codebook_mode, str):
            object.__setattr__(
                self, "codebook_mode", QuantizeForwardMode[self.codebook_mode]
            )


class RqVaeOutput(NamedTuple):
    embeddings: jax.Array     # (B, D, L)
    residuals: jax.Array      # (B, D, L)
    sem_ids: jax.Array        # (B, L) int32
    quantize_loss: jax.Array  # (B,)


class RqVaeLosses(NamedTuple):
    loss: jax.Array                 # scalar
    reconstruction_loss: jax.Array  # scalar
    rqvae_loss: jax.Array           # scalar
    embs_norm: jax.Array            # (B, L)
    p_unique_ids: jax.Array         # scalar


def init(key: jax.Array, cfg: RqVaeConfig):
    k_enc, k_dec, k_q = jax.random.split(key, 3)
    q_keys = jax.random.split(k_q, cfg.n_layers)
    return {
        "encoder": mlp.init(k_enc, cfg.input_dim, cfg.hidden_dims, cfg.embed_dim),
        "decoder": mlp.init(
            k_dec, cfg.embed_dim, tuple(reversed(cfg.hidden_dims)), cfg.input_dim
        ),
        "layers": [
            quantize.init(
                q_keys[i], cfg.codebook_size, cfg.embed_dim, sim_vq=cfg.codebook_sim_vq
            )
            for i in range(cfg.n_layers)
        ],
    }


def encode(params, cfg: RqVaeConfig, x: jax.Array) -> jax.Array:
    return mlp.apply(params["encoder"], x, normalize=cfg.codebook_normalize)


def decode(params, cfg: RqVaeConfig, z: jax.Array) -> jax.Array:
    # decoder MLP built with normalize=True (reference modules/rqvae.py:83-88)
    return mlp.apply(params["decoder"], z, normalize=True)


def _level_kwargs(cfg: RqVaeConfig, level: int):
    return dict(
        mode=cfg.codebook_mode,
        # only level 0 normalizes its codebook (reference modules/rqvae.py:66-70)
        normalize=(level == 0 and cfg.codebook_normalize),
        commitment_weight=cfg.commitment_weight,
    )


# codebook_size * embed_dim at which the fused Pallas training kernel beats
# XLA's fused jnp path (see get_semantic_ids for the measurements)
FUSED_TRAIN_MIN_CODEBOOK_VOLUME = 65536


def _fused_shardable(res: jax.Array) -> bool:
    """Whether the fused Pallas kernels may run under the registered mesh:
    requires replicated (non-TP) codebooks — the kernel BlockSpecs assume the
    full (L, K, D) stack in VMEM — and a batch divisible over 'data'. TP
    codebook configs fall back to the jnp path, which GSPMD partitions
    (distance matmul sharded over K, cross-shard argmin inserted)."""
    from rqvae_tpu.ops import dispatch

    if dispatch.model_axis_size() > 1:
        return False
    return dispatch.divisible_over_data(res.shape[0])


def _fused_train_quantize(params, cfg: RqVaeConfig, res: jax.Array) -> RqVaeOutput:
    """Fused Pallas training path for the hard estimators (STE / rotation
    trick): one kernel for the whole distance+argmin+gather residual loop,
    estimator-exact gradients via custom VJP (ops/quantize_pallas.
    rq_quantize_train). Values AND gradients parity-locked to the jnp loop in
    tests/test_quantize_pallas.py. Under a registered multi-device mesh the
    kernel is shard_mapped over the batch ('data') axis with the codebooks
    broadcast in — their cotangent psums out, which is exactly the DP grad
    all-reduce. (TP-sharded codebooks never reach here: the caller gates the
    fused route on model_axis_size() == 1.)"""
    from jax.sharding import PartitionSpec as P

    from rqvae_tpu.ops import dispatch, quantize_pallas
    from rqvae_tpu.parallel.mesh import DATA_AXIS

    cbs = effective_codebooks(params, cfg)
    bsp = P(DATA_AXIS)
    call = dispatch.shard_over_batch(
        # positional: custom_vjp functions reject keyword arguments
        lambda x_, cb_: quantize_pallas.rq_quantize_train(
            x_, cb_, cfg.codebook_mode.name, cfg.commitment_weight
        ),
        in_specs=(bsp, P()),
        out_specs=quantize_pallas.RqTrainOutput(
            embeddings=bsp, residuals=bsp, sem_ids=bsp, quantize_loss=bsp
        ),
    )
    out = call(res, cbs)
    dt = res.dtype
    return RqVaeOutput(
        embeddings=out.embeddings.astype(dt),
        residuals=out.residuals.astype(dt),
        sem_ids=out.sem_ids,
        quantize_loss=out.quantize_loss.astype(dt),
    )


def get_semantic_ids(
    params,
    cfg: RqVaeConfig,
    x: jax.Array,
    *,
    gumbel_t: float = 0.001,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> RqVaeOutput:
    """Encode then quantize through n_layers levels (reference rqvae.py:114-138)."""
    res = encode(params, cfg, x)
    if training and cfg.codebook_mode in (
        QuantizeForwardMode.STE, QuantizeForwardMode.ROTATION_TRICK
    ):
        from rqvae_tpu.ops import dispatch

        # Measured dispatch (one v5e, device-resident loop): at the shipped
        # Amazon shape (3x256x32 codebooks) XLA's fused jnp path wins
        # (0.216 vs 0.263 ms/step — kernel call overhead dominates tiny
        # programs); at the BASELINE stretch shape (4x2048x64, bs 1024) the
        # Pallas kernel wins 1.54x (0.462 vs 0.711 ms/step) by keeping the
        # (B, K) distance matrices out of HBM. Route on codebook volume.
        big_codebooks = (
            cfg.codebook_size * cfg.embed_dim >= FUSED_TRAIN_MIN_CODEBOOK_VOLUME
        )
        if (
            dispatch.pallas_enabled()
            and big_codebooks
            and _fused_shardable(res)
        ):
            return _fused_train_quantize(params, cfg, res)
    embs, residuals, sem_ids = [], [], []
    q_loss = jnp.zeros(res.shape[:-1], dtype=res.dtype)
    for level in range(cfg.n_layers):
        residuals.append(res)
        if rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        out = quantize.apply(
            params["layers"][level],
            res,
            temperature=gumbel_t,
            training=training,
            rng=sub,
            **_level_kwargs(cfg, level),
        )
        q_loss = q_loss + out.loss
        res = res - out.embeddings
        embs.append(out.embeddings)
        sem_ids.append(out.ids)
    return RqVaeOutput(
        embeddings=jnp.stack(embs, axis=-1),
        residuals=jnp.stack(residuals, axis=-1),
        sem_ids=jnp.stack(sem_ids, axis=-1),
        quantize_loss=q_loss,
    )


def _split_l2norm(x_hat: jax.Array, n_cat: int) -> jax.Array:
    """Reference modules/rqvae.py:146 normalizes the dense slice and passes the
    categorical tail through. NOTE: with n_cat == 0 the reference's
    ``x_hat[..., :-0]`` is empty and ``x_hat[..., -0:]`` is the full tensor, so
    the line is a no-op — all shipped configs hit that path; we match it."""
    if n_cat == 0:
        return x_hat
    return jnp.concatenate(
        [l2norm(x_hat[..., :-n_cat]), x_hat[..., -n_cat:]], axis=-1
    )


def forward(
    params,
    cfg: RqVaeConfig,
    x: jax.Array,
    *,
    gumbel_t: float,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> RqVaeLosses:
    """Full train/eval forward (reference modules/rqvae.py:140-165)."""
    out = get_semantic_ids(
        params, cfg, x, gumbel_t=gumbel_t, training=training, rng=rng
    )
    x_hat = decode(params, cfg, jnp.sum(out.embeddings, axis=-1))
    x_hat = _split_l2norm(x_hat, cfg.n_cat_feats)

    # fp32 loss island under bf16 compute (utils/amp.py)
    recon = categorical_reconstruction_loss(x_hat, x, cfg.n_cat_feats).astype(
        jnp.float32
    )
    loss = jnp.mean(recon + out.quantize_loss.astype(jnp.float32))

    sg = jax.lax.stop_gradient
    embs_norm = jnp.linalg.norm(sg(out.embeddings), axis=1)  # (B, L)
    ids = sg(out.sem_ids)
    eq = jnp.all(ids[:, None, :] == ids[None, :, :], axis=-1)  # (B, B)
    b = ids.shape[0]
    upper = jnp.triu(eq, k=1)  # duplicates strictly above the diagonal
    is_unique_row = jnp.all(~upper, axis=1)
    p_unique = jnp.sum(is_unique_row) / b

    return RqVaeLosses(
        loss=loss,
        reconstruction_loss=jnp.mean(recon),
        rqvae_loss=jnp.mean(out.quantize_loss),
        embs_norm=embs_norm,
        p_unique_ids=p_unique,
    )


def effective_codebooks(params, cfg: RqVaeConfig) -> jax.Array:
    """(L, K, D) stack of post-SimVQ / post-norm codebooks, one per level
    (the per-level out_proj of reference modules/quantize.py:70-73,105)."""
    return jnp.stack(
        [
            quantize.effective_codebook(
                params["layers"][level],
                normalize=(level == 0 and cfg.codebook_normalize),
            )
            for level in range(cfg.n_layers)
        ],
        axis=0,
    )


def encode_and_tokenize(params, cfg: RqVaeConfig, x: jax.Array) -> jax.Array:
    """Hard-argmin tokenization: encoder MLP + the fused Pallas RQ kernel.

    Semantics match ``get_semantic_ids(...).sem_ids`` in eval mode; used for
    corpus precompute and any ids-only path. Falls back to the jnp reference
    when Pallas is disabled (RQVAE_TPU_DISABLE_PALLAS=1).
    """
    from rqvae_tpu.ops import dispatch

    if not dispatch.pallas_enabled() or not _fused_shardable(x):
        return get_semantic_ids(params, cfg, x).sem_ids

    from jax.sharding import PartitionSpec as P

    from rqvae_tpu.ops import quantize_pallas
    from rqvae_tpu.parallel.mesh import DATA_AXIS

    z = encode(params, cfg, x)
    cbs = effective_codebooks(params, cfg)
    bsp = P(DATA_AXIS)
    call = dispatch.shard_over_batch(
        lambda z_, cb_: quantize_pallas.rq_tokenize(
            z_, cb_, commitment_weight=cfg.commitment_weight
        ).sem_ids,
        in_specs=(bsp, P()),
        out_specs=bsp,
    )
    return call(z, cbs)


def kmeans_prime(
    params,
    cfg: RqVaeConfig,
    x: jax.Array,
    rng: jax.Array,
    *,
    gumbel_t: float = 0.2,
) -> dict:
    """Sequential per-level kmeans codebook init on a priming batch.

    Matches the reference's lazy-init order (modules/quantize.py:102-103):
    level i's kmeans runs on the residuals left after level i-1's
    *training-mode* forward (post its own kmeans init). Returns new params.
    """
    res = encode(params, cfg, x)
    layers = list(params["layers"])
    for level in range(cfg.n_layers):
        rng, k_km, k_fwd = jax.random.split(rng, 3)
        centroids = kmeans_lib.kmeans(k_km, res, cfg.codebook_size).centroids
        layers[level] = {**layers[level], "codebook": centroids}
        out = quantize.apply(
            layers[level],
            res,
            temperature=gumbel_t,
            training=True,
            rng=k_fwd,
            **_level_kwargs(cfg, level),
        )
        res = res - out.embeddings
    return {**params, "layers": layers}
