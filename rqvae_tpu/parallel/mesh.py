"""Device mesh + sharding rules (the entire "distributed backend").

Parity/contrast: the reference's only distribution strategy is DDP via HF
Accelerate (train_rqvae.py:60-63 — NCCL all-reduce of grads, split_batches).
The TPU-native equivalent is GSPMD: one jit-compiled train step over a
``Mesh(('data', 'model'))`` where

  * the batch is sharded over 'data' (grad psum inserted by XLA — this IS
    data parallelism, no hand-written collectives);
  * large embedding tables / codebooks / FFN weights may be sharded over
    'model' (tensor parallelism; all-gather / reduce-scatter inserted by XLA
    where the einsums demand it — the BASELINE.json "sharded codebook +
    SemIdEmbedder with all-to-all lookup" configuration).

Multi-host: the same code runs under ``jax.distributed.initialize`` — mesh
axes spanning hosts ride DCN, intra-host axes ride ICI. Nothing here is
host-count-aware by design.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> int:
    """Multi-host bring-up: call jax.distributed.initialize() when a
    coordinator is configured (JAX_COORDINATOR_ADDRESS) or Cloud TPU pod env
    indicates multiple workers, idempotently. Returns jax.process_count().
    Single-host runs are a no-op — the same train loops serve 1 chip and N
    hosts (SURVEY.md §2 parallelism table: DP via mesh sharding, not a
    separate code path)."""
    import os
    import sys

    pod_env = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker_pod = len([h for h in pod_env.split(",") if h]) > 1
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator or multi_worker_pod:
        # ORDER MATTERS: initialize() must run before ANY backend-touching
        # call — including jax.process_count(), which initializes the
        # backend and would make initialize() raise unconditionally (the
        # round-2 reviewer confirmed the old env-after-process_count order
        # made this whole branch dead code). Callers must invoke this
        # before their first JAX computation. initialize() does not read
        # JAX_NUM_PROCESSES/JAX_PROCESS_ID itself (it only auto-detects
        # cluster schedulers), so forward them explicitly when set.
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
            if os.environ.get("JAX_NUM_PROCESSES"):
                kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
                kwargs["process_id"] = int(os.environ.get("JAX_PROCESS_ID", 0))
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError:
            pass  # already initialized (by the launcher or a prior call)
        except ValueError as e:
            print(f"WARNING: jax.distributed.initialize failed: {e}",
                  file=sys.stderr)
    if multi_worker_pod and jax.process_count() == 1:
        print(
            "WARNING: TPU pod topology detected (TPU_WORKER_HOSTNAMES has "
            "multiple workers) but jax.process_count() == 1 — each host is "
            "running an INDEPENDENT single-process job. Set "
            "JAX_COORDINATOR_ADDRESS or launch via a pod runtime that "
            "configures jax.distributed.",
            file=sys.stderr,
        )
    return jax.process_count()


def process_local_batch_size(global_batch: int) -> int:
    """split_batches semantics (reference train_rqvae.py:61): the configured
    batch size is GLOBAL; each host feeds its slice."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes"
    )
    return global_batch // n


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of (data, model) axes. Default: all devices on 'data', model=1
    (pure DP — matching the reference's capability envelope); pass e.g.
    shape=(4, 2) for DP x TP.

    Side effect: registers the mesh as the Pallas execution mesh
    (ops.dispatch.set_execution_mesh) so kernel call sites shard_map over it
    — Mosaic kernels are single-device programs that GSPMD cannot
    auto-partition. Tests comparing sharded vs unsharded paths can clear it
    with ``set_execution_mesh(None)``."""
    from rqvae_tpu.ops import dispatch

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    dispatch.set_execution_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_host_array(tree, mesh: Mesh):
    """Fully-replicated global array(s) from identical per-host data.

    Multi-process: every host must pass the SAME data (eval splits and the
    item corpus are loaded from the same artifacts on all hosts); the result
    is a valid global jax.Array usable alongside mesh-sharded params. Single
    process: a plain replicated device_put. Accepts pytrees."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def host_block(global_idx: np.ndarray, local_rows: int) -> np.ndarray:
    """This process's contiguous block of a global batch's row indices
    (the eval-side mirror of split_batches: host p feeds rows
    [p*local, (p+1)*local) of every global batch)."""
    p = jax.process_index()
    return global_idx[p * local_rows:(p + 1) * local_rows]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fetch_to_host(tree):
    """Host-numpy copy of a (possibly sharded) device pytree.

    Single process: plain device_get. Multi-process: device_get raises on
    arrays with non-addressable shards (e.g. tensor-parallel params whose
    'model' axis spans hosts), so gather across processes first
    (multihost_utils.process_allgather). COLLECTIVE in multi-process mode —
    every process must call it, even if only process 0 uses the result."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # tiled=True: reassemble each global array at its global shape
        # (replicated arrays come back unchanged; sharded axes concatenate)
        return multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Shard every leaf's dimension ``axis`` over 'data' (axis=1 for
    microbatch-stacked (accum, B, ...) layouts).

    Single-process: a device_put with a NamedSharding. Multi-process: each
    host holds only its slice of the global batch, assembled into a global
    jax.Array via make_array_from_process_local_data — the leaf passed in is
    the PROCESS-LOCAL slice (sample with a per-process seed)."""
    multiprocess = jax.process_count() > 1

    def put(x):
        dims = [None] * np.ndim(x)
        dims[axis] = DATA_AXIS
        sharding = NamedSharding(mesh, P(*dims))
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------

def dp_param_shardings(params, mesh: Mesh):
    """Pure data-parallel: all params replicated."""
    return jax.tree.map(lambda _: replicated(mesh), params)


def _retrieval_tp_spec(path: str, x) -> P:
    """Megatron-style specs for the retrieval model's big matrices.

    sem_emb (K*D+1, E): rows over 'model' — the all-to-all lookup table of
    BASELINE.json. wqkv/wkv/in_proj (in, out): columns over 'model';
    attn proj / out_proj (in, out): rows over 'model' (psum after).
    FFN: first matmul columns, second rows.
    """
    if x.ndim < 2:
        return P()
    if "sem_emb" in path:
        return P(MODEL_AXIS, None)
    if any(k in path for k in ("wqkv", "wkv", "wq", "in_proj")):
        return P(None, MODEL_AXIS)
    if "proj" in path and "in_proj" not in path:
        return P(MODEL_AXIS, None)
    if "ff_mlp" in path:
        # alternate: layer 0 column-sharded, layer 1 row-sharded
        idx = int(path.rsplit("[", 1)[-1].rstrip("]")) if path.endswith("]") else 0
        return P(None, MODEL_AXIS) if idx == 0 else P(MODEL_AXIS, None)
    return P()


def _rqvae_tp_spec(path: str, x) -> P:
    """Specs for the RQ-VAE param tree (BASELINE.json stretch config:
    codebook tables sharded over 'model' with the ID lookup's distance
    matmul partitioned — GSPMD inserts the cross-shard argmin reduction).

    codebook (K, D): rows over 'model' — each shard owns K/m codewords and
    computes its slice of the (B, K) distance matrix. sim_proj: columns.
    Encoder/decoder MLP stacks: Megatron alternation (even layers columns,
    odd layers rows -> psum), keeping activations sharded between pairs.
    """
    if x.ndim < 2:
        return P()
    if "codebook" in path:
        return P(MODEL_AXIS, None)
    if "sim_proj" in path:
        return P(None, MODEL_AXIS)
    if "encoder[" in path or "decoder[" in path:
        idx = int(path.rsplit("[", 1)[-1].rstrip("]"))
        return P(None, MODEL_AXIS) if idx % 2 == 0 else P(MODEL_AXIS, None)
    return P()


def _path_str(kp) -> str:
    parts = []
    for k in kp:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            if parts:
                parts[-1] = parts[-1] + f"[{k.idx}]"
            else:
                parts.append(f"[{k.idx}]")
    return "/".join(parts)


def _shardings_from_specs(params, mesh: Mesh, spec_fn):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = [
        NamedSharding(mesh, spec_fn(_path_str(kp), leaf))
        for kp, leaf in paths_and_leaves
    ]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, specs)


def tp_param_shardings(params, mesh: Mesh):
    """Tensor-parallel shardings for the retrieval model param tree."""
    return _shardings_from_specs(params, mesh, _retrieval_tp_spec)


def rqvae_tp_param_shardings(params, mesh: Mesh):
    """Tensor-parallel shardings for the RQ-VAE param tree (sharded
    codebooks + Megatron MLP alternation)."""
    return _shardings_from_specs(params, mesh, _rqvae_tp_spec)


def opt_state_shardings(opt_state, params, param_shardings, mesh: Mesh):
    """Shardings for an optax state: any subtree mirroring the params tree
    (Adam's mu/nu moments) gets the PARAMS shardings — so TP moments shard
    with their TP params instead of being replicated — and everything else
    (step counts, empty states) is replicated."""
    pdef = jax.tree_util.tree_structure(params)
    rep = replicated(mesh)

    def is_params_tree(node):
        try:
            return jax.tree_util.tree_structure(node) == pdef
        except Exception:  # pragma: no cover - defensive
            return False

    return jax.tree.map(
        lambda node: (
            param_shardings
            if is_params_tree(node)
            else jax.tree.map(lambda _: rep, node)
        ),
        opt_state,
        is_leaf=is_params_tree,
    )
