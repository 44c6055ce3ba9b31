"""Backend dispatch for Pallas kernels.

Pallas kernels compile natively on TPU; everywhere else (the CPU test mesh,
local debugging) they run in interpret mode so every code path is exercised
by the same kernel source. ``RQVAE_TPU_DISABLE_PALLAS=1`` falls back to the
plain-jnp reference implementations entirely (escape hatch for triage).
"""
from __future__ import annotations

import contextlib
import os

import jax


def pallas_enabled() -> bool:
    """Whether callers should route hot ops through the Pallas kernels.

    Auto-selected on TPU only: interpret-mode Pallas is far slower than XLA's
    fused jnp path, so CPU (tests, local runs) takes the jnp reference
    implementations and the kernels are exercised there by explicit
    ``interpret=True`` parity tests.
    """
    if os.environ.get("RQVAE_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    if os.environ.get("RQVAE_TPU_FORCE_PALLAS", "0") == "1":
        # test override: route the kernels even off-TPU (they run in
        # interpret mode there) so sharded-mesh CPU tests exercise the
        # exact shard_map-wrapped Pallas paths the real chips take
        return True
    return jax.default_backend() == "tpu"


def use_interpret() -> bool:
    """Interpret-mode Pallas off-TPU (CPU tests), compiled on TPU."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Sharded execution: mesh registry + shard_map wrapper for Pallas call sites
# ---------------------------------------------------------------------------
# Mosaic kernels are single-device programs: a ``pallas_call`` traced under a
# jit whose operands are sharded over a mesh cannot be auto-partitioned by
# GSPMD the way jnp ops are. Every Pallas entry point therefore goes through
# :func:`shard_over_batch`, which — when a mesh is registered — wraps the
# kernel in ``jax.shard_map`` over the 'data' axis so each device runs the
# kernel on its batch shard (replicated operands such as codebooks or the
# prefix table broadcast in; their cotangents psum out, which IS the DP grad
# all-reduce). Train loops and the serving path register their mesh via
# :func:`set_execution_mesh` before building their jitted steps.

_EXECUTION_MESH = None


def set_execution_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh subsequent jitted steps are
    built for. Call before tracing; affects Pallas routing and wrapping."""
    global _EXECUTION_MESH
    _EXECUTION_MESH = mesh


def execution_mesh():
    return _EXECUTION_MESH


def divisible_over_data(n: int, heads=None) -> bool:
    """Whether a batch/row count (and optionally a head count over 'model')
    divides the registered mesh — the shard_map-wrapping precondition every
    Pallas call site checks. True with no mesh or a 1-device mesh;
    indivisible shapes take the jnp paths, which GSPMD partitions on its
    own."""
    from rqvae_tpu.parallel.mesh import DATA_AXIS

    mesh = _EXECUTION_MESH
    if mesh is None or mesh.size == 1:
        return True
    if n % int(mesh.shape[DATA_AXIS]) != 0:
        return False
    return heads is None or heads % model_axis_size() == 0


@contextlib.contextmanager
def local_execution():
    """Temporarily clear the registered mesh so a process-local computation
    (host-driven setup such as corpus tokenization, or host-0-only eval
    work) dispatches Pallas kernels single-device instead of shard_map-ing
    over a global mesh the current process cannot drive alone."""
    global _EXECUTION_MESH
    saved = _EXECUTION_MESH
    _EXECUTION_MESH = None
    try:
        yield
    finally:
        _EXECUTION_MESH = saved


def model_axis_size() -> int:
    from rqvae_tpu.parallel.mesh import MODEL_AXIS

    m = _EXECUTION_MESH
    return int(m.shape[MODEL_AXIS]) if m is not None else 1


def shard_over_batch(fn, in_specs, out_specs):
    """Wrap a Pallas entry point in shard_map over the registered mesh.

    ``in_specs``/``out_specs`` are PartitionSpecs (P('data', ...) for
    batch-sharded operands, P() for replicated ones). No mesh registered, or
    a 1-device mesh -> call ``fn`` directly (plain single-device dispatch).
    """
    import jax as _jax

    mesh = _EXECUTION_MESH
    if mesh is None or mesh.size == 1:
        return fn
    return _jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
