"""Backend dispatch for Pallas kernels.

Pallas kernels compile natively on TPU; everywhere else (the CPU test mesh,
local debugging) they run in interpret mode so every code path is exercised
by the same kernel source. ``RQVAE_TPU_DISABLE_PALLAS=1`` falls back to the
plain-jnp reference implementations entirely (escape hatch for triage).
"""
from __future__ import annotations

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
    return jax.default_backend() == "tpu"


def use_interpret() -> bool:
    """Interpret-mode Pallas off-TPU (CPU tests), compiled on TPU."""
    return jax.default_backend() != "tpu"
