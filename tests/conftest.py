"""Test harness config: run everything on 8 virtual CPU devices.

Multi-chip sharding is validated on a simulated device mesh (the standard JAX
pattern for testing pjit/shard_map without a pod). The axon sitecustomize may
have imported jax already, so we override via jax.config rather than env vars.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual cpu devices, got {len(devs)}"
    return devs


@pytest.fixture(autouse=True)
def _reset_execution_mesh():
    """Pallas dispatch routes by the globally-registered execution mesh
    (ops/dispatch.py); make_mesh registers one as a side effect. Clear it
    around every test so routing never depends on which test ran last."""
    from rqvae_tpu.ops import dispatch

    dispatch.set_execution_mesh(None)
    yield
    dispatch.set_execution_mesh(None)
