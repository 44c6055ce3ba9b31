"""Worker asserting that mesh.maybe_init_distributed() can SELF-initialize
multi-process JAX purely from environment variables — the round-2 review
found the old implementation called jax.process_count() (which initializes
the backend) before jax.distributed.initialize(), making auto-init dead
code. This worker never touches jax before the call.

Invoked with env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rqvae_tpu.parallel import mesh as mesh_lib  # noqa: E402

n = mesh_lib.maybe_init_distributed()
expected = int(os.environ["JAX_NUM_PROCESSES"])
assert n == expected, f"process_count {n} != {expected} (auto-init failed)"
assert len(jax.devices()) == 2 * expected
print(f"ENVINIT_OK {jax.process_index()}", flush=True)
