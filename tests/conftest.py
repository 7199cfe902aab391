"""Test configuration: force CPU with a virtual 8-device mesh BEFORE jax backend init.

Multi-chip sharding tests run against this fake mesh (no TPU hardware needed);
numerics tests compare against torch CPU goldens.

Note: in this environment the axon TPU plugin ignores the JAX_PLATFORMS env
var, so we must use jax.config.update(). XLA_FLAGS must still be set before
the CPU client is created.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Keep matmuls in full f32 for bit-level comparisons with torch.
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
