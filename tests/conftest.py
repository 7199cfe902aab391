"""Test configuration: force CPU with a virtual 8-device mesh BEFORE jax import.

Multi-chip sharding tests run against this fake mesh (no TPU hardware needed);
numerics tests compare against torch CPU goldens.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls in full f32 on CPU for bit-level comparisons with torch.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
