"""Timing experiment for the round-4 multichip dryrun fix.

Measures the cold wall time of one SPMD train step on an 8-virtual-device
CPU mesh using a small stand-in module that has the exact PatchmatchNet
apply signature/output structure (so the REAL make_train_step, shard_batch,
replicated params and psum-by-sharding grad reduction are exercised
unchanged), but a tiny traced graph.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/dev/time_standin_dryrun.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

t0 = time.time()

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from patchmatchnet_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from patchmatchnet_tpu.train import create_train_state, make_optimizer, make_train_step

print(f"imports: {time.time()-t0:.1f}s", flush=True)


class StandIn(nn.Module):
    """Same call signature + output structure as PatchmatchNet, tiny graph."""

    @nn.compact
    def __call__(self, images, intrinsics, extrinsics, depth_min, depth_max,
                 train: bool = False, init_noise=None):
        b, n, h, w, _ = images.shape
        ref = images[:, 0]
        x = nn.Conv(8, (3, 3), name="conv0")(ref)
        x = nn.BatchNorm(use_running_average=not train, name="bn0")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), name="conv1")(x)
        noise = self.make_rng("sample") if train else None
        if noise is not None:
            x = x + 0.0 * jax.random.uniform(noise, x.shape)
        # geometry args participate so grads flow through every input
        scale = jnp.mean(intrinsics) * 0 + 1.0 + 0 * jnp.mean(extrinsics)
        base = (depth_min + depth_max)[:, None, None] * 0.5
        d0 = x[..., 0] * scale + base  # [B, H, W]
        dp = {}
        for i in range(4):
            f = 2 ** i
            dp[i] = [jax.image.resize(d0, (b, h // f, w // f), "nearest")]
        conf = jnp.ones_like(d0)
        return dp[0][-1], conf, dp


def main(n_devices: int = 8) -> None:
    mesh = make_mesh(n_devices)
    b, n, h, w = n_devices, 2, 16, 16
    rng = np.random.default_rng(0)
    k = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, n, 4, 4)).copy()
    batch = {
        "images": rng.random((b, n, h, w, 3)).astype(np.float32),
        "intrinsics": np.broadcast_to(k, (b, n, 3, 3)).copy(),
        "extrinsics": extr,
        "depth_min": np.full(b, 2.0, np.float32),
        "depth_max": np.full(b, 10.0, np.float32),
        "depth_gt": (rng.random((b, h, w)) * 6 + 3).astype(np.float32),
        "mask": np.ones((b, h, w), dtype=bool),
    }

    model = StandIn()
    t = time.time()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(batch["images"]), jnp.asarray(batch["intrinsics"]),
        jnp.asarray(batch["extrinsics"]), jnp.asarray(batch["depth_min"]),
        jnp.asarray(batch["depth_max"]), train=True,
    )
    print(f"init: {time.time()-t:.1f}s", flush=True)

    tx = make_optimizer(1e-3)
    state = jax.device_put(create_train_state(model, variables, tx),
                           replicated_sharding(mesh))
    sharded = shard_batch(batch, mesh)
    step = make_train_step(model, tx)
    t = time.time()
    state, metrics, _ = step(state, sharded,
                             jax.device_put(jax.random.PRNGKey(0), replicated_sharding(mesh)))
    loss = float(metrics["loss"])
    print(f"step compile+run: {time.time()-t:.1f}s loss={loss:.4f}", flush=True)
    assert np.isfinite(loss)
    print(f"TOTAL: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
