"""Measure XLA:CPU compile time of the fast-tier train step under
candidate compile-speed flags (VERDICT r4 item 2: the fast tier must run
in <5 min on this 1-core box; the wall is per-test multi-minute XLA:CPU
compiles of the train step).

Usage: python tools/dev/time_cpu_compile.py [extra-xla-flags...]
"""
import os
import sys
import time

extra = " ".join(sys.argv[1:])
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + extra
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from patchmatchnet_tpu.models import PatchmatchNet
from patchmatchnet_tpu.train.loop import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def tiny_batch(batch_size=1, num_views=2, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(batch_size, num_views, h, w, 3).astype(np.float32)
    intr = np.tile(np.eye(3, dtype=np.float32), (batch_size, num_views, 1, 1))
    intr[:, :, 0, 0] = intr[:, :, 1, 1] = 40.0
    intr[:, :, 0, 2] = w / 2.0
    intr[:, :, 1, 2] = h / 2.0
    extr = np.tile(np.eye(4, dtype=np.float32), (batch_size, num_views, 1, 1))
    extr[:, 1, 0, 3] = 0.1
    depth_min = np.full((batch_size,), 2.0, np.float32)
    depth_max = np.full((batch_size,), 10.0, np.float32)
    depth_gt = rng.rand(batch_size, h, w).astype(np.float32) * 8 + 2
    mask = np.ones((batch_size, h, w), dtype=bool)
    return {
        "images": jnp.asarray(images),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
        "depth_min": jnp.asarray(depth_min),
        "depth_max": jnp.asarray(depth_max),
        "depth_gt": jnp.asarray(depth_gt),
        "mask": jnp.asarray(mask),
    }


t0 = time.time()
batch = tiny_batch()
model = PatchmatchNet(patchmatch_iteration=(1, 1, 1))
init = model.init
if os.environ.get("JIT_INIT", "0") == "1":
    import functools

    init = jax.jit(functools.partial(model.init, train=True))
    variables = init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["intrinsics"], batch["extrinsics"],
        batch["depth_min"], batch["depth_max"],
    )
else:
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch["images"], batch["intrinsics"], batch["extrinsics"],
        batch["depth_min"], batch["depth_max"], train=True,
    )
t1 = time.time()
print(f"init: {t1 - t0:.1f}s", flush=True)

tx = make_optimizer(1e-3)
state = create_train_state(model, variables, tx)
step = make_train_step(model, tx)
new_state, metrics, _ = step(state, batch, jax.random.PRNGKey(42))
loss = float(metrics["loss"])
t2 = time.time()
print(f"train-step compile+run: {t2 - t1:.1f}s  loss={loss:.3f}", flush=True)
assert np.isfinite(loss)
