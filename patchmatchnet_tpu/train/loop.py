"""Train/eval steps for PatchmatchNet on a data-parallel mesh.

Equivalent capability to the reference training driver (reference:
train.py:19-180): Adam + MultiStep LR from a "10,12,14:2" style spec,
multi-stage smooth-L1 loss over the GT pyramid, per-stage error metrics and
1/2/4/8-unit threshold metrics, checkpoint save/resume.

TPU-native specifics:
- one jitted step under jax.sharding (batch sharded over the `data` axis,
  params replicated) — gradient reduction is an XLA psum over ICI, no
  explicit collectives in user code;
- BatchNorm batch statistics are computed over the GLOBAL batch (sync-BN).
  The reference's DataParallel normalizes per replica; global stats are the
  better-behaved choice at large batch and are documented as a deliberate
  deviation.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from patchmatchnet_tpu.models.net import PatchmatchNet, patchmatchnet_loss
from patchmatchnet_tpu.ops.resize import downsample_nearest
from patchmatchnet_tpu.utils.metrics import absolute_depth_error, threshold_error


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def multistep_lr(
    base_lr: float, lr_epochs: str, steps_per_epoch: int
) -> optax.Schedule:
    """Parse the reference LR spec "e1,e2,e3:gamma_inv" (reference:
    train.py:27-29) into a step-wise schedule: lr is divided by gamma_inv at
    the start of each milestone epoch."""
    milestones = [int(e) for e in lr_epochs.split(":")[0].split(",")]
    gamma = 1.0 / float(lr_epochs.split(":")[1])
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    learning_rate: optax.ScalarOrSchedule, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Adam(b1=0.9, b2=0.999) with optional L2, as in the reference
    (reference: train.py:284-285)."""
    if weight_decay > 0:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate, b1=0.9, b2=0.999),
        )
    return optax.adam(learning_rate, b1=0.9, b2=0.999)


def create_train_state(
    model: PatchmatchNet,
    variables: Dict[str, Any],
    tx: optax.GradientTransformation,
) -> TrainState:
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def build_stage_pyramid(
    depth_gt: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """GT/mask pyramids at scales 1, 1/2, 1/4, 1/8 via nearest downsampling
    (reference: train.py:174-180). Inputs [B, H, W]."""
    gt4 = depth_gt[..., None]
    m4 = mask.astype(jnp.float32)[..., None]
    gts = [depth_gt] + [downsample_nearest(gt4, f)[..., 0] for f in (2, 4, 8)]
    masks = [mask.astype(bool)] + [
        downsample_nearest(m4, f)[..., 0].astype(bool) for f in (2, 4, 8)
    ]
    return gts, masks


def _compute_metrics(
    depth_patchmatch: Dict[int, List[jnp.ndarray]],
    gts: Sequence[jnp.ndarray],
    masks: Sequence[jnp.ndarray],
    thresholds: Sequence[float] = (1.0, 2.0, 4.0, 8.0),
) -> Dict[str, jnp.ndarray]:
    metrics: Dict[str, jnp.ndarray] = {}
    for i in range(4):
        metrics[f"depth-error-stage-{i}"] = absolute_depth_error(
            depth_patchmatch[i][-1], gts[i], masks[i]
        )
    for t in thresholds:
        metrics[f"threshold-{t:g}mm-error"] = threshold_error(
            depth_patchmatch[0][-1], gts[0], masks[0], t
        )
    return metrics


def make_train_step(
    model: PatchmatchNet,
    tx: optax.GradientTransformation,
    with_grads: bool = False,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    `batch` is a dict with images [B,N,H,W,3], intrinsics [B,N,3,3],
    extrinsics [B,N,4,4], depth_min/max [B], depth_gt [B,H,W], mask [B,H,W].

    `with_grads=True` adds the raw parameter-gradient pytree to the metrics
    under "grads" (diagnostics: precision comparisons, grad-norm debugging).
    The arrays stay on device unless pulled; production drivers leave this
    off so the step's outputs stay scalar metrics + image summaries.
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Tuple[TrainState, Dict]:
        gts, masks = build_stage_pyramid(batch["depth_gt"], batch["mask"])

        def loss_fn(params):
            (depth, _, dp), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"],
                batch["intrinsics"],
                batch["extrinsics"],
                batch["depth_min"],
                batch["depth_max"],
                train=True,
                rngs={"sample": rng},
                # diagnostics: windowed-sampler escape counters. The bf16
                # trainer uses the windowed sampler, whose out-of-band
                # samples contribute ZERO similarity — invisible in the
                # loss. Surfacing the counter as a metric makes an escaping
                # train geometry diagnosable from the logs (it should read
                # 0; if not, the window bound needs deriving for that
                # geometry — ops/pallas/window_bounds). f32 training uses
                # the exact gather sampler and always reads 0.
                mutable=["batch_stats", "diagnostics"],
            )
            loss = patchmatchnet_loss(dp, gts, masks)
            escapes = sum(
                jax.tree.leaves(updates.get("diagnostics", {})),
                jnp.zeros((), jnp.int32),
            )
            return loss, (updates["batch_stats"], dp, escapes)

        (loss, (new_stats, dp, escapes)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "windowed-escapes": escapes.astype(jnp.float32),
            **_compute_metrics(dp, gts, masks),
        }
        if with_grads:
            metrics["grads"] = grads
        # image summaries (stay on device unless the caller pulls them;
        # reference counterpart: train_dtu.py:224-236)
        m0 = masks[0].astype(jnp.float32)
        images = {
            "ref-image": batch["images"][:, 0],
            "depth-gt-stage-0": gts[0] * m0,
            "depth-refined-stage-0": dp[0][-1] * m0,
            "error-map-stage-0": jnp.abs(dp[0][-1] - gts[0]) * m0,
        }
        for i in (1, 2, 3):
            mi = masks[i].astype(jnp.float32)
            images[f"depth-stage-{i}"] = dp[i][-1] * mi
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics, images

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model: PatchmatchNet) -> Callable:
    """Validation step: (state, batch, rng) -> metrics (running BN stats)."""

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> Dict:
        gts, masks = build_stage_pyramid(batch["depth_gt"], batch["mask"])
        _, _, dp = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"],
            batch["intrinsics"],
            batch["extrinsics"],
            batch["depth_min"],
            batch["depth_max"],
            train=False,
            rngs={"sample": rng},
        )
        loss = patchmatchnet_loss(dp, gts, masks)
        return {"loss": loss, **_compute_metrics(dp, gts, masks)}

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Checkpointing (reference counterpart: train.py:45-55, 183-189, 287-302)
# ---------------------------------------------------------------------------


def save_train_checkpoint(path: str, state: TrainState, epoch: int) -> None:
    """Persist {epoch, params, batch_stats, opt_state, step} as msgpack."""
    payload = {
        "epoch": np.asarray(epoch, np.int32),
        "step": np.asarray(state.step),
        "params": flax.serialization.to_state_dict(
            jax.tree.map(np.asarray, state.params)
        ),
        "batch_stats": flax.serialization.to_state_dict(
            jax.tree.map(np.asarray, state.batch_stats)
        ),
        "opt_state": flax.serialization.to_state_dict(
            jax.tree.map(np.asarray, state.opt_state)
        ),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))


def load_train_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Restore a checkpoint into the template `state`. Returns (state, epoch)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    new_state = TrainState(
        step=jnp.asarray(payload["step"]),
        params=flax.serialization.from_state_dict(state.params, payload["params"]),
        batch_stats=flax.serialization.from_state_dict(
            state.batch_stats, payload["batch_stats"]
        ),
        opt_state=flax.serialization.from_state_dict(
            state.opt_state, payload["opt_state"]
        ),
    )
    return new_state, int(payload["epoch"])


def find_latest_checkpoint(folder: str, pattern_suffix: str = ".ckpt.msgpack") -> str:
    """Latest params_XXXXXX checkpoint by epoch number (reference:
    train.py:183-189)."""
    if not os.path.isdir(folder):
        return ""
    saved = [fn for fn in os.listdir(folder) if fn.endswith(pattern_suffix)]
    if not saved:
        return ""
    saved.sort(key=lambda x: int(x.split("_")[-1].split(".")[0]))
    return os.path.join(folder, saved[-1])
