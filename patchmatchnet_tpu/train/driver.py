"""High-level training driver: epochs, logging, checkpointing, validation.

Capability parity with the reference training CLI (reference: train.py) on
the TPU-native stack: data-parallel mesh, jitted steps, msgpack checkpoints,
TensorBoard/JSONL metrics. Alongside each `params_*.ckpt.msgpack` (full
training state) an inference-only `module_*.msgpack` (params + batch stats)
is exported — the deliberate analog of the reference's TorchScript module
export (reference: train.py:50-55).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from patchmatchnet_tpu.compat import convert_torch_checkpoint, load_variables, save_variables
from patchmatchnet_tpu.config import Config
from patchmatchnet_tpu.data import BatchLoader, DTULegacyDataset, MVSDataset
from patchmatchnet_tpu.models import PatchmatchNet
from patchmatchnet_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from patchmatchnet_tpu.train.loop import (
    create_train_state,
    find_latest_checkpoint,
    load_train_checkpoint,
    make_eval_step,
    make_optimizer,
    make_train_step,
    multistep_lr,
    save_train_checkpoint,
)
from patchmatchnet_tpu.utils.logging import MetricsLogger
from patchmatchnet_tpu.utils.metrics import DictAverageMeter
from patchmatchnet_tpu.utils.profiling import PhaseTimer, jax_trace


def build_model(cfg: Config, inference: bool = False) -> PatchmatchNet:
    m = cfg.model
    # Inference precision from cfg.model.precision; training precision from
    # cfg.model.train_precision (bf16 = mixed-precision trainer with f32
    # params/BN/loss/optimizer — see ModelConfig for the measured evidence;
    # --train_precision f32 reproduces the reference trainer exactly).
    knob = "precision" if inference else "train_precision"
    dtype = None
    if getattr(m, knob, "f32") == "bf16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    return PatchmatchNet(
        patchmatch_interval_scale=tuple(m.patchmatch_interval_scale),
        propagation_range=tuple(m.propagation_range),
        patchmatch_iteration=tuple(m.patchmatch_iteration),
        patchmatch_num_sample=tuple(m.patchmatch_num_sample),
        propagate_neighbors=tuple(m.propagate_neighbors),
        evaluate_neighbors=tuple(m.evaluate_neighbors),
        compute_dtype=dtype,
    )


def load_any_checkpoint(path: str):
    """Load inference variables from either a converted .msgpack or a torch
    reference .ckpt (auto-detected)."""
    if path.endswith(".ckpt") or path.endswith(".pt"):
        return convert_torch_checkpoint(path)
    return load_variables(path)


def _init_variables(model: PatchmatchNet, sample_batch, seed: int):
    return model.init(
        {"params": jax.random.PRNGKey(seed), "sample": jax.random.PRNGKey(seed + 1)},
        jnp.asarray(sample_batch["images"]),
        jnp.asarray(sample_batch["intrinsics"]),
        jnp.asarray(sample_batch["extrinsics"]),
        jnp.asarray(sample_batch["depth_min"]),
        jnp.asarray(sample_batch["depth_max"]),
        train=True,
    )


def run_training(
    cfg: Config,
    num_devices: Optional[int] = None,
    profile_dir: str = "",
    profile_steps: int = 5,
) -> None:
    t = cfg.train
    d = cfg.data
    os.makedirs(t.output_folder, exist_ok=True)
    cfg.save(os.path.join(t.output_folder, "config.json"))

    if d.dataset == "dtu_legacy":
        # raw DTU layout (reference train_dtu.py path); num_views here is the
        # TOTAL view count including the reference view, as in the legacy CLI
        train_dataset = DTULegacyDataset(
            d.input_folder, t.train_list, num_views=d.num_views,
            robust_train=t.robust_train,
        )
        val_dataset = DTULegacyDataset(
            d.input_folder, t.test_list, num_views=d.num_views
        )
    else:
        train_dataset = MVSDataset(
            d.input_folder,
            num_views=d.num_views,
            max_dim=d.image_max_dim,
            scan_list=t.train_list,
            num_light_idx=d.num_light_idx,
            image_extension=d.image_extension,
            robust_train=t.robust_train,
        )
        val_dataset = MVSDataset(
            d.input_folder,
            num_views=d.num_views,
            max_dim=d.image_max_dim,
            scan_list=t.test_list,
            num_light_idx=d.num_light_idx,
            image_extension=d.image_extension,
        )
    train_loader = BatchLoader(
        train_dataset, d.batch_size, shuffle=True, drop_last=True, seed=t.rand_seed
    )
    val_loader = BatchLoader(val_dataset, d.batch_size, shuffle=False)

    mesh = make_mesh(num_devices)
    n_dev = int(np.prod(mesh.devices.shape))
    if d.batch_size % n_dev != 0:
        raise ValueError(
            f"batch_size {d.batch_size} must be divisible by {n_dev} devices"
        )

    model = build_model(cfg)
    sample = next(iter(train_loader))
    variables = _init_variables(model, sample, t.rand_seed)

    steps_per_epoch = len(train_loader)
    schedule = multistep_lr(t.learning_rate, t.lr_epochs, steps_per_epoch)
    tx = make_optimizer(schedule, t.weight_decay)
    state = create_train_state(model, variables, tx)

    backend = getattr(t, "ckpt_backend", "msgpack")
    start_epoch = 0
    if backend == "orbax":
        from patchmatchnet_tpu.train.checkpoints import (
            find_latest_orbax_checkpoint,
            load_orbax_checkpoint,
        )

        ckpt_path = t.checkpoint_path or find_latest_orbax_checkpoint(
            t.output_folder
        )
    else:
        ckpt_path = t.checkpoint_path or find_latest_checkpoint(t.output_folder)
    if t.resume and ckpt_path and os.path.isdir(str(ckpt_path)) and backend == "orbax":
        print(f"Resuming from {ckpt_path} (orbax)")
        state, last_epoch = load_orbax_checkpoint(ckpt_path, state)
        start_epoch = last_epoch + 1
    elif t.resume and ckpt_path and os.path.isfile(ckpt_path):
        print(f"Resuming from {ckpt_path}")
        state, last_epoch = load_train_checkpoint(ckpt_path, state)
        start_epoch = last_epoch + 1
    elif t.checkpoint_path and os.path.isfile(t.checkpoint_path):
        # warm start from inference variables
        v = load_any_checkpoint(t.checkpoint_path)
        state = create_train_state(
            model, {"params": v["params"], "batch_stats": v["batch_stats"]}, tx
        )

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"Number of model parameters: {n_params}")
    print(f"Mesh: {mesh}; steps/epoch: {steps_per_epoch}")

    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(model)
    logger = MetricsLogger(t.output_folder)
    rng = jax.random.PRNGKey(t.rand_seed)
    timer = PhaseTimer()

    for epoch in range(start_epoch, t.epochs):
        print(f"Epoch {epoch + 1}:")
        # training
        batch_iter = iter(train_loader)
        for batch_idx in range(steps_per_epoch):
            tick = time.time()
            global_step = epoch * steps_per_epoch + batch_idx
            with timer("data"):
                batch = next(batch_iter)
                sharded = shard_batch(
                    {k: v for k, v in batch.items() if k != "filename"}, mesh
                )
            rng, key = jax.random.split(rng)
            capture = (
                profile_dir and epoch == start_epoch and batch_idx == 1
            )
            with jax_trace(profile_dir if capture else None):
                with timer("step"):
                    state, metrics, image_outputs = train_step(state, sharded, key)
                    if capture or batch_idx < profile_steps:
                        jax.block_until_ready(metrics["loss"])
            if global_step % (50 * t.summary_freq) == 0:
                for name, img in image_outputs.items():
                    arr = np.asarray(img[0])
                    logger.image("train", name, arr, global_step)
            if global_step % t.summary_freq == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                logger.scalars("train", {**metrics, **timer.as_dict()}, global_step)
                print(
                    f"Epoch {epoch + 1}/{t.epochs}, Iter {batch_idx + 1}/"
                    f"{steps_per_epoch}, loss = {metrics['loss']:.3f}, "
                    f"time = {time.time() - tick:.3f}"
                )
        print(f"epoch phases: {timer.summary()}")
        logger.flush()

        # checkpoint + inference-module export
        if (epoch + 1) % t.save_freq == 0:
            host_state = jax.tree.map(np.asarray, state)
            if backend == "orbax":
                from patchmatchnet_tpu.train.checkpoints import (
                    save_orbax_checkpoint,
                )

                save_orbax_checkpoint(
                    os.path.join(t.output_folder, f"orbax_{epoch:06d}"),
                    host_state,
                    epoch,
                )
            else:
                save_train_checkpoint(
                    os.path.join(
                        t.output_folder, f"params_{epoch:06d}.ckpt.msgpack"
                    ),
                    host_state,
                    epoch,
                )
            save_variables(
                os.path.join(t.output_folder, f"module_{epoch:06d}.msgpack"),
                {"params": host_state.params, "batch_stats": host_state.batch_stats},
            )

        # validation
        meter = DictAverageMeter()
        for batch in val_loader:
            rng, key = jax.random.split(rng)
            arrays = {
                k: jnp.asarray(v) for k, v in batch.items() if k != "filename"
            }
            metrics = eval_step(state, arrays, key)
            meter.update({k: float(v) for k, v in metrics.items()})
        means = meter.mean()
        logger.scalars("full_test", means, (epoch + 1) * steps_per_epoch)
        print(f"avg_test_scalars: {means}")

    logger.close()
