"""PatchmatchNet: 4-stage coarse-to-fine cascade orchestrator + loss.

Behavior parity with the reference top model (reference: models/net.py:125-301
and net.py:321-342). TPU-native conventions:

- inputs are stacked NHWC arrays with static shapes: images [B, N, H, W, 3]
  with H, W multiples of 8 (the reference's in-graph `adjust_image_dims`
  resize, net.py:304-318, is done host-side in the data/infer layers so the
  jitted graph keeps static shapes);
- stochastic stage-3 hypothesis initialization draws from an explicit
  'sample' RNG collection (the reference uses ambient torch.rand,
  patchmatch.py:61; here inference is reproducible by key);
- outputs are at the (adjusted) input resolution; any resize back to the
  original resolution is host-side.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from patchmatchnet_tpu.models.feature import FeatureNet
from patchmatchnet_tpu.models.patchmatch import PatchMatch
from patchmatchnet_tpu.models.refinement import Refinement
from patchmatchnet_tpu.ops.resize import upsample_nearest_x2

DEFAULT_INTERVAL_SCALE = (0.005, 0.0125, 0.025)
DEFAULT_PROPAGATION_RANGE = (6, 4, 2)
DEFAULT_ITERATIONS = (1, 2, 2)
DEFAULT_NUM_SAMPLES = (8, 8, 16)
DEFAULT_PROPAGATE_NEIGHBORS = (0, 8, 16)
DEFAULT_EVALUATE_NEIGHBORS = (9, 9, 9)
STAGE_FEATURES = (16, 32, 64)
STAGE_GROUPS = (4, 8, 8)


class PatchmatchNet(nn.Module):
    """Complete PatchmatchNet model.

    Stage hyperparameter tuples are indexed [stage1, stage2, stage3] as in
    the reference CLIs (reference: train.py:222-233).
    """

    patchmatch_interval_scale: Tuple[float, ...] = DEFAULT_INTERVAL_SCALE
    propagation_range: Tuple[int, ...] = DEFAULT_PROPAGATION_RANGE
    patchmatch_iteration: Tuple[int, ...] = DEFAULT_ITERATIONS
    patchmatch_num_sample: Tuple[int, ...] = DEFAULT_NUM_SAMPLES
    propagate_neighbors: Tuple[int, ...] = DEFAULT_PROPAGATE_NEIGHBORS
    evaluate_neighbors: Tuple[int, ...] = DEFAULT_EVALUATE_NEIGHBORS
    # Optional reduced-precision compute (e.g. jnp.bfloat16) for the
    # feature/correlation path; geometry, softmax, regression and the
    # refinement head stay f32. None = full f32 (bit-close to the reference).
    compute_dtype: Any = None

    def setup(self):
        self.stages = 4
        self.feature = FeatureNet(dtype=self.compute_dtype)
        self.patchmatch_1 = self._make_stage(1)
        self.patchmatch_2 = self._make_stage(2)
        self.patchmatch_3 = self._make_stage(3)
        self.upsample_net = Refinement(dtype=self.compute_dtype)

    def _make_stage(self, stage: int) -> PatchMatch:
        i = stage - 1
        return PatchMatch(
            propagation_out_range=self.propagation_range[i],
            patchmatch_iteration=self.patchmatch_iteration[i],
            patchmatch_num_sample=self.patchmatch_num_sample[i],
            patchmatch_interval_scale=self.patchmatch_interval_scale[i],
            num_feature=STAGE_FEATURES[i],
            groups=STAGE_GROUPS[i],
            propagate_neighbors=self.propagate_neighbors[i],
            evaluate_neighbors=self.evaluate_neighbors[i],
            stage=stage,
            dtype=self.compute_dtype,
        )

    def __call__(
        self,
        images: jnp.ndarray,
        intrinsics: jnp.ndarray,
        extrinsics: jnp.ndarray,
        depth_min: jnp.ndarray,
        depth_max: jnp.ndarray,
        train: bool = False,
        init_noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[int, List[jnp.ndarray]]]:
        """Forward pass.

        Args:
            images: [B, N, H, W, 3], view 0 is the reference view; H, W
                multiples of 8.
            intrinsics: [B, N, 3, 3] for the given H x W resolution.
            extrinsics: [B, N, 4, 4] world-to-camera.
            depth_min / depth_max: [B] scene depth range.
            train: batch-stats mode for BatchNorm.
            init_noise: optional [B, 48, H/8, W/8] uniform noise overriding
                the 'sample' RNG draw (for deterministic replay/testing).

        Returns:
            (refined depth [B, H, W],
             photometric confidence [B, H, W] (zeros when train=True),
             depth_patchmatch: {stage: [per-iteration depths [B, H, W]]}).
        """
        batch, num_views, height, width = images.shape[:4]
        if height % 8 != 0 or width % 8 != 0:
            raise ValueError(
                "PatchmatchNet requires H, W multiples of 8; adjust host-side "
                f"(got {height}x{width})"
            )

        ref_image = images[:, 0]
        depth_min = depth_min.astype(jnp.float32).reshape(batch)
        depth_max = depth_max.astype(jnp.float32).reshape(batch)

        # Step 1: multi-scale features per view.
        if train:
            # per-view calls so BatchNorm batch statistics match the
            # reference's per-view FeatureNet invocations (net.py:204-206)
            features = [self.feature(images[:, v], train) for v in range(num_views)]
        else:
            # inference uses running stats -> fold views into the batch for
            # one large conv pass (better MXU utilization)
            stacked = self.feature(
                images.reshape(batch * num_views, height, width, 3), False
            )
            features = [
                {k: v.reshape(batch, num_views, *v.shape[1:])[:, i] for k, v in stacked.items()}
                for i in range(num_views)
            ]
        ref_feature, src_features = features[0], features[1:]

        # Step 2: per-stage projection matrices (K scaled per level).
        hi = jax.lax.Precision.HIGHEST
        projs: Dict[int, jnp.ndarray] = {}
        scale = 0.125
        for stage in range(3, 0, -1):
            k_scaled = intrinsics.at[:, :, :2].multiply(scale)
            proj = extrinsics.at[:, :, :3, :4].set(
                jnp.matmul(k_scaled, extrinsics[:, :, :3, :4], precision=hi)
            )
            projs[stage] = proj
            scale *= 2.0

        depth: Optional[jnp.ndarray] = None
        view_weights: Optional[jnp.ndarray] = None
        score = None
        depth_patchmatch: Dict[int, List[jnp.ndarray]] = {}

        for stage in range(3, 0, -1):
            pm = {3: self.patchmatch_3, 2: self.patchmatch_2, 1: self.patchmatch_1}[stage]
            proj = projs[stage]
            depths, score, view_weights = pm(
                ref_feature=ref_feature[stage],
                src_features=[f[stage] for f in src_features],
                ref_proj=proj[:, 0],
                src_projs=[proj[:, v] for v in range(1, num_views)],
                depth_min=depth_min,
                depth_max=depth_max,
                depth=depth,
                view_weights=view_weights,
                init_noise=init_noise if stage == 3 else None,
                train=train,
            )
            depth_patchmatch[stage] = depths
            depth = jax.lax.stop_gradient(depths[-1])

            if stage > 1:
                depth = upsample_nearest_x2(depth[..., None])[..., 0]
                view_weights = upsample_nearest_x2(view_weights)

        # Step 3: refinement to full resolution.
        depth = self.upsample_net(ref_image, depth, depth_min, depth_max, train)
        depth_patchmatch[0] = [depth]

        if train:
            return depth, jnp.zeros_like(depth), depth_patchmatch

        # Photometric confidence: probability mass of the 4 hypotheses around
        # the regressed index (reference: net.py:289-299). `score` is the
        # final stage-1 score [B, H/2, W/2, D].
        num_depth = self.patchmatch_num_sample[0]
        padded = jnp.pad(score, ((0, 0), (0, 0), (0, 0), (1, 2)))
        score_sum4 = (
            padded[..., 0:num_depth]
            + padded[..., 1 : num_depth + 1]
            + padded[..., 2 : num_depth + 2]
            + padded[..., 3 : num_depth + 3]
        )
        index = jnp.sum(
            jnp.arange(num_depth, dtype=score.dtype) * score, axis=-1
        )
        index = jnp.clip(index.astype(jnp.int32), 0, num_depth - 1)
        # dense one-hot pick over the tiny D axis (a gather here costs
        # per-index; 8 selects are ~free on the VPU)
        onehot = index[..., None] == jnp.arange(num_depth, dtype=jnp.int32)
        confidence = jnp.sum(score_sum4 * onehot.astype(score_sum4.dtype), axis=-1)
        confidence = upsample_nearest_x2(confidence[..., None])[..., 0]
        return depth, confidence, depth_patchmatch


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber, beta=1) matching F.smooth_l1_loss."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def patchmatchnet_loss(
    depth_patchmatch: Dict[int, List[jnp.ndarray]],
    depth_gt: Sequence[jnp.ndarray],
    mask: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Masked smooth-L1 summed over every iteration of every stage
    (reference: net.py:321-342).

    Args:
        depth_patchmatch: {stage: [depths [B, H_s, W_s]]}, stages 0..3.
        depth_gt / mask: per-stage GT pyramid, each [B, H_s, W_s]
            (mask is boolean).
    """
    loss = jnp.asarray(0.0, jnp.float32)
    for i in range(4):
        m = mask[i].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        for depth in depth_patchmatch[i]:
            loss = loss + jnp.sum(smooth_l1_loss(depth, depth_gt[i]) * m) / denom
    return loss
