"""Learned PatchMatch stage: initialization, adaptive propagation, adaptive
evaluation with group-wise correlation and pixel-wise view weighting.

Behavior parity with the reference PatchMatch module (reference:
models/patchmatch.py). Layouts are TPU-native NHWC / hypothesis-last:

- features:           [B, H, W, C]
- depth hypotheses:   [B, D, H, W]  (matches the warp op)
- similarity volume:  [B, D, H, W, G]
- sampling grids:     [B, K, H, W, 2] normalized (x, y)
- view weights:       [B, H, W, V]
- scores:             [B, H, W, D]
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from patchmatchnet_tpu.models.layers import (
    Conv2d,
    Dense1,
    DenseBnReLU,
)
from patchmatchnet_tpu.ops.grid_sample import grid_sample_2d
from patchmatchnet_tpu.ops.quad_sample import make_quad_image
from patchmatchnet_tpu.ops.pallas import warped_group_similarity
from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
    make_config as make_window_config,
    make_quad_table_2d,
    windowed_group_similarity_proj,
)
from patchmatchnet_tpu.ops.warp import warp_proj_coeffs, warp_taps

INITIAL_NUM_SAMPLES = 48  # stratified random inverse-depth samples on stage 3


def _stage_window_override(stage: int) -> Optional[Tuple[int, int]]:
    """Derived windowed-sampler geometry for `stage`, read at TRACE time.

    PATCHMATCHNET_TPU_WIN_S{stage} = "tw,hband" — set around a jit trace by
    infer.DepthEstimator / bench.py from the per-scene derivation
    (ops/pallas/window_bounds.derive_stage_windows). Unset = the
    env/HBAND_DEFAULT envelope inside make_config."""
    spec = os.environ.get(f"PATCHMATCHNET_TPU_WIN_S{stage}")
    if not spec:
        return None
    tw, hband = (int(v) for v in spec.split(","))
    return tw, hband


def _group_mean_matrix(channels: int, groups: int, dtype=jnp.float32) -> jnp.ndarray:
    """[C, G] block-diagonal averaging matrix: group-wise mean as one MXU
    matmul instead of a [..., G, C/G] reshape (which XLA repacks physically
    for small minor dims)."""
    cg = channels // groups
    m = np.zeros((channels, groups), np.float32)
    for g in range(groups):
        m[g * cg : (g + 1) * cg, g] = 1.0 / cg
    return jnp.asarray(m, dtype)


def init_random_depth(
    noise: jnp.ndarray, depth_min: jnp.ndarray, depth_max: jnp.ndarray
) -> jnp.ndarray:
    """Stage-3 first-iteration initialization: stratified random samples in the
    inverse depth range (reference: patchmatch.py:56-71).

    Args:
        noise: [B, D, H, W] uniform [0, 1) samples.
        depth_min / depth_max: [B] virtual depth range.
    Returns:
        [B, D, H, W] depth samples.
    """
    batch, num_depth = noise.shape[0], noise.shape[1]
    inv_min = (1.0 / depth_min).reshape(batch, 1, 1, 1)
    inv_max = (1.0 / depth_max).reshape(batch, 1, 1, 1)
    strata = noise + jnp.arange(num_depth, dtype=noise.dtype).reshape(1, num_depth, 1, 1)
    inv_sample = inv_max + strata / num_depth * (inv_min - inv_max)
    return 1.0 / inv_sample


def init_perturbed_depth(
    depth: jnp.ndarray,
    depth_min: jnp.ndarray,
    depth_max: jnp.ndarray,
    num_samples: int,
    interval_scale: float,
) -> jnp.ndarray:
    """Local perturbation around the previous depth map, uniform in inverse
    depth, clamped to the scene range (reference: patchmatch.py:75-94).

    Args:
        depth: [B, H, W] previous depth estimate.
        num_samples: number of hypotheses (D).
    Returns:
        [B, D, H, W] depth samples.
    """
    batch = depth.shape[0]
    inv_min = (1.0 / depth_min).reshape(batch, 1, 1, 1)
    inv_max = (1.0 / depth_max).reshape(batch, 1, 1, 1)
    offsets = jnp.arange(-(num_samples // 2), num_samples // 2, dtype=depth.dtype)
    inv_interval = (inv_min - inv_max) * interval_scale
    inv_sample = (
        1.0 / jax.lax.stop_gradient(depth)[:, None, :, :]
        + inv_interval * offsets.reshape(1, num_samples, 1, 1)
    )
    inv_sample = jnp.clip(inv_sample, inv_max, inv_min)
    return 1.0 / inv_sample


def propagate(depth_sample: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Adaptive propagation: sample the middle hypothesis at learned neighbor
    positions, concatenate, and sort (reference: patchmatch.py:104-124).

    Args:
        depth_sample: [B, D, H, W]
        grid: (gx, gy) tuple of [B, Kp, H, W] normalized coordinates.
    Returns:
        [B, D + Kp, H, W] sorted depth samples.
    """
    num_depth = depth_sample.shape[1]
    middle = depth_sample[:, num_depth // 2, :, :, None]  # [B, H, W, 1]
    prop = grid_sample_2d(middle, grid, align_corners=False, padding_mode="border")
    prop = prop[..., 0]  # [B, Kp, H, W]
    if os.environ.get("PATCHMATCHNET_TPU_SORT") == "lax":
        return jnp.sort(jnp.concatenate([depth_sample, prop], axis=1), axis=1)
    # depth_sample is descending by construction (both initializers are
    # monotone in inverse depth), so a bitonic merge network replaces the
    # serial XLA sort loop (ops/sortnet.py).
    from patchmatchnet_tpu.ops.sortnet import merge_sorted_desc_with_unsorted

    return merge_sorted_desc_with_unsorted(depth_sample, prop)


def depth_weight(
    depth_sample: jnp.ndarray,
    depth_min: jnp.ndarray,
    depth_max: jnp.ndarray,
    grid: jnp.ndarray,
    interval_scale: float,
) -> jnp.ndarray:
    """Non-learned aggregation weight from inverse-depth difference of eval
    neighbors vs the center pixel (reference: patchmatch.py:627-669).

    Args:
        depth_sample: [B, D, H, W]
        grid: (gx, gy) tuple of [B, Ke, H, W] normalized coordinates.
    Returns:
        [B, Ke, H, W, D] weights in (0, 1), gradient-stopped.
    """
    batch = depth_sample.shape[0]
    inv_min = (1.0 / depth_min).reshape(batch, 1, 1, 1)
    inv_max = (1.0 / depth_max).reshape(batch, 1, 1, 1)
    x = (1.0 / depth_sample - inv_max) / (inv_min - inv_max)  # [B, D, H, W]
    x_img = jnp.transpose(x, (0, 2, 3, 1))  # [B, H, W, D]
    x1 = grid_sample_2d(x_img, grid, align_corners=False, padding_mode="border")
    # [B, Ke, H, W, D] difference to center
    x1 = jnp.abs(x1 - x_img[:, None]) / interval_scale
    out = jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(x1, 0.0, 4.0))
    return jax.lax.stop_gradient(out)


class PixelwiseNet(nn.Module):
    """Per-source-view visibility weight (reference: patchmatch.py:672-702)."""

    dtype: Any = None

    def setup(self):
        self.conv0 = DenseBnReLU(16, dtype=self.dtype)
        self.conv1 = DenseBnReLU(8, dtype=self.dtype)
        self.conv2 = Dense1(1, dtype=self.dtype)

    def __call__(
        self, similarity: jnp.ndarray, train: bool = False, channel_first: bool = False
    ) -> jnp.ndarray:
        """similarity: [B, D, H, W, G] (or [B, G, D, H, W] when channel_first)
        -> weight [B, H, W, 1] (f32)."""
        if channel_first:
            x = self.conv0(similarity, train, channel_axis=1)
            x = self.conv1(x, train, channel_axis=1)
            x = self.conv2(x, channel_axis=1)  # [B, 1, D, H, W]
            x = jax.nn.sigmoid(x[:, 0].astype(jnp.float32))  # [B, D, H, W]
        else:
            x = self.conv2(self.conv1(self.conv0(similarity, train), train))
            x = jax.nn.sigmoid(x[..., 0].astype(jnp.float32))  # [B, D, H, W]
        return jnp.max(x, axis=1)[..., None]  # [B, H, W, 1]


class SimilarityNet(nn.Module):
    """Per-hypothesis matching cost from the aggregated similarity volume
    (reference: patchmatch.py:532-577; the spatial aggregation itself lives
    in Evaluation, fused into the shared eval-grid gather)."""

    dtype: Any = None

    def setup(self):
        self.conv0 = DenseBnReLU(16, dtype=self.dtype)
        self.conv1 = DenseBnReLU(8, dtype=self.dtype)
        self.similarity = Dense1(1, dtype=self.dtype)

    def __call__(
        self, x1: jnp.ndarray, train: bool = False, channel_first: bool = False
    ) -> jnp.ndarray:
        """x1: [B, D, H, W, G] (or [B, G, D, H, W] when channel_first)
        -> cost image [B, H, W, D]."""
        if channel_first:
            x = self.conv0(x1, train, channel_axis=1)
            x = self.conv1(x, train, channel_axis=1)
            cost = self.similarity(x, channel_axis=1)[:, 0]  # [B, D, H, W]
            return jnp.transpose(cost, (0, 2, 3, 1))
        cost = self.similarity(self.conv1(self.conv0(x1, train), train))[..., 0]
        return jnp.transpose(cost, (0, 2, 3, 1))


class FeatureWeightNet(nn.Module):
    """Adaptive-aggregation feature weights from group-wise correlation of the
    reference feature with its sampled neighbors (reference:
    patchmatch.py:580-624)."""

    groups: int
    dtype: Any = None

    def setup(self):
        self.conv0 = DenseBnReLU(16, dtype=self.dtype)
        self.conv1 = DenseBnReLU(8, dtype=self.dtype)
        self.similarity = Dense1(1, dtype=self.dtype)

    def weights_from_neighbors(
        self, neighbors: jnp.ndarray, ref_feature: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """neighbors: [B, Ke, H, W, C] pre-sampled reference-feature
        neighbors; ref_feature: [B, H, W, C] -> [B, Ke, H, W]."""
        b, h, w, c = ref_feature.shape
        g = self.groups
        gm = _group_mean_matrix(c, g, neighbors.dtype)
        prod = neighbors * ref_feature[:, None]  # [B, Ke, H, W, C]
        corr = jnp.matmul(prod, gm, precision=jax.lax.Precision.HIGHEST)
        out = self.similarity(self.conv1(self.conv0(corr, train), train))
        return jax.nn.sigmoid(out[..., 0].astype(jnp.float32))  # [B, Ke, H, W]

    def weights_from_corr(self, corr: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """corr: [B, G, Ke, H, W] CHANNEL-FIRST group correlation (as the
        fused similarity kernel emits it) -> [B, Ke, H, W]. Same math as
        `weights_from_neighbors` after its group-mean matmul; taking the
        channel-first volume directly avoids the C-minor relayout XLA
        otherwise realizes as a serial while-loop (measured ~3 ms/forward
        at the DTU eval config, stage 1)."""
        x = self.conv0(corr, train, channel_axis=1)
        x = self.conv1(x, train, channel_axis=1)
        out = self.similarity(x, channel_axis=1)  # [B, 1, Ke, H, W]
        return jax.nn.sigmoid(out[:, 0].astype(jnp.float32))

    def __call__(
        self, ref_feature: jnp.ndarray, grid: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """ref_feature: [B, H, W, C]; grid: (gx, gy) of [B, Ke, H, W]
        -> [B, Ke, H, W]."""
        neighbors = grid_sample_2d(
            ref_feature, grid, align_corners=False, padding_mode="border"
        )  # [B, Ke, H, W, C]
        return self.weights_from_neighbors(neighbors, ref_feature, train)


def _feature_weight_corr(
    ref_sg: jnp.ndarray, grid, groups: int
) -> jnp.ndarray:
    """Group correlation of eval-grid-sampled reference-feature neighbors
    with the center feature, CHANNEL-FIRST [B, G, Ke, H, W].

    Replaces grid_sample + (neighbors * ref) @ gm with the fused similarity
    kernel (ops/pallas/similarity_kernel.py) applied with the neighbor axis
    in the depth-slice slot: the f32 bilinear combine and the C-minor
    relayout XLA emitted around the sampled [B, Ke, H, W, C] volume
    (a 16-step serial while-loop at stage 1) never materialize. Exact same
    math; gradient flows to the grid through the bilinear weights and to
    nothing else (ref_sg is detached by the caller), matching the
    reference's detached FeatureWeightNet input (reference:
    models/patchmatch.py:475, 615-617).
    """
    from patchmatchnet_tpu.ops.pallas.similarity_kernel import (
        SLICE_PAD,
        warped_group_similarity,
    )
    from patchmatchnet_tpu.ops.quad_sample import (
        _gather_rows,
        make_quad_image,
        quad_coords,
    )

    b, h, w, c = ref_sg.shape
    if isinstance(grid, (tuple, list)):
        gx, gy = grid
    else:
        gx, gy = grid[..., 0], grid[..., 1]
    ke = gx.shape[1]
    hw = h * w
    hwp = -(-hw // SLICE_PAD) * SLICE_PAD
    # align_corners=False unnormalization + border clamp (grid_sample_2d
    # semantics, reference: patchmatch.py:615-617)
    ix = jnp.clip(((gx.reshape(b, ke * hw) + 1.0) * w - 1.0) * 0.5, 0.0, w - 1)
    iy = jnp.clip(((gy.reshape(b, ke * hw) + 1.0) * h - 1.0) * 0.5, 0.0, h - 1)
    quad = make_quad_image(ref_sg, "border")
    idx, w4 = quad_coords(
        quad, ix, iy, padding_mode="border", weight_dtype=jnp.float32
    )
    if hwp != hw:
        idx = jnp.pad(idx.reshape(b, ke, hw), ((0, 0), (0, 0), (0, hwp - hw)))
        w4 = jnp.pad(
            w4.reshape(b, 4, ke, hw), ((0, 0), (0, 0), (0, 0), (0, hwp - hw))
        ).reshape(b, 4, ke * hwp)
        idx = idx.reshape(b, ke * hwp)
    taps = _gather_rows(quad, idx)  # [B, Ke*HWP, 4C]
    ref_flat = ref_sg.reshape(b, hw, c)
    if hwp != hw:
        ref_flat = jnp.pad(ref_flat, ((0, 0), (0, hwp - hw), (0, 0)))
    gm = _group_mean_matrix(c, groups, jnp.float32)
    corr = warped_group_similarity(taps, w4, ref_flat, gm, ke)  # [B, G, Ke*HWP]
    corr = corr.reshape(b, groups, ke, hwp)[..., :hw]
    return corr.reshape(b, groups, ke, h, w)


class Evaluation(nn.Module):
    """Warp each source view at every hypothesis, group-wise correlate,
    weight by per-view visibility, aggregate spatially, and regress depth
    (reference: patchmatch.py:127-239)."""

    groups: int
    dtype: Any = None

    def setup(self):
        self.pixel_wise_net = PixelwiseNet(dtype=self.dtype)
        self.similarity_net = SimilarityNet(dtype=self.dtype)
        self.feature_weight_net = FeatureWeightNet(groups=self.groups, dtype=self.dtype)

    def __call__(
        self,
        ref_feature: jnp.ndarray,
        src_features: Sequence[jnp.ndarray],
        ref_proj: jnp.ndarray,
        src_projs: Sequence[jnp.ndarray],
        depth_sample: jnp.ndarray,
        grid: jnp.ndarray,
        x_norm_img: jnp.ndarray,
        feature_weight: Optional[jnp.ndarray],
        interval_scale: float,
        view_weights: Optional[jnp.ndarray],
        is_inverse: bool,
        train: bool = False,
        sampler: str = "gather",
        window: Optional[Tuple[int, int]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Adaptive evaluation over precomputed source quad tables.

        Args:
            ref_feature: [B, H, W, C].
            src_features: V precomputed QuadImage tables of the source-view
                features (see ops.quad_sample.make_quad_image).

        Returns (depth [B, H, W], score [B, H, W, D],
        view_weights [B, H, W, V], feature_weight [B, Ke, H, W]).

        On the stage's first iteration (feature_weight is None) the
        reference-feature neighbors needed by FeatureWeightNet (reference:
        patchmatch.py:475, 615-617) are sampled + group-correlated through
        the fused similarity kernel (_feature_weight_corr) — the sampled
        [B, Ke, H, W, C] volume and its C-minor relayout never
        materialize."""
        b, h, w, c = ref_feature.shape
        g = self.groups
        num_depth = depth_sample.shape[1]

        # Channel-first similarity volumes [B, G, D, H, W]: G (4..8) as a
        # minor dim would tile at 8/128 lanes; with W minor they pack densely.
        # Accumulate across views in f32 even when features are bf16.
        weight_sum = jnp.full((b, 1, 1, 1, 1), 1e-5, dtype=jnp.float32)
        similarity_sum = jnp.zeros((b, g, num_depth, h, w), dtype=jnp.float32)

        # gm stays f32: the kernel upcasts bf16 payloads and runs all
        # arithmetic (bilinear, ref product, group mean) in f32.
        gm = _group_mean_matrix(c, g, jnp.float32)
        hw = h * w
        # `window` is the per-stage derived (tile width, band height) from
        # ops/pallas/window_bounds.derive_stage_windows (threaded down by
        # PatchMatch); None falls back to the env/default envelope.
        win_cfg = (
            make_window_config(
                h,
                w,
                hband=window[1] if window else None,
                tw=window[0] if window else None,
            )
            if sampler == "windowed"
            else None
        )
        if win_cfg is None:
            from patchmatchnet_tpu.ops.pallas.similarity_kernel import SLICE_PAD

            # depth slices padded to full kernel tiles (see SLICE_PAD rationale)
            hwp = -(-hw // SLICE_PAD) * SLICE_PAD
            ref_flat = ref_feature.reshape(b, hw, c)
            if hwp != hw:
                ref_flat = jnp.pad(ref_flat, ((0, 0), (0, hwp - hw), (0, 0)))
        new_view_weights: List[jnp.ndarray] = []
        escapes = jnp.zeros((), jnp.int32)

        # Views-fused windowed path: when the per-view visibility weights
        # are already known (every call after the stage-3 first iteration),
        # ONE kernel accumulates the view-weighted similarity across all
        # source views into a revisited output block — the per-view
        # [B, G, D, H, W] f32 volumes and their XLA weighted-sum pass never
        # exist. MEASURED A LOSER at the bench geometry (round 5, same
        # session: s2d-only 100.2 ms/map vs s2d+fused 103.5; baseline
        # 105.1): the revisited output block costs a read+write per view,
        # so the "saved" per-view volumes mostly return as revisit
        # traffic, and the escape diagnostic loses its CSE with the
        # kernel's own origin math (4 extra coordinate+reduce passes).
        # Same family of result as the round-2 scratch-accumulate variant
        # (deleted, PROGRESS.md). Kept behind an env flag for re-testing
        # if the output-revisit cost model changes; default OFF.
        fuse_views = (
            win_cfg is not None
            and view_weights is not None
            and not train
            and os.environ.get("PATCHMATCHNET_TPU_FUSED_VIEWS", "0") == "1"
        )
        if fuse_views:
            from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
                _coords_from_depth,
                escape_count,
                windowed_group_similarity_proj_views,
            )

            quads = src_features  # [B, V, Ht, Wt, 4C] stacked tables
            nv = quads.shape[1]
            mats = jnp.stack(
                [warp_proj_coeffs(sp, ref_proj) for sp in src_projs], axis=1
            )  # [B, V, 12]
            vw = jnp.transpose(view_weights, (0, 3, 1, 2))  # [B, V, H, W]
            similarity_sum = windowed_group_similarity_proj_views(
                quads, mats, depth_sample, ref_feature, gm,
                vw.astype(jnp.float32), win_cfg,
            )
            weight_sum = weight_sum + jnp.sum(
                vw.astype(jnp.float32), axis=1
            )[:, None, None]  # [B, 1, 1, H, W]
            dsg = jax.lax.stop_gradient(depth_sample)
            for i in range(nv):
                eix, eiy = _coords_from_depth(mats[:, i], dsg, h, w)
                escapes = escapes + escape_count(
                    eix, eiy, win_cfg, h, w,
                    quads.shape[2], quads.shape[3],
                ).astype(jnp.int32)
            src_projs = []  # skip the per-view loop below
        for i, src_proj in enumerate(src_projs):
            # windowed: src_features is the [B, V, Ht, Wt, 4C] stacked quad
            # tables (shared with the views-fused path); gather: a list of
            # per-view QuadImage tables
            src_quad = (
                src_features[:, i] if win_cfg is not None else src_features[i]
            )
            if win_cfg is not None:
                # windowed sampler: fused warp-sample + similarity, no taps
                # round trip (src_quad here is the 2-D padded quad table);
                # warp coordinates are computed in-kernel from the depth
                # hypotheses + projection scalars
                mat12 = warp_proj_coeffs(src_proj, ref_proj)
                similarity = windowed_group_similarity_proj(
                    src_quad, mat12, depth_sample, ref_feature, gm, win_cfg
                )  # [B, G, D, H, W] f32
                # Runtime escape guard: count samples the windowed kernel
                # would zero (its exactness contract). The coordinate math
                # and origin reductions are CSE'd with the kernel's own, so
                # this costs one fused compare+reduce; consumers that do
                # not request the 'diagnostics' collection trace it away.
                from patchmatchnet_tpu.ops.pallas.windowed_similarity import (
                    _coords_from_depth,
                    escape_count,
                )

                eix, eiy = _coords_from_depth(
                    mat12, jax.lax.stop_gradient(depth_sample), h, w
                )
                escapes = escapes + escape_count(
                    eix, eiy, win_cfg, h, w,
                    src_quad.shape[1], src_quad.shape[2],
                ).astype(jnp.int32)
            else:
                from patchmatchnet_tpu.ops.quad_sample import QuadImage

                def _view_similarity(qdata, sp, ds, rf):
                    # rebuild the quad with its STATIC fields from the
                    # enclosing scope (jax.checkpoint traces every leaf of
                    # its arguments, so the int dims must not be passed in)
                    sq = QuadImage(
                        qdata, src_quad.height, src_quad.width,
                        src_quad.channels, src_quad.padded,
                    )
                    taps, w4, _ = warp_taps(
                        sq, sp, ref_proj, ds, pad_to=SLICE_PAD
                    )
                    return warped_group_similarity(taps, w4, rf, gm, num_depth)

                if train and os.environ.get(
                    "PATCHMATCHNET_TPU_TRAIN_REMAT", "0"
                ) == "1":
                    # Save only the [B, G, P] similarity for backward; the
                    # [B, P, 4C] warped taps (~4 GB across the cascade at
                    # the DTU training config) are re-gathered in backward.
                    # Measured 766 vs 735 ms/step at the DTU config — XLA's
                    # own memory-pressure remat is cheaper there, so this is
                    # opt-in for larger batches/resolutions that would
                    # otherwise OOM.
                    _view_similarity = jax.checkpoint(_view_similarity)
                sim_p = _view_similarity(
                    src_quad.data, src_proj, depth_sample, ref_flat
                )
                similarity = sim_p.reshape(b, g, num_depth, hwp)[..., :hw].reshape(
                    b, g, num_depth, h, w
                )

            if view_weights is None:
                view_weight = self.pixel_wise_net(
                    similarity, train, channel_first=True
                )  # [B, H, W, 1]
                new_view_weights.append(view_weight)
            else:
                view_weight = view_weights[..., i : i + 1]  # [B, H, W, 1]

            vw = jnp.moveaxis(view_weight, -1, 1)[:, :, None]  # [B, 1, 1, H, W]
            similarity_sum = similarity_sum + similarity.astype(jnp.float32) * vw
            weight_sum = weight_sum + vw

        if win_cfg is not None:
            # summed per evaluation call; retrieve with
            # apply(..., mutable=["diagnostics"]) (see infer.DepthEstimator)
            self.sow(
                "diagnostics", "escape_count", escapes,
                reduce_fn=lambda a, b: a + b,
                init_fn=lambda: jnp.zeros((), jnp.int32),
            )

        similarity = similarity_sum / weight_sum  # [B, G, D, H, W] f32
        if self.dtype is not None:
            similarity = similarity.astype(self.dtype)
        cost_img = self.similarity_net(
            similarity, train, channel_first=True
        )  # [B, H, W, D]

        # One joint gather at the eval grid: [ref features (first iteration
        # only) | normalized inverse depth | cost]. x_norm differences are
        # divided by interval_scale (0.005..0.025) downstream, so bf16's
        # ~2^-9 relative error would be amplified ~200x into the depth
        # weight. On the bf16 path x_norm therefore travels as a hi/lo
        # bf16 pair (hi = bf16(x), lo = bf16(x - hi), combined error
        # ~2^-17); bilinear sampling is linear, so sampling hi and lo
        # separately and summing equals sampling x exactly (the sampler
        # accumulates in f32).
        ref_sg = jax.lax.stop_gradient(ref_feature)
        if feature_weight is None:
            # First iteration of the stage: adaptive feature weights from
            # the eval-grid neighbors (reference: patchmatch.py:475,
            # 615-617), computed through the fused similarity kernel
            # (see _feature_weight_corr).
            corr = _feature_weight_corr(ref_sg, grid, self.groups)
            feature_weight = self.feature_weight_net.weights_from_corr(
                corr, train
            )  # [B, Ke, H, W]
        # Fused eval-grid tail (ops/pallas/eval_tail.py): one uint16 quad
        # gather (x_norm as 16-bit fixed point — same 2^-17 error as the
        # bf16 hi/lo pair — and cost as bf16 bits, 2/3 the gather traffic)
        # + a lane-packed Pallas kernel doing bilinear combine, depth
        # weight, feature weighting and the neighbor reduction in VMEM. No
        # [B, Ke, H, W, D] intermediate, no XLA layout-conversion loops.
        # Default ON for the windowed inference path; set
        # PATCHMATCHNET_TPU_EVAL_FUSED=0 to fall back to the XLA tail.
        eval_fused = (
            sampler == "windowed"
            and not train  # eval_tail is inference-only (no gradients)
            and os.environ.get("PATCHMATCHNET_TPU_EVAL_FUSED", "1") == "1"
            and num_depth & (num_depth - 1) == 0
        )
        if eval_fused:
            from patchmatchnet_tpu.ops.pallas.eval_tail import eval_grid_score

            score = eval_grid_score(
                x_norm_img,
                cost_img,
                grid,
                feature_weight.astype(jnp.float32),
                interval_scale,
            )
            score = jax.nn.softmax(score, axis=-1)
            return self._finish(
                score, depth_sample, num_depth, is_inverse,
                view_weights, new_view_weights, feature_weight,
            )
        split_xnorm = self.dtype is not None and jnp.dtype(self.dtype).itemsize < 4
        if split_xnorm:
            x_hi = x_norm_img.astype(self.dtype)
            x_lo = (x_norm_img - x_hi.astype(jnp.float32)).astype(self.dtype)
            parts = [x_hi, x_lo, cost_img.astype(self.dtype)]
        else:
            parts = [x_norm_img, cost_img.astype(jnp.float32)]
        joint = jnp.concatenate(parts, axis=-1)
        sampled = grid_sample_2d(
            joint, grid, align_corners=False, padding_mode="border",
            method=os.environ.get("PATCHMATCHNET_TPU_EVAL_GS", "quad"),
        )  # [B, Ke, H, W, (2|3)D] f32

        if split_xnorm:
            x_smp = sampled[..., :num_depth] + sampled[..., num_depth : 2 * num_depth]
            cost_smp = sampled[..., 2 * num_depth :]
        else:
            x_smp = sampled[..., :num_depth]
            cost_smp = sampled[..., num_depth:]

        # depth weight (reference: patchmatch.py:655-669), gradient-stopped
        diff = jnp.abs(x_smp - x_norm_img[:, None]) / interval_scale
        dw = jax.lax.stop_gradient(
            jax.nn.sigmoid(4.0 - 2.0 * jnp.clip(diff, 0.0, 4.0))
        )
        weight = dw * feature_weight[..., None]  # [B, Ke, H, W, D]
        weight = weight / jnp.sum(weight, axis=1, keepdims=True)
        score = jnp.sum(cost_smp * weight, axis=1)  # [B, H, W, D]
        score = jax.nn.softmax(score.astype(jnp.float32), axis=-1)
        return self._finish(
            score, depth_sample, num_depth, is_inverse,
            view_weights, new_view_weights, feature_weight,
        )

    def _finish(
        self,
        score,
        depth_sample,
        num_depth,
        is_inverse,
        view_weights,
        new_view_weights,
        feature_weight,
    ):
        """Shared tail: depth regression + view-weight assembly."""
        if view_weights is None:
            view_weights = jnp.concatenate(new_view_weights, axis=-1)  # [B, H, W, V]

        if is_inverse:
            # Inverse-depth index regression (final stage-1 iteration;
            # reference: patchmatch.py:226-234).
            index = jnp.arange(num_depth, dtype=score.dtype)
            depth_index = jnp.sum(index * score, axis=-1)  # [B, H, W]
            inv_min = 1.0 / depth_sample[:, -1]  # [B, H, W]
            inv_max = 1.0 / depth_sample[:, 0]
            depth = 1.0 / (
                inv_max + depth_index / (num_depth - 1) * (inv_min - inv_max)
            )
        else:
            # Soft-argmin expectation (reference: patchmatch.py:236-237).
            sample_img = jnp.transpose(depth_sample, (0, 2, 3, 1))  # [B, H, W, D]
            depth = jnp.sum(sample_img * score, axis=-1)

        return depth, score, jax.lax.stop_gradient(view_weights), feature_weight


def _fixed_offsets(grid_type: str, neighbors: int, dilation: int) -> List[Tuple[int, int]]:
    """Static (y, x) offset patterns for propagation/evaluation grids
    (reference: patchmatch.py:331-394)."""
    if grid_type == "propagation":
        if neighbors == 4:
            return [(-dilation, 0), (0, -dilation), (0, dilation), (dilation, 0)]
        if neighbors in (8, 16):
            base = [
                (-dilation, -dilation),
                (-dilation, 0),
                (-dilation, dilation),
                (0, -dilation),
                (0, dilation),
                (dilation, -dilation),
                (dilation, 0),
                (dilation, dilation),
            ]
            if neighbors == 16:
                base = base + [(2 * y, 2 * x) for (y, x) in base]
            return base
        raise NotImplementedError(f"propagate_neighbors={neighbors}")
    if grid_type == "evaluation":
        dilation = dilation - 1  # evaluation uses slightly smaller dilation
        if neighbors in (9, 17):
            base = [
                (-dilation, -dilation),
                (-dilation, 0),
                (-dilation, dilation),
                (0, -dilation),
                (0, 0),
                (0, dilation),
                (dilation, -dilation),
                (dilation, 0),
                (dilation, dilation),
            ]
            if neighbors == 17:
                base = base + [
                    (2 * y, 2 * x) for (y, x) in base if (y, x) != (0, 0)
                ]
            return base
        raise NotImplementedError(f"evaluate_neighbors={neighbors}")
    raise NotImplementedError(grid_type)


def build_offset_grid(
    offset: jnp.ndarray,
    fixed: Sequence[Tuple[int, int]],
    height: int,
    width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine fixed neighbor offsets with learned per-pixel offsets into a
    normalized sampling grid (reference: patchmatch.py:396-426).

    Args:
        offset: [B, H, W, 2K] learned offsets, channel 2k = x, 2k+1 = y for
            neighbor k (same channel convention as the reference conv output).
        fixed: K static (y, x) offsets.
    Returns:
        (gx, gy) normalized grids, each [B, K, H, W] — kept as SEPARATE
        dense arrays rather than the torch [B, K, H, W, 2] stack: a
        trailing 2-dim tiles T(2,128) on TPU and the stack/unstack around
        it lowers to serial while-loops (measured, see grid_sample_2d).
        Note the reference normalizes with the align_corners=True convention
        but samples with align_corners=False — reproduced as-is.
    """
    batch = offset.shape[0]
    k = len(fixed)
    y, x = jnp.meshgrid(
        jnp.arange(height, dtype=offset.dtype),
        jnp.arange(width, dtype=offset.dtype),
        indexing="ij",
    )
    off = offset.reshape(batch, height, width, k, 2)
    fixed_x = jnp.asarray([fx for (_, fx) in fixed], dtype=offset.dtype)
    fixed_y = jnp.asarray([fy for (fy, _) in fixed], dtype=offset.dtype)
    # [B, H, W, K] absolute sample positions
    ax = x[None, :, :, None] + fixed_x + off[..., 0]
    ay = y[None, :, :, None] + fixed_y + off[..., 1]
    gx = ax / ((width - 1) / 2.0) - 1.0
    gy = ay / ((height - 1) / 2.0) - 1.0
    return (
        jnp.transpose(gx, (0, 3, 1, 2)),  # [B, K, H, W]
        jnp.transpose(gy, (0, 3, 1, 2)),
    )


class PatchMatch(nn.Module):
    """One cascade stage of iterative learned PatchMatch (reference:
    patchmatch.py:242-529)."""

    propagation_out_range: int = 2
    patchmatch_iteration: int = 2
    patchmatch_num_sample: int = 16
    patchmatch_interval_scale: float = 0.025
    num_feature: int = 64
    groups: int = 8
    propagate_neighbors: int = 16
    evaluate_neighbors: int = 9
    stage: int = 3
    dtype: Any = None

    def setup(self):
        d = self.propagation_out_range
        self.propa_conv = Conv2d(
            features=max(2 * self.propagate_neighbors, 1),
            kernel_size=3,
            stride=1,
            pad=d,
            dilation=d,
            use_bias=True,
            zero_init=True,
            dtype=self.dtype,
        )
        self.eval_conv = Conv2d(
            features=2 * self.evaluate_neighbors,
            kernel_size=3,
            stride=1,
            pad=d,
            dilation=d,
            use_bias=True,
            zero_init=True,
            dtype=self.dtype,
        )
        self.evaluation = Evaluation(groups=self.groups, dtype=self.dtype)

    def __call__(
        self,
        ref_feature: jnp.ndarray,
        src_features: Sequence[jnp.ndarray],
        ref_proj: jnp.ndarray,
        src_projs: Sequence[jnp.ndarray],
        depth_min: jnp.ndarray,
        depth_max: jnp.ndarray,
        depth: Optional[jnp.ndarray],
        view_weights: Optional[jnp.ndarray],
        init_noise: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
        """Run `patchmatch_iteration` rounds of init/propagate/weight/evaluate.

        Args:
            ref_feature: [B, H, W, C]; src_features: V x [B, H, W, C].
            depth: [B, H, W] previous-stage depth or None (stage 3 start).
            view_weights: [B, H, W, V] or None (computed on first evaluation).
            init_noise: optional [B, 48, H, W] uniform noise for deterministic
                stage-3 initialization; drawn from the 'sample' RNG if None.
        Returns:
            (per-iteration depths [B, H, W], final score [B, H, W, D],
             view_weights [B, H, W, V])
        """
        b, h, w, _ = ref_feature.shape

        has_propagation = self.propagate_neighbors > 0 and not (
            self.stage == 1 and self.patchmatch_iteration == 1
        )
        propa_grid = None
        if has_propagation:
            propa_offset = self.propa_conv(ref_feature).astype(jnp.float32)
            propa_grid = build_offset_grid(
                propa_offset,
                _fixed_offsets("propagation", self.propagate_neighbors, self.propagation_out_range),
                h,
                w,
            )

        eval_offset = self.eval_conv(ref_feature).astype(jnp.float32)
        eval_grid = build_offset_grid(
            eval_offset,
            _fixed_offsets("evaluation", self.evaluate_neighbors, self.propagation_out_range),
            h,
            w,
        )

        feature_weight = None  # computed inside the first evaluation pass

        # Sampler selection: the windowed Pallas path (exact, gather-free;
        # ops/pallas/windowed_similarity.py) runs on the bf16 path when the
        # stage shape tiles cleanly — at inference AND, since its custom
        # VJP landed, in bf16 training (PATCHMATCHNET_TPU_TRAIN_SAMPLER=
        # gather opts out). f32 uses the quad-gather path (the kernel's
        # one-hot matmul needs bf16 tables), so f32 training — the
        # reference-parity configuration — is unchanged.
        sampler = "gather"
        win_stages = os.environ.get("PATCHMATCHNET_TPU_WINDOWED_STAGES", "1,2,3")
        train_windowed = (
            os.environ.get("PATCHMATCHNET_TPU_TRAIN_SAMPLER", "windowed")
            == "windowed"
        )
        # Per-stage derived (tile width, band height) — set at trace time by
        # infer.DepthEstimator / bench from window_bounds.derive_stage_windows
        # (the band requirement is the epipolar tilt across the tile, computed
        # from the scene projections; None = env/default envelope).
        window = _stage_window_override(self.stage)
        if (
            (not train or train_windowed)
            and self.dtype is not None
            and jnp.dtype(self.dtype).itemsize < 4
            and os.environ.get("PATCHMATCHNET_TPU_SAMPLER", "windowed") == "windowed"
            and str(self.stage) in win_stages.split(",")
            and make_window_config(
                h,
                w,
                hband=window[1] if window else None,
                tw=window[0] if window else None,
            )
            is not None
        ):
            sampler = "windowed"

        # Source tables: built once per view, reused by every warp sample
        # across all iterations.
        if sampler == "windowed":
            # one STACKED table [B, V, Ht, Wt, 4C]: per-view slices feed the
            # per-view kernel; the views-fused kernel takes it whole
            stacked = jnp.stack(src_features, axis=1)
            nv = stacked.shape[1]
            src_quads = make_quad_table_2d(
                stacked.reshape(b * nv, h, w, stacked.shape[-1])
            )
            src_quads = src_quads.reshape(b, nv, *src_quads.shape[1:])
        else:
            src_quads = [make_quad_image(f, "zeros") for f in src_features]

        score = None
        depths: List[jnp.ndarray] = []
        for it in range(1, self.patchmatch_iteration + 1):
            is_inverse = self.stage == 1 and it == self.patchmatch_iteration

            if depth is None:
                if init_noise is None:
                    init_noise = jax.random.uniform(
                        self.make_rng("sample"),
                        (b, INITIAL_NUM_SAMPLES, h, w),
                        ref_feature.dtype,
                    )
                depth_sample = init_random_depth(init_noise, depth_min, depth_max)
            elif self.patchmatch_num_sample == 1:
                depth_sample = jax.lax.stop_gradient(depth)[:, None]
            else:
                depth_sample = init_perturbed_depth(
                    depth,
                    depth_min,
                    depth_max,
                    self.patchmatch_num_sample,
                    self.patchmatch_interval_scale,
                )

            if self.propagate_neighbors > 0 and not (
                self.stage == 1 and it == self.patchmatch_iteration
            ):
                depth_sample = propagate(depth_sample, propa_grid)

            # normalized inverse depth for the in-aggregation depth weight
            inv_min = (1.0 / depth_min).reshape(b, 1, 1, 1)
            inv_max = (1.0 / depth_max).reshape(b, 1, 1, 1)
            x_norm = (1.0 / jax.lax.stop_gradient(depth_sample) - inv_max) / (
                inv_min - inv_max
            )
            x_norm_img = jax.lax.stop_gradient(
                jnp.transpose(x_norm, (0, 2, 3, 1))
            )  # [B, H, W, D]

            # NOTE: eval_grid is NOT gradient-stopped — the reference
            # back-propagates into eval_conv through the cost/feature-weight
            # sampling (patchmatch.py:569-575, 615-617); only the depth-weight
            # path is detached, which stop_gradient on dw already ensures.
            depth, score, view_weights, feature_weight = self.evaluation(
                ref_feature,
                src_quads,
                ref_proj,
                src_projs,
                depth_sample,
                eval_grid,
                x_norm_img,
                feature_weight,
                self.patchmatch_interval_scale,
                view_weights,
                is_inverse,
                train,
                sampler,
                window,
            )
            depths.append(depth)

        return depths, score, view_weights
