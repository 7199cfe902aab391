"""FPN-style multi-scale feature extractor.

Capability/graph parity with the reference FeatureNet (reference:
models/net.py:9-70): 11 ConvBnReLU layers downsampling to 1/2, 1/4, 1/8 with
lateral 1x1 connections, producing features {1: 16ch@1/2, 2: 32ch@1/4,
3: 64ch@1/8}. NHWC layout.

At inference the full/half-resolution prefix (conv0..conv5, C=3..16) runs
SPACE-TO-DEPTH FOLDED: NHWC tensors with C<32 waste most of the 128-lane
minor dim, and the prefix measured 10.2 of the 13.3 ms FeatureNet forward
at the bench geometry (tools/dev/bench_feature.py). Folding 4x4 (then 2x2)
spatial blocks into channels makes the whole prefix [H/4, W/4, 48..128]
convs with packed lanes; conv0 consumes the RAW image and emits fold-4
output directly (a 7x7 stride-4 conv — the fold fused into the layer, no
fold_image transpose pass). The transform is mathematically exact (the
folded kernels are entry rearrangements of the originals, built at trace
time in ops/space_to_depth.py); measured 13.27 -> 9.46 ms/forward.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from patchmatchnet_tpu.models.layers import ConvBnReLU, torch_bias_init, torch_kernel_init
from patchmatchnet_tpu.ops.resize import upsample_bilinear_x2

# (module attr, k, s, input fold) — conv0 is raw-fold (fold fused into it)
_S2D_PLAN = (
    ("conv0", 3, 1, 4),
    ("conv1", 3, 1, 4),
    ("conv2", 5, 2, 4),
    ("conv3", 3, 1, 2),
    ("conv4", 3, 1, 2),
    ("conv5", 5, 2, 2),
)


class FeatureNet(nn.Module):
    """Multi-scale feature pyramid over a single view [B, H, W, 3]."""

    dtype: Any = None

    def setup(self):
        dt = self.dtype
        self.conv0 = ConvBnReLU(8, 3, 1, 1, dtype=dt)
        self.conv1 = ConvBnReLU(8, 3, 1, 1, dtype=dt)
        self.conv2 = ConvBnReLU(16, 5, 2, 2, dtype=dt)
        self.conv3 = ConvBnReLU(16, 3, 1, 1, dtype=dt)
        self.conv4 = ConvBnReLU(16, 3, 1, 1, dtype=dt)
        self.conv5 = ConvBnReLU(32, 5, 2, 2, dtype=dt)
        self.conv6 = ConvBnReLU(32, 3, 1, 1, dtype=dt)
        self.conv7 = ConvBnReLU(32, 3, 1, 1, dtype=dt)
        self.conv8 = ConvBnReLU(64, 5, 2, 2, dtype=dt)
        self.conv9 = ConvBnReLU(64, 3, 1, 1, dtype=dt)
        self.conv10 = ConvBnReLU(64, 3, 1, 1, dtype=dt)

        self.output1 = nn.Dense(64, use_bias=False, kernel_init=torch_kernel_init, dtype=dt)
        self.inner1 = nn.Dense(
            64, use_bias=True, kernel_init=torch_kernel_init, bias_init=torch_bias_init(32), dtype=dt
        )
        self.inner2 = nn.Dense(
            64, use_bias=True, kernel_init=torch_kernel_init, bias_init=torch_bias_init(16), dtype=dt
        )
        self.output2 = nn.Dense(32, use_bias=False, kernel_init=torch_kernel_init, dtype=dt)
        self.output3 = nn.Dense(16, use_bias=False, kernel_init=torch_kernel_init, dtype=dt)

    def _s2d_prefix(self, x: jnp.ndarray):
        """conv0..conv5 in the space-to-depth domain (inference only:
        running-stat BN folds to a per-channel scale/bias, which tiles
        across fold phases). Returns (conv4 [B, H/2, W/2, 16] unfolded for
        the FPN lateral, conv5 out [B, H/4, W/4, 32])."""
        from patchmatchnet_tpu.ops.space_to_depth import (
            fold_channel_vector,
            fold_conv_kernel,
            folded_conv_geometry,
            raw_fold_conv_geometry,
            raw_fold_conv_kernel,
            unfold_image,
        )

        y = x if self.dtype is None else x.astype(self.dtype)
        c4 = None
        for i, (name, k, s, f_in) in enumerate(_S2D_PLAN):
            mod = getattr(self, name)
            params = mod.variables["params"]
            stats = mod.variables["batch_stats"]["bn"]
            kernel = params["conv"]["kernel"]
            scale = params["bn"]["scale"] * jax.lax.rsqrt(stats["var"] + 1e-5)
            bias = params["bn"]["bias"] - stats["mean"] * scale
            if i == 0:
                kf, stride, pl, ph = raw_fold_conv_geometry(k, s, k // 2, f_in)
                wf = raw_fold_conv_kernel(kernel, s, k // 2, f_in)
                f_out = f_in
                strides = (stride, stride)
            else:
                kf, pl, ph, f_out = folded_conv_geometry(k, s, k // 2, f_in)
                wf = fold_conv_kernel(kernel, s, k // 2, f_in)
                strides = (1, 1)
            sc = fold_channel_vector(scale, f_out)
            bi = fold_channel_vector(bias, f_out)
            if self.dtype is not None:
                wf = wf.astype(self.dtype)
                sc = sc.astype(self.dtype)
                bi = bi.astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                y, wf, strides, ((pl, ph), (pl, ph)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = jnp.maximum(y * sc + bi, 0)
            if name == "conv4":
                c4 = unfold_image(y, f_out)
        return c4, y

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        use_s2d = (
            not train
            and not self.is_initializing()
            and x.shape[1] % 4 == 0
            and x.shape[2] % 4 == 0
            and os.environ.get("PATCHMATCHNET_TPU_S2D", "1") == "1"
        )
        if use_s2d:
            conv4, y = self._s2d_prefix(x)
            conv7 = self.conv7(self.conv6(y, train), train)
        else:
            conv1 = self.conv1(self.conv0(x, train), train)
            conv4 = self.conv4(self.conv3(self.conv2(conv1, train), train), train)
            conv7 = self.conv7(self.conv6(self.conv5(conv4, train), train), train)
        conv10 = self.conv10(self.conv9(self.conv8(conv7, train), train), train)

        output: Dict[int, jnp.ndarray] = {}
        output[3] = self.output1(conv10)
        intra = upsample_bilinear_x2(conv10) + self.inner1(conv7)
        output[2] = self.output2(intra)
        intra = upsample_bilinear_x2(intra) + self.inner2(conv4)
        output[1] = self.output3(intra)
        return output
