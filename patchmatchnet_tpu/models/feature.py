"""FPN-style multi-scale feature extractor.

Capability/graph parity with the reference FeatureNet (reference:
models/net.py:9-70): 11 ConvBnReLU layers downsampling to 1/2, 1/4, 1/8 with
lateral 1x1 connections, producing features {1: 16ch@1/2, 2: 32ch@1/4,
3: 64ch@1/8}. NHWC layout.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from patchmatchnet_tpu.models.layers import ConvBnReLU, torch_bias_init, torch_kernel_init
from patchmatchnet_tpu.ops.resize import upsample_bilinear_x2


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

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
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
