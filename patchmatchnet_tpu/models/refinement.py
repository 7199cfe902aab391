"""Depth refinement: upsample 1/2-res depth to full resolution with a learned
residual guided by the reference image (reference: models/net.py:73-122)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from patchmatchnet_tpu.models.layers import (
    ConvBnReLU,
    ConvTranspose2dTorch,
    folded_bn_apply,
    torch_kernel_init,
)
from patchmatchnet_tpu.ops.resize import upsample_nearest_x2


class Refinement(nn.Module):
    """img [B, H, W, 3] + depth [B, H/2, W/2] -> refined depth [B, H, W].

    `dtype` (e.g. bf16) applies to the conv branches only; depth
    normalization, the residual add and denormalization stay f32 (the
    residual is a small correction on [0,1]-normalized depth)."""

    dtype: Any = None

    def setup(self):
        self.conv0 = ConvBnReLU(8, dtype=self.dtype)  # image branch
        self.conv1 = ConvBnReLU(8, dtype=self.dtype)  # depth branch
        self.conv2 = ConvBnReLU(8, dtype=self.dtype)
        self.deconv = ConvTranspose2dTorch(8)
        self.bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.conv3 = ConvBnReLU(8, dtype=self.dtype)
        self.res = nn.Conv(
            1,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
        )

    def __call__(
        self,
        img: jnp.ndarray,
        depth_0: jnp.ndarray,
        depth_min: jnp.ndarray,
        depth_max: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        batch = depth_min.shape[0]
        dmin = depth_min.reshape(batch, 1, 1)
        dmax = depth_max.reshape(batch, 1, 1)
        # normalize depth to [0, 1]
        depth = ((depth_0 - dmin) / (dmax - dmin))[..., None]  # [B, H/2, W/2, 1]

        conv0 = self.conv0(img, train)
        deconv = self.deconv(self.conv2(self.conv1(depth, train), train))
        if train or self.is_initializing():
            deconv = self.bn(deconv, use_running_average=not train)
        else:
            deconv = folded_bn_apply(
                self.variables["params"]["bn"],
                self.variables["batch_stats"]["bn"],
                deconv,
            )
        deconv = nn.relu(deconv)
        # channel order matches the reference cat((deconv, conv0))
        cat = jnp.concatenate([deconv, conv0], axis=-1)
        res = self.res(self.conv3(cat, train)).astype(jnp.float32)  # [B, H, W, 1]

        depth = upsample_nearest_x2(depth) + res
        return depth[..., 0] * (dmax - dmin) + dmin
