"""Layer primitives (NHWC, flax.linen) with torch-compatible semantics.

Conv/BN blocks mirror the reference primitives (reference:
models/module.py:11-127). BatchNorm uses eps=1e-5 and EMA decay 0.9 (torch
momentum 0.1). Initializers reproduce torch's kaiming_uniform(a=sqrt(5))
defaults so training-from-scratch dynamics are comparable.

The reference's 1x1x1 Conv3d stacks (SimilarityNet / PixelwiseNet /
FeatureWeightNet) are per-position channel maps, so here they are Dense
layers over a channels-last tensor — a pure MXU matmul on TPU instead of a
degenerate 3-D convolution.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on an HWIO (or [I, O] dense) kernel:
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = prod(shape[:-1])."""
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(fan_in)))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    """torch bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / float(fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def apply_batch_norm(
    mod: nn.Module,
    x: jnp.ndarray,
    train: bool,
    channel_axis: int = -1,
    name: str = "bn",
    dtype: Any = None,
) -> jnp.ndarray:
    """BatchNorm that FOLDS to one multiply-add at inference.

    Training (and init) uses flax BatchNorm (batch-stat EMA updates, f32
    normalization) with identical variable paths. At inference the running
    stats fold into scale = gamma * rsqrt(var + eps) and
    bias = beta - mean * scale, applied in the input dtype as a single
    fused elementwise op — flax's BatchNorm instead converts the (bf16)
    conv output to f32, normalizes, and converts back, three extra
    full-resolution memory passes per layer (measured ~4x the bandwidth
    floor on the feature extractor).

    Numerics: x * scale + (beta - mean * scale) equals flax's
    ((x - mean) * rsqrt(var + eps)) * gamma + beta up to FP association;
    on the bf16 path the apply rounds in bf16 rather than f32.
    """
    if train or mod.is_initializing():
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            axis=channel_axis, dtype=dtype, name=name,
        )(x)
    return folded_bn_apply(
        mod.variables["params"][name],
        mod.variables["batch_stats"][name],
        x,
        channel_axis=channel_axis,
    )


def folded_bn_apply(p, s, x, channel_axis: int = -1) -> jnp.ndarray:
    """The inference half of `apply_batch_norm`, usable from setup-style
    modules that declare their own nn.BatchNorm child for training."""
    scale = p["scale"] * jax.lax.rsqrt(s["var"] + 1e-5)
    bias = p["bias"] - s["mean"] * scale
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis % x.ndim]
    dt = x.dtype
    return x * scale.reshape(shape).astype(dt) + bias.reshape(shape).astype(dt)


class Conv2d(nn.Module):
    """2D convolution with torch padding/dilation semantics (NHWC)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    use_bias: bool = True
    zero_init: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size * self.kernel_size
        if self.zero_init:
            kernel_init = nn.initializers.zeros
            bias_init = nn.initializers.zeros
        else:
            kernel_init = torch_kernel_init
            bias_init = torch_bias_init(fan_in)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name="conv2d",
        )(x)


class ConvBnReLU(nn.Module):
    """Conv2d (no bias) + BatchNorm + ReLU (reference: module.py:11-40)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = apply_batch_norm(self, x, train, dtype=self.dtype)
        return nn.relu(x)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense-compatible naming (kernel [in, out],
    optional bias [out]) so channel maps can be applied on ANY axis via
    einsum without transposing the data."""

    features: int
    in_features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_kernel_init, (self.in_features, self.features)
        )
        bias = (
            self.param("bias", torch_bias_init(self.in_features), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


def _apply_channel_map(x, kernel, bias, channel_axis, dtype):
    """x [..., C, ...] -> [..., F, ...] contracting `channel_axis` with kernel."""
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype) if bias is not None else None
    ndim = x.ndim
    axis = channel_axis % ndim
    if axis == ndim - 1:
        y = jnp.matmul(x, kernel)
        if bias is not None:
            y = y + bias
        return y
    # contract an interior channel axis without materializing a transpose
    y = jnp.einsum("...c,ck->...k", jnp.moveaxis(x, axis, -1), kernel)
    y = jnp.moveaxis(y, -1, axis)
    if bias is not None:
        shape = [1] * ndim
        shape[axis] = -1
        y = y + bias.reshape(shape)
    return y


class DenseBnReLU(nn.Module):
    """Per-position channel map + BatchNorm + ReLU.

    TPU-native equivalent of the reference's ConvBnReLU3D with 1x1x1 kernels
    (reference: module.py:43-72 as used in patchmatch.py:547-548, 597-598,
    690-691). `channel_axis` selects which axis holds the channels (-1 for
    channels-last, 1 for channel-first volumes) — parameter shapes/paths are
    identical either way.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, channel_axis: int = -1
    ) -> jnp.ndarray:
        cin = x.shape[channel_axis]
        kernel, _ = _DenseParams(self.features, cin, False, name="conv")()
        x = _apply_channel_map(x, kernel, None, channel_axis, self.dtype)
        x = apply_batch_norm(
            self, x, train, channel_axis=channel_axis, dtype=self.dtype
        )
        return nn.relu(x)


class Dense1(nn.Module):
    """Dense with bias — equivalent of a 1x1x1 Conv3d with bias."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
        cin = x.shape[channel_axis]
        kernel, bias = _DenseParams(self.features, cin, True, name="dense")()
        return _apply_channel_map(x, kernel, bias, channel_axis, self.dtype)


class ConvTranspose2dTorch(nn.Module):
    """Transposed conv matching torch ConvTranspose2d(k=3, s=2, p=1, op=1).

    Implemented directly via lax.conv_general_dilated with input dilation;
    the kernel is stored in forward-conv HWIO layout (spatially flipped
    relative to torch's [I, O, kH, kW] deconv weight — see compat converter).
    Output is exactly 2x the spatial size. No bias (reference: net.py:86-88).
    """

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size

        def init(key, shape, dtype=jnp.float32):
            # torch fan_in for ConvTranspose2d = out_channels * k * k
            bound = 1.0 / float(self.features * k * k) ** 0.5
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", init, (k, k, in_ch, self.features))
        # pad = k - 1 - p = 1 on the low side, + output_padding = 2 high side
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ConvBn(nn.Module):
    """Conv2d (no bias) + BatchNorm, no activation (reference:
    module.py:107-127 — defined by the reference but unused; provided for
    API-surface parity)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        return apply_batch_norm(self, x, train, dtype=self.dtype)


class Conv1dBnReLU(nn.Module):
    """1-D Conv + BatchNorm + ReLU over [B, L, C] (reference:
    module.py:75-104 — defined by the reference but unused; provided for
    API-surface parity)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=((self.pad, self.pad),),
            kernel_dilation=(self.dilation,),
            use_bias=False,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = apply_batch_norm(self, x, train, dtype=self.dtype)
        return nn.relu(x)


def batch_norm_2d(x: jnp.ndarray, train: bool, name: str = "bn"):
    """Standalone BatchNorm factory used by Refinement (reference net.py:90)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )(x)
