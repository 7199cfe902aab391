"""Space-to-depth convolution folding for small-channel conv stacks.

TPU tensors put channels on the 128-lane minor dim; the feature
extractor's full-resolution layers (C=3..16, reference models/net.py:24-35)
waste 110+ lanes per vreg and run ~10x over the bandwidth floor (measured:
conv0/conv1/conv2 = 7.9 ms of the 13.3 ms FeatureNet forward at the bench
geometry). Folding f x f spatial blocks into channels ("space-to-depth")
makes them [H/f, W/f, f*f*C] convs with packed lanes and MXU-friendly
contraction sizes. The transform is EXACT: a k x k stride-s conv on the
original grid equals a kf x kf stride-1 conv on folded tensors with a
block-structured folded kernel (built here at trace time from the original
weights), where the output fold factor is f_out = f_in / s.

Channel order convention everywhere: folded channel index = (dy, dx, c),
i.e. `fold(x)[..., Y, X, (dy*f + dx)*C + c] == x[..., Y*f+dy, X*f+dx, c]`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fold_image(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/f, W/f, f*f*C] (H, W must divide by f)."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // f, w // f, f * f * c)


def unfold_image(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of fold_image: [B, Hf, Wf, f*f*C] -> [B, Hf*f, Wf*f, C]."""
    if f == 1:
        return x
    b, hf, wf, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, hf, wf, f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, hf * f, wf * f, c)


def folded_conv_geometry(k: int, s: int, p: int, f_in: int):
    """Folded kernel size and padding for a k x k / stride s / pad p conv
    consumed at input fold f_in, produced at output fold f_out = f_in // s.

    Returns (kf, pad_lo, pad_hi, f_out). Derivation: output row
    y' = Y'*f_out + dy' reads input rows y'*s - p + dy = Y'*f_in + t with
    t = dy'*s - p + dy; the folded tap index is DY = floor(t / f_in), so
    kf = DYmax - DYmin + 1, pad_lo = -DYmin, and (stride-1 output size
    preservation) pad_hi = kf - 1 - pad_lo = DYmax.
    """
    assert f_in % s == 0, (f_in, s)
    f_out = f_in // s
    tmin = -p
    tmax = (f_out - 1) * s - p + (k - 1)
    dy_min = tmin // f_in
    dy_max = tmax // f_in
    kf = dy_max - dy_min + 1
    return kf, -dy_min, dy_max, f_out


def fold_conv_kernel(kernel: jnp.ndarray, s: int, p: int, f_in: int) -> jnp.ndarray:
    """Fold an HWIO kernel [k, k, ci, co] for fold-domain application.

    Returns [kf, kf, f_in*f_in*ci, f_out*f_out*co]; apply with
    lax.conv_general_dilated(stride 1, padding from folded_conv_geometry).
    Zero-fill where the original kernel has no support (the MAC inflation
    is irrelevant on the MXU; lane packing is what matters).
    """
    k, _, ci, co = kernel.shape
    kf, pad_lo, _, f_out = folded_conv_geometry(k, s, p, f_in)
    # taps[(DY, dy, dy')] for every valid (dy, dy') pair
    out = jnp.zeros((kf, kf, f_in, f_in, ci, f_out, f_out, co), kernel.dtype)
    rows = []  # (DY, dy_in_block, dy_out) per original dy tap
    for dy_out in range(f_out):
        for dy in range(k):
            t = dy_out * s - p + dy
            rows.append((t // f_in + pad_lo, t % f_in, dy_out, dy))
    for ry, dy_in, ry_out, dy in rows:
        for cx, dx_in, cx_out, dx in rows:
            out = out.at[ry, cx, dy_in, dx_in, :, ry_out, cx_out, :].set(
                kernel[dy, dx]
            )
    return out.reshape(kf, kf, f_in * f_in * ci, f_out * f_out * co)


def fold_channel_vector(v: jnp.ndarray, f: int) -> jnp.ndarray:
    """Tile a per-channel vector (BN scale/bias) across the f*f phases."""
    return jnp.broadcast_to(v, (f * f, v.shape[0])).reshape(-1)


def raw_fold_conv_geometry(k: int, s: int, p: int, f_out: int):
    """Geometry for a conv that consumes the RAW (fold-1) image and emits
    fold-f_out output directly — the space-to-depth transform fused into
    the layer itself, so no separate fold_image pass exists. The folded
    conv is a stride-(s*f_out) conv with kernel (f_out-1)*s + k.

    Returns (kf, stride, pad_lo, pad_hi).
    """
    kf = (f_out - 1) * s + k
    stride = s * f_out
    pad_lo = p
    pad_hi = kf - stride - p
    return kf, stride, pad_lo, max(pad_hi, 0)


def raw_fold_conv_kernel(kernel: jnp.ndarray, s: int, p: int, f_out: int) -> jnp.ndarray:
    """Fold an HWIO kernel [k, k, ci, co] for raw-input application:
    returns [kf, kf, ci, f_out*f_out*co] with output channel order
    (dy', dx', co). Entry [dy'*s - p + dy + p, ..., ci, (dy', dx', co)] =
    kernel[dy, dx, ci, co]."""
    k, _, ci, co = kernel.shape
    kf, _, _, _ = raw_fold_conv_geometry(k, s, p, f_out)
    out = jnp.zeros((kf, kf, ci, f_out, f_out, co), kernel.dtype)
    taps = [(dy_out * s + dy, dy_out, dy)
            for dy_out in range(f_out) for dy in range(k)]
    for ry, ry_out, dy in taps:
        for cx, cx_out, dx in taps:
            out = out.at[ry, cx, :, ry_out, cx_out, :].set(kernel[dy, dx])
    return out.reshape(kf, kf, ci, f_out * f_out * co)
