"""Bit-closeness tests of grid sampling / warping / resizing against torch CPU."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from patchmatchnet_tpu.ops import (  # noqa: E402
    differentiable_warp,
    downsample_nearest,
    grid_sample_2d,
    resize_bilinear,
    upsample_bilinear_x2,
    upsample_nearest_x2,
)


def _rand_grid(rng, shape, lo=-1.4, hi=1.4):
    return (rng.random(shape) * (hi - lo) + lo).astype(np.float32)


@pytest.mark.parametrize("method", ["quad", "taps4"])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(align_corners, padding_mode, method):
    rng = np.random.default_rng(42)
    b, h, w, c = 2, 13, 17, 5
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    grid = _rand_grid(rng, (b, 11, 19, 2))

    ours = grid_sample_2d(
        jnp.asarray(img),
        jnp.asarray(grid),
        align_corners=align_corners,
        padding_mode=padding_mode,
        method=method,
    )

    ref = F.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=padding_mode,
        align_corners=align_corners,
    ).numpy()  # [B, C, 11, 19]

    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=5e-6, rtol=1e-5
    )


def test_grid_sample_exact_grid_points():
    """On exact integer pixel locations the sampler must return the pixel."""
    rng = np.random.default_rng(0)
    b, h, w, c = 1, 8, 6, 3
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = xs / ((w - 1) / 2) - 1
    gy = ys / ((h - 1) / 2) - 1
    grid = np.stack([gx, gy], axis=-1)[None].astype(np.float32)
    out = grid_sample_2d(
        jnp.asarray(img), jnp.asarray(grid), align_corners=True, padding_mode="zeros"
    )
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def _torch_warp(src_fea, src_proj, ref_proj, depth):
    """Reference warp assembled from torch primitives (module.py:130-181 semantics)."""
    b, d, h, w = depth.shape
    c = src_fea.shape[1]
    src_h, src_w = src_fea.shape[2], src_fea.shape[3]
    proj = torch.matmul(src_proj, torch.inverse(ref_proj))
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]
    y, x = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32),
        indexing="ij",
    )
    xyz = torch.stack((x.reshape(-1), y.reshape(-1), torch.ones(h * w)))[None].repeat(b, 1, 1)
    rdx = torch.matmul(rot, xyz).unsqueeze(2).repeat(1, 1, d, 1) * depth.reshape(b, 1, d, h * w)
    pxyz = rdx + trans.reshape(b, 3, 1, 1)
    neg = pxyz[:, 2:] <= 1e-3
    pxyz[:, 0:1][neg] = float(src_w)
    pxyz[:, 1:2][neg] = float(src_h)
    pxyz[:, 2:3][neg] = 1.0
    grid = pxyz[:, :2] / pxyz[:, 2:3]
    gx = grid[:, 0] / ((src_w - 1) / 2) - 1
    gy = grid[:, 1] / ((src_h - 1) / 2) - 1
    grid = torch.stack((gx, gy), dim=3)
    return F.grid_sample(
        src_fea,
        grid.reshape(b, d * h, w, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).reshape(b, c, d, h, w)


def test_warp_matches_torch():
    rng = np.random.default_rng(7)
    b, c, h, w, d = 2, 8, 12, 16, 5
    src = rng.standard_normal((b, c, h, w)).astype(np.float32)

    # Plausible camera setup: intrinsics + small relative rotation/translation
    k = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]], dtype=np.float32)

    def make_proj(tx):
        e = np.eye(4, dtype=np.float32)
        angle = 0.05 * tx
        e[:3, :3] = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ],
            dtype=np.float32,
        )
        e[0, 3] = tx
        p = np.eye(4, dtype=np.float32)
        p[:3, :4] = k @ e[:3, :4]
        return p

    ref_proj = np.stack([make_proj(0.0)] * b)
    src_proj = np.stack([make_proj(1.0), make_proj(-0.5)])
    depth = (rng.random((b, d, h, w)) * 5 + 2).astype(np.float32)
    # Include some depths that project behind the source camera
    depth[0, 0, :2, :2] = 0.0001

    ours = differentiable_warp(
        jnp.asarray(src.transpose(0, 2, 3, 1)),
        jnp.asarray(src_proj),
        jnp.asarray(ref_proj),
        jnp.asarray(depth),
    )
    ref = _torch_warp(
        torch.from_numpy(src),
        torch.from_numpy(src_proj),
        torch.from_numpy(ref_proj),
        torch.from_numpy(depth),
    ).numpy()  # [B, C, D, H, W]

    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 4, 1), atol=3e-5, rtol=1e-4
    )


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ours = upsample_nearest_x2(jnp.asarray(x))
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2.0, mode="nearest"
    ).numpy()
    np.testing.assert_array_equal(np.asarray(ours), ref.transpose(0, 2, 3, 1))


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_downsample_nearest_matches_torch(factor):
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 32, 40, 1)).astype(np.float32)
    ours = downsample_nearest(jnp.asarray(x), factor)
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=1.0 / factor, mode="nearest"
    ).numpy()
    np.testing.assert_array_equal(np.asarray(ours), ref.transpose(0, 2, 3, 1))


def test_upsample_bilinear_x2_matches_torch():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 9, 11, 4)).astype(np.float32)
    ours = upsample_bilinear_x2(jnp.asarray(x))
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        scale_factor=2.0,
        mode="bilinear",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=2e-6)


@pytest.mark.parametrize("out_size", [(5, 6), (14, 23), (9, 11)])
def test_resize_bilinear_matches_torch(out_size):
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), *out_size)
    ref = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        size=out_size,
        mode="bilinear",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1), atol=2e-6)
