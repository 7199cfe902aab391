"""Fusion pipeline tests: geometric consistency math vs the reference's
numpy/cv2 formulation, and end-to-end fusion on a synthetic plane scene."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from patchmatchnet_tpu.dataio import read_ply, save_map
from patchmatchnet_tpu.geometry import (
    backproject_to_world,
    check_geometric_consistency,
    reproject_with_depth,
)
from patchmatchnet_tpu.infer import FusionConfig, filter_and_fuse
from tests.scene_utils import PLANE_Z, make_synthetic_scene


def _numpy_reproject(depth_ref, k_ref, e_ref, depth_src, k_src, e_src):
    """Reference-equivalent round trip in numpy + cv2 (eval.py:86-145 semantics)."""
    import cv2

    height, width = depth_ref.shape
    x_ref, y_ref = np.meshgrid(np.arange(width), np.arange(height))
    x_ref, y_ref = x_ref.reshape(-1), y_ref.reshape(-1)
    xyz_ref = np.linalg.inv(k_ref) @ (
        np.vstack((x_ref, y_ref, np.ones_like(x_ref))) * depth_ref.reshape(-1)
    )
    xyz_src = (e_src @ np.linalg.inv(e_ref) @ np.vstack((xyz_ref, np.ones_like(x_ref))))[:3]
    k_xyz_src = k_src @ xyz_src
    xy_src = k_xyz_src[:2] / k_xyz_src[2:3]
    x_src = xy_src[0].reshape(height, width).astype(np.float32)
    y_src = xy_src[1].reshape(height, width).astype(np.float32)
    sampled = cv2.remap(depth_src, x_src, y_src, interpolation=cv2.INTER_LINEAR)
    xyz_src2 = np.linalg.inv(k_src) @ (
        np.vstack((xy_src, np.ones_like(x_ref))) * sampled.reshape(-1)
    )
    xyz_rep = (e_ref @ np.linalg.inv(e_src) @ np.vstack((xyz_src2, np.ones_like(x_ref))))[:3]
    depth_rep = xyz_rep[2].reshape(height, width).astype(np.float32)
    k_xyz_rep = k_ref @ xyz_rep
    xy_rep = k_xyz_rep[:2] / k_xyz_rep[2:3]
    return (
        depth_rep,
        xy_rep[0].reshape(height, width).astype(np.float32),
        xy_rep[1].reshape(height, width).astype(np.float32),
    )


@pytest.fixture(scope="module")
def cam_setup():
    rng = np.random.default_rng(3)
    h, w = 48, 64
    f = 1.1 * w
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    e_ref = np.eye(4, dtype=np.float32)
    ang = 0.06
    e_src = np.eye(4, dtype=np.float32)
    e_src[:3, :3] = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    )
    e_src[0, 3] = 0.4
    depth_ref = (PLANE_Z + 0.3 * rng.standard_normal((h, w))).astype(np.float32)
    depth_src = (PLANE_Z + 0.3 * rng.standard_normal((h, w))).astype(np.float32)
    return depth_ref, k, e_ref, depth_src, k, e_src


def test_reproject_matches_numpy_cv2(cam_setup):
    depth_ref, k_ref, e_ref, depth_src, k_src, e_src = cam_setup
    ours = reproject_with_depth(
        jnp.asarray(depth_ref), jnp.asarray(k_ref), jnp.asarray(e_ref),
        jnp.asarray(depth_src), jnp.asarray(k_src), jnp.asarray(e_src),
    )
    ref = _numpy_reproject(depth_ref, k_ref, e_ref, depth_src, k_src, e_src)
    # cv2.remap quantizes coordinates to 1/32 px; allow correspondingly loose atol.
    for a, b, name in zip(ours, ref, ("depth", "x", "y")):
        np.testing.assert_allclose(
            np.asarray(a), b, atol=5e-2, rtol=1e-4, err_msg=name
        )


def test_consistency_perfect_depth():
    """With exact plane depth in both views, every in-frustum pixel passes."""
    h, w = 48, 64
    f = 1.1 * w
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    e_ref = np.eye(4, dtype=np.float32)
    e_src = np.eye(4, dtype=np.float32)
    e_src[0, 3] = 0.35
    depth = np.full((h, w), PLANE_Z, np.float32)
    mask, reproj = check_geometric_consistency(
        jnp.asarray(depth), jnp.asarray(k), jnp.asarray(e_ref),
        jnp.asarray(depth), jnp.asarray(k), jnp.asarray(e_src),
        1.0, 0.01,
    )
    mask = np.asarray(mask)
    # pixels that project inside the source frustum must all be consistent
    assert mask.mean() > 0.85
    np.testing.assert_allclose(np.asarray(reproj)[mask], PLANE_Z, atol=1e-3)


def test_backproject_to_world():
    h, w = 8, 10
    k = np.array([[20.0, 0, 5.0], [0, 20.0, 4.0], [0, 0, 1]], np.float32)
    e = np.eye(4, dtype=np.float32)
    e[0, 3] = 1.5  # camera shifted
    depth = np.full((h, w), 4.0, np.float32)
    world = np.asarray(backproject_to_world(jnp.asarray(depth), jnp.asarray(k), jnp.asarray(e)))
    assert world.shape == (h, w, 3)
    np.testing.assert_allclose(world[..., 2], 4.0, atol=1e-5)
    # pixel at principal point maps to world x = -t_x
    np.testing.assert_allclose(world[4, 5, 0], -1.5, atol=1e-5)


def test_filter_and_fuse_plane(tmp_path):
    """End-to-end fusion on a synthetic scene with perfect depth maps: the
    fused cloud must lie on the z = PLANE_Z plane."""
    root = str(tmp_path)
    make_synthetic_scene(root, num_views=4, height=48, width=64)

    # Write "estimated" depth (exact) + confidence for each view.
    for v in range(4):
        ddir = os.path.join(root, "depth_est")
        cdir = os.path.join(root, "confidence")
        os.makedirs(ddir, exist_ok=True)
        os.makedirs(cdir, exist_ok=True)
        depth = np.full((48, 64), PLANE_Z, np.float32)
        conf = np.full((48, 64), 0.9, np.float32)
        save_map(os.path.join(ddir, f"{v:08d}.pfm"), depth)
        save_map(os.path.join(cdir, f"{v:08d}.pfm"), conf)

    cfg = FusionConfig(photo_thres=0.5, geo_mask_thres=2, image_extension=".png")

    # Decode-once accounting (VERDICT round-2 item 7): fusing an N-view scan
    # must decode each image exactly once and read each depth map exactly
    # once (+ one confidence map per ref view) — not O(refs x srcs) like the
    # reference's serial loop (reference: eval.py:203-250).
    import patchmatchnet_tpu.infer.fusion as fusion_mod

    counts = {"image": 0, "map": 0}
    real_read_image = fusion_mod.read_image
    real_read_map = fusion_mod.read_map

    def counting_read_image(*a, **k):
        counts["image"] += 1
        return real_read_image(*a, **k)

    def counting_read_map(*a, **k):
        counts["map"] += 1
        return real_read_map(*a, **k)

    fusion_mod.read_image = counting_read_image
    fusion_mod.read_map = counting_read_map
    try:
        ply_path = filter_and_fuse(root, root, "", cfg, verbose=False)
    finally:
        fusion_mod.read_image = real_read_image
        fusion_mod.read_map = real_read_map

    n = 4
    assert counts["image"] == n, f"expected {n} image decodes, got {counts['image']}"
    assert counts["map"] == 2 * n, (
        f"expected {2 * n} map reads (depth + confidence), got {counts['map']}"
    )

    xyz, rgb = read_ply(ply_path)
    assert xyz.shape[0] > 1000
    np.testing.assert_allclose(xyz[:, 2], PLANE_Z, atol=2e-2)
    # masks written
    assert os.path.isfile(os.path.join(root, "mask", "00000000_final.png"))
