"""COLMAP interop tests: model codecs, quaternions, import/export round trips."""

import os

import numpy as np
import pytest

from patchmatchnet_tpu.dataio import read_cam_file, read_pair_file, save_map
from patchmatchnet_tpu.tools.colmap_export import mvs_to_colmap
from patchmatchnet_tpu.tools.colmap_import import colmap_to_mvs
from patchmatchnet_tpu.tools.colmap_model import (
    ColmapCamera,
    ColmapImage,
    quaternion_to_rotation,
    read_model,
    rotation_to_quaternion,
    write_cameras_text,
    write_images_text,
    write_points3d_text,
)
from tests.scene_utils import PLANE_Z, make_synthetic_scene


def test_quaternion_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        rot = quaternion_to_rotation(q)
        # valid rotation matrix
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-12)
        q2 = rotation_to_quaternion(rot)
        np.testing.assert_allclose(q2, q, atol=1e-9)


def _write_synthetic_colmap(root, num_images=4, num_points=60):
    """Tiny COLMAP text model: one PINHOLE camera, ring of images, shared points."""
    rng = np.random.default_rng(1)
    sparse = os.path.join(root, "sparse")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    from PIL import Image

    w, h, f = 64, 48, 70.0
    cameras = [ColmapCamera(1, "PINHOLE", w, h, [f, f, w / 2, h / 2])]
    write_cameras_text(os.path.join(sparse, "cameras.txt"), cameras)

    # points in front of all cameras
    pts = rng.uniform(-1, 1, size=(num_points, 3))
    pts[:, 2] = rng.uniform(4, 8, num_points)

    images = []
    with open(os.path.join(sparse, "points3D.txt"), "w") as pf:
        pf.write("# pts\n")
        tracks = {p: [] for p in range(num_points)}
        for i in range(num_images):
            # every image sees a random 70% subset
            seen = sorted(rng.choice(num_points, int(num_points * 0.7), replace=False))
            for p in seen:
                tracks[p].append(i + 1)
            tvec = np.array([0.3 * (i - num_images / 2), 0.0, 0.0])
            images.append(
                ColmapImage(
                    i + 1,
                    np.array([1.0, 0, 0, 0]),
                    tvec,
                    1,
                    f"view{i}.jpg",
                    np.asarray(seen, np.int64) + 1,
                )
            )
            Image.fromarray(
                (rng.random((h, w, 3)) * 255).astype(np.uint8)
            ).save(os.path.join(root, "images", f"view{i}.jpg"))
        for p in range(num_points):
            track = " ".join(f"{im} 0" for im in tracks[p])
            pf.write(
                f"{p + 1} {pts[p, 0]} {pts[p, 1]} {pts[p, 2]} 128 128 128 0.5 {track}\n"
            )

    with open(os.path.join(sparse, "images.txt"), "w") as f2:
        f2.write("# imgs\n")
        for img in images:
            q, t = img.qvec, img.tvec
            f2.write(
                f"{img.id} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} "
                f"{img.camera_id} {img.name}\n"
            )
            f2.write(" ".join(f"0 0 {p}" for p in img.point3d_ids) + "\n")
    return pts


def test_colmap_import(tmp_path):
    root = str(tmp_path)
    pts = _write_synthetic_colmap(root)
    n = colmap_to_mvs(root, root, model_ext=".txt")
    assert n == 4

    # cam files exist with sane depth ranges covering the point depths
    intr, extr, depth_params = read_cam_file(os.path.join(root, "cams", "00000000_cam.txt"))
    assert intr[0, 0] == pytest.approx(70.0)
    assert 3.5 < depth_params[0] < depth_params[1] < 9.0

    pairs = read_pair_file(os.path.join(root, "pair.txt"))
    assert len(pairs) == 4
    # nearest neighbor should score highest for the middle camera — just
    # check each view selects 3 sources (self has score 0 but may appear last)
    for ref, srcs in pairs:
        assert len(srcs) >= 3

    for i in range(4):
        assert os.path.isfile(os.path.join(root, "images", f"{i:08d}.jpg"))


def test_colmap_model_text_read(tmp_path):
    root = str(tmp_path)
    _write_synthetic_colmap(root)
    cameras, images, points = read_model(os.path.join(root, "sparse"), ".txt")
    assert cameras[1].model == "PINHOLE"
    assert len(images) == 4
    assert points.xyz.shape[1] == 3
    assert (points.xyz[:, 2] > 3.5).all()


def test_colmap_export(tmp_path):
    root = str(tmp_path / "mvs")
    make_synthetic_scene(root, num_views=3, height=48, width=64, image_extension=".jpg")
    # fake results
    for v in range(3):
        os.makedirs(os.path.join(root, "depth_est"), exist_ok=True)
        os.makedirs(os.path.join(root, "confidence"), exist_ok=True)
        save_map(
            os.path.join(root, "depth_est", f"{v:08d}.pfm"),
            np.full((48, 64), PLANE_Z, np.float32),
        )
        save_map(
            os.path.join(root, "confidence", f"{v:08d}.pfm"),
            np.full((48, 64), 0.9, np.float32),
        )

    out = str(tmp_path / "colmap_ws")
    mvs_to_colmap(root, root, out)

    assert os.path.isfile(os.path.join(out, "sparse", "cameras.txt"))
    assert os.path.isfile(os.path.join(out, "sparse", "images.txt"))
    assert os.path.isfile(os.path.join(out, "stereo", "patch-match.cfg"))
    assert os.path.isfile(os.path.join(out, "stereo", "fusion.cfg"))
    assert os.path.isfile(
        os.path.join(out, "stereo", "depth_maps", "00000000.jpg.geometric.bin")
    )

    # re-read the exported sparse model: poses must round trip
    cameras, images, _ = read_model(os.path.join(out, "sparse"), ".txt")
    assert len(images) == 3
    e0 = images[0].extrinsics()
    np.testing.assert_allclose(e0[:3, :3], np.eye(3), atol=1e-9)
