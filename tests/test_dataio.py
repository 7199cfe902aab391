"""Round-trip and golden tests for the file codecs."""

import numpy as np
import pytest

from patchmatchnet_tpu.dataio import (
    read_bin,
    read_cam_file,
    read_image,
    read_map,
    read_pair_file,
    read_pfm,
    read_ply,
    resize_bilinear_np,
    save_bin,
    save_cam_file,
    save_image,
    save_map,
    save_pair_file,
    save_pfm,
    save_ply,
    scale_to_max_dim,
)


def test_pfm_roundtrip_gray(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((37, 53, 1)).astype(np.float32)
    path = str(tmp_path / "d.pfm")
    save_pfm(path, data)
    out, scale = read_pfm(path)
    np.testing.assert_array_equal(out, data)
    assert scale == 1.0


def test_pfm_roundtrip_color_and_2d(tmp_path):
    rng = np.random.default_rng(1)
    color = rng.standard_normal((8, 5, 3)).astype(np.float32)
    path = str(tmp_path / "c.pfm")
    save_pfm(path, color)
    out, _ = read_pfm(path)
    np.testing.assert_array_equal(out, color)

    gray2d = rng.standard_normal((6, 9)).astype(np.float32)
    path2 = str(tmp_path / "g.pfm")
    save_pfm(path2, gray2d)
    out2, _ = read_pfm(path2)
    np.testing.assert_array_equal(out2[:, :, 0], gray2d)


def test_colmap_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    for shape in [(11, 7), (11, 7, 1), (4, 9, 3)]:
        data = rng.standard_normal(shape).astype(np.float32)
        path = str(tmp_path / "m.bin")
        save_bin(path, data)
        out = read_bin(path)
        expected = data if data.ndim == 3 else data[:, :, None]
        np.testing.assert_array_equal(out, expected)


def test_map_dispatch(tmp_path):
    data = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    for ext in (".pfm", ".bin"):
        path = str(tmp_path / f"m{ext}")
        save_map(path, data)
        np.testing.assert_array_equal(read_map(path), data)
    with pytest.raises(ValueError):
        save_map(str(tmp_path / "m.npy"), data)


def test_cam_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    intr = rng.standard_normal((3, 3)).astype(np.float32)
    extr = rng.standard_normal((4, 4)).astype(np.float32)
    path = str(tmp_path / "00000000_cam.txt")
    save_cam_file(path, intr, extr, [425.0, 937.0])
    intr2, extr2, depth_params = read_cam_file(path)
    np.testing.assert_allclose(intr2, intr, rtol=1e-6)
    np.testing.assert_allclose(extr2, extr, rtol=1e-6)
    np.testing.assert_allclose(depth_params, [425.0, 937.0])


def test_cam_file_no_depth(tmp_path):
    path = str(tmp_path / "cam.txt")
    save_cam_file(path, np.eye(3), np.eye(4))
    _, _, depth_params = read_cam_file(path)
    assert depth_params.size == 0


def test_pair_file_roundtrip(tmp_path):
    pairs = [
        (0, [(10, 100.5), (12, 50.25)]),
        (1, []),  # zero-source views are dropped on read
        (2, [(5, 1.0)]),
    ]
    path = str(tmp_path / "pair.txt")
    save_pair_file(path, pairs)
    out = read_pair_file(path)
    assert out == [(0, [10, 12]), (2, [5])]


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, size=(100, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    save_ply(path, xyz, rgb)
    xyz2, rgb2 = read_ply(path)
    np.testing.assert_array_equal(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_image_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(32, 48, 3)).astype(np.uint8)
    path = str(tmp_path / "img.png")
    save_image(path, img)
    out, oh, ow = read_image(path)
    assert (oh, ow) == (32, 48)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def test_save_image_bool_and_float(tmp_path):
    mask = np.zeros((4, 4), dtype=bool)
    mask[1, 2] = True
    path = str(tmp_path / "mask.png")
    save_image(path, mask)
    out, _, _ = read_image(path)
    assert out[1, 2] == 1.0 and out[0, 0] == 0.0

    fimg = np.full((4, 4), 0.5, dtype=np.float32)
    path2 = str(tmp_path / "f.png")
    save_image(path2, fimg)
    out2, _, _ = read_image(path2)
    np.testing.assert_allclose(out2, 127.0 / 255.0, atol=1e-6)


def test_scale_to_max_dim():
    img = np.random.default_rng(6).standard_normal((100, 200, 3)).astype(np.float32)
    out, oh, ow = scale_to_max_dim(img, 50)
    assert (oh, ow) == (100, 200)
    assert out.shape == (25, 50, 3)
    # No upscaling
    out2, _, _ = scale_to_max_dim(img, 400)
    assert out2.shape == (100, 200, 3)
    out3, _, _ = scale_to_max_dim(img, -1)
    assert out3.shape == (100, 200, 3)


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    img = rng.standard_normal((21, 33, 3)).astype(np.float32)
    out = resize_bilinear_np(img, 10, 17)
    ref = (
        F.interpolate(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            size=(10, 17),
            mode="bilinear",
            align_corners=False,
        )[0]
        .numpy()
        .transpose(1, 2, 0)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)
