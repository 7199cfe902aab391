"""Legacy raw-DTU dataset tests on a synthetic mini tree."""

import os

import numpy as np
import pytest

from patchmatchnet_tpu.data import BatchLoader, DTULegacyDataset
from patchmatchnet_tpu.data.dtu_legacy import prepare_hr_image
from patchmatchnet_tpu.dataio import save_cam_file, save_image, save_pair_file, save_pfm


@pytest.fixture(scope="module")
def raw_dtu(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raw_dtu"))
    scan = "scan1"
    num_views = 3
    os.makedirs(os.path.join(root, "Cameras_1/train"), exist_ok=True)
    os.makedirs(os.path.join(root, f"Rectified/{scan}_train"), exist_ok=True)
    os.makedirs(os.path.join(root, f"Depths_raw/{scan}"), exist_ok=True)

    k_quarter = np.array(
        [[360.0, 0, 200.0], [0, 360.0, 150.0], [0, 0, 1]], np.float32
    )
    rng = np.random.default_rng(0)
    pairs = []
    for v in range(num_views):
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = 0.2 * v
        save_cam_file(
            os.path.join(root, f"Cameras_1/train/{v:08d}_cam.txt"),
            k_quarter,
            e,
            [425.0, 935.0],
        )
        for light in range(7):
            # preprocessed DTU training images are 640x512
            img = rng.random((512, 640, 3)).astype(np.float32)
            save_image(
                os.path.join(
                    root, f"Rectified/{scan}_train/rect_{v + 1:03d}_{light}_r5000.png"
                ),
                (img * 0.5),
            )
        depth = np.full((1200, 1600), 600.0 + v, np.float32)
        save_pfm(os.path.join(root, f"Depths_raw/{scan}/depth_map_{v:04d}.pfm"), depth)
        visual = np.zeros((1200, 1600), np.float32)
        visual[200:1000, 200:1400] = 1.0  # mask interior
        save_image(
            os.path.join(root, f"Depths_raw/{scan}/depth_visual_{v:04d}.png"), visual
        )
        pairs.append((v, [(s, 1.0) for s in range(num_views) if s != v]))

    save_pair_file(os.path.join(root, "Cameras_1/pair.txt"), pairs)
    list_file = os.path.join(root, "list.txt")
    with open(list_file, "w") as f:
        f.write(scan + "\n")
    return root, list_file


def test_prepare_hr_image():
    img = np.arange(1200 * 1600, dtype=np.float32).reshape(1200, 1600)
    out = prepare_hr_image(img)
    assert out.shape == (512, 640)
    # downsample picks even rows/cols; crop starts at ((600-512)//2, (800-640)//2)
    assert out[0, 0] == img[2 * 44, 2 * 80]


def test_legacy_dataset(raw_dtu):
    root, list_file = raw_dtu
    ds = DTULegacyDataset(root, list_file, num_views=3)
    assert len(ds) == 3 * 7  # views x light indexes
    s = ds[0]
    assert s["images"].shape == (3, 512, 640, 3)
    # image resolution matches the prepared GT resolution (training-ready)
    assert s["images"].shape[1:3] == s["depth_gt"].shape
    # intrinsics upscaled x4
    assert s["intrinsics"][0][0, 0] == pytest.approx(360.0 * 4)
    assert s["depth_gt"].shape == (512, 640)
    assert s["mask"].shape == (512, 640)
    assert s["depth_min"] == pytest.approx(425.0)
    np.testing.assert_allclose(s["depth_gt"], 600.0, atol=1e-4)
    # mask interior true, border false
    assert s["mask"][256, 320]
    assert not s["mask"][0, 0]


def test_legacy_dataset_with_loader(raw_dtu):
    root, list_file = raw_dtu
    ds = DTULegacyDataset(root, list_file, num_views=2)
    loader = BatchLoader(ds, batch_size=2, adjust=True, num_threads=1)
    batch = next(iter(loader))
    # 512x640 already multiples of 8
    assert batch["images"].shape == (2, 2, 512, 640, 3)
    assert batch["depth_gt"].shape == (2, 512, 640)
