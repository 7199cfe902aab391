"""Dataset layer tests on a synthetic on-disk scene."""

import numpy as np
import pytest

from patchmatchnet_tpu.data import (
    BatchLoader,
    MVSDataset,
    adjust_dims_multiple_of_8,
    adjust_sample_dims,
)
from tests.scene_utils import PLANE_Z, make_synthetic_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    k, extr = make_synthetic_scene(root, num_views=4, height=64, width=80)
    return root, k, extr


def test_dataset_basic(scene):
    root, k, extr = scene
    ds = MVSDataset(root, num_views=2, image_extension=".png")
    assert len(ds) == 4
    s = ds[0]
    assert s["images"].shape == (3, 64, 80, 3)  # ref + 2 srcs
    assert s["intrinsics"].shape == (3, 3, 3)
    assert s["extrinsics"].shape == (3, 4, 4)
    np.testing.assert_allclose(s["intrinsics"][0], k, rtol=1e-5)
    assert s["depth_min"] == pytest.approx(0.8 * PLANE_Z)
    assert s["depth_max"] == pytest.approx(1.3 * PLANE_Z)
    assert s["depth_gt"].shape == (64, 80)
    np.testing.assert_allclose(s["depth_gt"], PLANE_Z, atol=1e-4)
    assert s["mask"].all()
    assert s["filename"] == "{}/00000000{}"


def test_dataset_max_dim_rescale(scene):
    root, k, _ = scene
    ds = MVSDataset(root, num_views=2, max_dim=40, image_extension=".png")
    s = ds[0]
    # 64x80 -> 32x40
    assert s["images"].shape[1:3] == (32, 40)
    np.testing.assert_allclose(s["intrinsics"][0][0], k[0] * 0.5, rtol=1e-5)
    assert s["depth_gt"].shape == (32, 40)


def test_dataset_view_cap(scene):
    root, _, _ = scene
    ds = MVSDataset(root, num_views=10, image_extension=".png")
    s = ds[0]
    assert s["images"].shape[0] == 4  # capped at available sources + ref


def test_robust_train_sampling(scene):
    root, _, _ = scene
    ds = MVSDataset(root, num_views=2, image_extension=".png", robust_train=True)
    seen = set()
    for _ in range(20):
        s = ds[0]
        seen.add(tuple(np.round(s["extrinsics"][:, 0, 3], 3)))
    assert len(seen) > 1  # random view selection takes effect


def test_adjust_dims():
    assert adjust_dims_multiple_of_8(64, 80) == (64, 80)
    # Python banker's rounding (matches the reference's int(round(x/8))*8)
    assert adjust_dims_multiple_of_8(100, 150) == (96, 152)
    assert adjust_dims_multiple_of_8(1196, 1600) == (1200, 1600)


def test_adjust_sample_dims(scene):
    root, _, _ = scene
    ds = MVSDataset(root, num_views=2, max_dim=60, image_extension=".png")
    s = ds[0]  # 48x60 -> not multiples of 8
    assert s["images"].shape[1:3] == (48, 60)
    adj = adjust_sample_dims(s)
    # 60/8 = 7.5 rounds to 8 (banker's) -> width 64
    assert adj["images"].shape[1:3] == (48, 64)
    assert (adj["orig_height"], adj["orig_width"]) == (48, 60)
    np.testing.assert_allclose(
        adj["intrinsics"][0][0], s["intrinsics"][0][0] * 64 / 60, rtol=1e-5
    )


@pytest.mark.parametrize("num_threads", [1, 3])
def test_batch_loader(scene, num_threads):
    root, _, _ = scene
    ds = MVSDataset(root, num_views=2, image_extension=".png")
    loader = BatchLoader(ds, batch_size=2, shuffle=True, num_threads=num_threads)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (2, 3, 64, 80, 3)
    assert batches[0]["depth_min"].shape == (2,)
    assert isinstance(batches[0]["filename"], list)


def test_batch_loader_concurrency(scene):
    """num_threads workers must load samples of one batch CONCURRENTLY
    (round-1 regression: a single producer thread loaded them serially)."""
    import threading
    import time

    root, _, _ = scene
    ds = MVSDataset(root, num_views=2, image_extension=".png")

    lock = threading.Lock()
    active = {"now": 0, "peak": 0}
    orig = MVSDataset.__getitem__

    def slow_getitem(self, idx):
        with lock:
            active["now"] += 1
            active["peak"] = max(active["peak"], active["now"])
        time.sleep(0.05)
        try:
            return orig(self, idx)
        finally:
            with lock:
                active["now"] -= 1

    MVSDataset.__getitem__ = slow_getitem
    try:
        loader = BatchLoader(ds, batch_size=3, num_threads=3, prefetch=1)
        start = time.perf_counter()
        batches = list(loader)
        elapsed = time.perf_counter() - start
    finally:
        MVSDataset.__getitem__ = orig

    n = len(ds)
    assert len(batches) == (n + 2) // 3
    assert active["peak"] >= 2, "samples in a batch did not load concurrently"
    # serial loading would sleep n * 0.05s back to back
    assert elapsed < n * 0.05 * 0.75 + 0.3


def test_batch_loader_drop_last(scene):
    root, _, _ = scene
    ds = MVSDataset(root, num_views=2, image_extension=".png")
    loader = BatchLoader(ds, batch_size=3, drop_last=True)
    assert len(loader) == 1
    assert len(list(loader)) == 1
