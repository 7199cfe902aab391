"""Native host-ops library tests (falls back gracefully when no toolchain)."""

import numpy as np
import pytest

from patchmatchnet_tpu import native
from patchmatchnet_tpu.dataio.image import resize_bilinear_np


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native hostops library unavailable")
    return lib


def test_version(lib):
    assert lib.hostops_version() == 1


def test_resize_matches_numpy(lib):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((37, 53, 3)).astype(np.float32)
    out = native.resize_bilinear(img, 20, 30)
    ref = resize_bilinear_np(img, 20, 30)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_2d(lib):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((16, 24)).astype(np.float32)
    out = native.resize_bilinear(img, 32, 48)
    ref = resize_bilinear_np(img, 32, 48)
    assert out.shape == (32, 48)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resize_batch(lib):
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((5, 24, 32, 3)).astype(np.float32)
    out = native.resize_bilinear_batch(imgs, 48, 64, num_threads=3)
    for i in range(5):
        np.testing.assert_allclose(
            out[i], resize_bilinear_np(imgs[i], 48, 64), atol=1e-5
        )


def test_u8_to_f32(lib):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
    out = native.u8_to_f32(img)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)
