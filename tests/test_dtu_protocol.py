"""DTU protocol port tests on synthetic geometry with known answers."""

import numpy as np
import pytest

from patchmatchnet_tpu.eval_protocols import (
    evaluate_scan,
    point_cloud_distances,
    reduce_points,
)


def test_reduce_points_min_distance():
    rng = np.random.default_rng(0)
    pts = rng.random((5000, 3)) * 10
    reduced = reduce_points(pts, dst=0.5, seed=1)
    assert reduced.shape[0] < pts.shape[0]
    from scipy.spatial import cKDTree

    tree = cKDTree(reduced)
    d, _ = tree.query(reduced, k=2)
    assert d[:, 1].min() >= 0.5 - 1e-9


def test_point_cloud_distances_exact():
    a = np.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]])
    b = np.array([[0.1, 0, 0], [5, 0, 0]])
    d = point_cloud_distances(a, b, max_dist=60.0)
    np.testing.assert_allclose(d, [0.1, 3.0], atol=1e-12)
    # cap applies
    d2 = point_cloud_distances(a, np.array([[100.0, 0, 0]]), max_dist=60.0)
    assert d2[0] == 60.0


def test_evaluate_scan_known_offset():
    """Reconstruction = GT plane shifted by 0.3 mm in z -> acc == comp == 0.3."""
    rng = np.random.default_rng(2)
    # GT 'stl' points: dense plane z=0 patch 100x100 mm, already reduced
    xs, ys = np.meshgrid(np.arange(0, 100, 0.5), np.arange(0, 100, 0.5))
    stl = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], axis=1)

    data = stl.copy()
    data[:, 2] += 0.3  # constant offset

    bb = np.array([[-5.0, -5.0, -5.0], [105.0, 105.0, 5.0]])
    res = 1.0
    shape = np.ceil((bb[1] - bb[0]) / res).astype(int) + 2
    obs_mask = np.ones(shape, dtype=bool)
    plane = np.array([0.0, 0.0, 1.0, 1.0])  # z > -1 keeps all stl points

    m = evaluate_scan(data, stl, obs_mask, bb, res, plane, dst=0.2)
    assert m["acc_mean"] == pytest.approx(0.3, abs=1e-6)
    assert m["comp_mean"] == pytest.approx(0.3, abs=1e-6)


def test_evaluate_scan_mask_and_plane_filters():
    """Points outside the mask / below the plane are excluded from stats."""
    xs, ys = np.meshgrid(np.arange(0, 50, 1.0), np.arange(0, 50, 1.0))
    stl = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], axis=1)

    data = stl.copy()
    data[:, 2] += 0.5
    # some data points far outside the mask bounding box
    outliers = np.array([[500.0, 500, 500], [600, 600, 600]])
    data_all = np.concatenate([data, outliers])

    bb = np.array([[-5.0, -5.0, -15.0], [55.0, 55.0, 5.0]])
    res = 1.0
    shape = np.ceil((bb[1] - bb[0]) / res).astype(int) + 2
    obs_mask = np.ones(shape, dtype=bool)
    # ground plane keeps only stl points with y > 25 for completeness
    plane = np.array([0.0, 1.0, 0.0, -25.0])

    m = evaluate_scan(data_all, stl, obs_mask, bb, res, plane, dst=0.2)
    # outliers fell outside the mask -> accuracy still 0.5
    assert m["acc_mean"] == pytest.approx(0.5, abs=1e-6)
    # completeness only counts the above-plane rows (y in 26..49)
    assert m["n_stl"] == 24 * 50
    assert m["comp_mean"] == pytest.approx(0.5, abs=1e-6)
