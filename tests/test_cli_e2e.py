"""End-to-end CLI tests on the synthetic scene: eval (depth + fusion) and a
one-epoch training run."""

import json
import os

import numpy as np
import pytest

from patchmatchnet_tpu.cli import main as cli_main
from patchmatchnet_tpu.dataio import read_map, read_ply
from tests.scene_utils import PLANE_Z, make_synthetic_scene

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "params_000007.msgpack")


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e_scene"))
    make_synthetic_scene(root, num_views=4, height=64, width=80)
    return root


@pytest.mark.slow
def test_eval_cli_end_to_end(scene):
    # slow: full-model eval compile + fusion (~minutes on this 1-core box)
    cli_main(
        [
            "eval",
            "--input_folder", scene,
            "--checkpoint_path", CKPT,
            "--num_views", "3",
            "--image_extension", ".png",
            "--geo_mask_thres", "2",
            "--geo_pixel_thres", "1.0",
            "--photo_thres", "0.3",
        ]
    )
    # depth maps written for all 4 views
    for v in range(4):
        d = read_map(os.path.join(scene, "depth_est", f"{v:08d}.pfm"))
        assert d.shape[:2] == (64, 80)
        c = read_map(os.path.join(scene, "confidence", f"{v:08d}.pfm"))
        assert c.shape[:2] == (64, 80)

    # the model should recover the plane reasonably well on this textured scene
    d0 = read_map(os.path.join(scene, "depth_est", "00000000.pfm"))[:, :, 0]
    inlier = np.abs(d0 - PLANE_Z) < 0.15 * PLANE_Z
    assert inlier.mean() > 0.6, f"depth too far off plane: {inlier.mean()}"

    # fused cloud exists and lies near the plane
    xyz, rgb = read_ply(os.path.join(scene, "fused.ply"))
    assert xyz.shape[0] > 100
    med = np.median(np.abs(xyz[:, 2] - PLANE_Z))
    assert med < 0.1 * PLANE_Z, f"fused cloud off plane: median |dz| = {med}"


@pytest.mark.slow
def test_eval_cli_module_input(scene, tmp_path):
    """cli eval --input_type module runs the exported StableHLO artifact
    (the reference's --input_type module TorchScript path, eval.py:22-39)."""
    from patchmatchnet_tpu.compat import export_inference, load_variables

    variables = load_variables(CKPT)
    # --num_views 3 selects 3 SOURCE views -> batches carry 4 images
    blob = export_inference(variables, batch=1, num_views=4, height=64, width=80)
    module_path = str(tmp_path / "module.stablehlo")
    with open(module_path, "wb") as f:
        f.write(blob)

    out = str(tmp_path / "module_out")
    cli_main(
        [
            "eval",
            "--input_folder", scene,
            "--output_folder", out,
            "--checkpoint_path", module_path,
            "--input_type", "module",
            "--output_type", "depth",
            "--num_views", "3",
            "--image_extension", ".png",
        ]
    )
    for v in range(4):
        d = read_map(os.path.join(out, "depth_est", f"{v:08d}.pfm"))
        assert d.shape[:2] == (64, 80)
    d0 = read_map(os.path.join(out, "depth_est", "00000000.pfm"))[:, :, 0]
    inlier = np.abs(d0 - PLANE_Z) < 0.15 * PLANE_Z
    assert inlier.mean() > 0.6


@pytest.mark.slow
def test_train_cli_one_epoch(scene, tmp_path):
    out = str(tmp_path / "train_out")
    scan_list = str(tmp_path / "scans.txt")
    with open(scan_list, "w") as f:
        f.write("\n")  # single unlisted scene == scan ''
    # single-scene training: scan_list file with one empty line won't parse;
    # use the dataset's unlisted-scene mode by passing a missing path.
    cli_main(
        [
            "train",
            "--input_folder", scene,
            "--output_folder", out,
            "--train_list", "__missing__",
            "--test_list", "__missing__",
            "--image_extension", ".png",
            "--num_views", "2",
            "--batch_size", "1",
            "--epochs", "1",
            "--summary_freq", "1",
            "--num_devices", "1",
        ]
    )
    assert os.path.isfile(os.path.join(out, "params_000000.ckpt.msgpack"))
    assert os.path.isfile(os.path.join(out, "module_000000.msgpack"))
    assert os.path.isfile(os.path.join(out, "config.json"))
    with open(os.path.join(out, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(r["mode"] == "train" and np.isfinite(r["loss"]) for r in records)
    assert any(r["mode"] == "full_test" for r in records)
