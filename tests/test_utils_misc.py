"""Coverage for metrics, config, logging, and the depth estimator wrapper."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from patchmatchnet_tpu.config import Config, ModelConfig
from patchmatchnet_tpu.utils import DictAverageMeter, absolute_depth_error, threshold_error
from patchmatchnet_tpu.utils.logging import MetricsLogger
from patchmatchnet_tpu.utils.profiling import PhaseTimer


def test_metrics_match_reference_semantics():
    """Per-image masked mean, then batch mean (reference: utils.py:172-221)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    est = rng.random((3, 8, 10)).astype(np.float32) * 10
    gt = rng.random((3, 8, 10)).astype(np.float32) * 10
    mask = rng.random((3, 8, 10)) > 0.3

    ours_abs = float(absolute_depth_error(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask)))
    ours_thr = float(threshold_error(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask), 2.0))

    # reference formulation in torch
    te, tg, tm = torch.from_numpy(est), torch.from_numpy(gt), torch.from_numpy(mask)
    ref_abs = torch.stack(
        [(te[i][tm[i]] - tg[i][tm[i]]).abs().mean() for i in range(3)]
    ).mean()
    ref_thr = torch.stack(
        [((te[i][tm[i]] - tg[i][tm[i]]).abs() > 2.0).float().mean() for i in range(3)]
    ).mean()
    assert ours_abs == pytest.approx(float(ref_abs), rel=1e-5)
    assert ours_thr == pytest.approx(float(ref_thr), rel=1e-5)


def test_dict_average_meter():
    m = DictAverageMeter()
    m.update({"a": 1.0, "b": 2.0})
    m.update({"a": 3.0, "b": 4.0})
    assert m.mean() == {"a": 2.0, "b": 3.0}


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.model.patchmatch_iteration = (2, 3, 4)
    cfg.data.num_views = 7
    cfg.train.learning_rate = 5e-4
    cfg.fuse.photo_thres = 0.9
    path = str(tmp_path / "config.json")
    cfg.save(path)
    loaded = Config.load(path)
    assert loaded.model.patchmatch_iteration == (2, 3, 4)
    assert loaded.data.num_views == 7
    assert loaded.train.learning_rate == 5e-4
    assert loaded.fuse.photo_thres == 0.9


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.scalars("train", {"loss": 1.5, "err": 0.25}, step=3)
    logger.scalars("test", {"loss": 1.0}, step=4)
    logger.close()
    with open(tmp_path / "metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    assert records[0]["mode"] == "train" and records[0]["loss"] == 1.5
    assert records[1]["step"] == 4


def test_phase_timer():
    t = PhaseTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.count["a"] == 2 and t.count["b"] == 1
    d = t.as_dict()
    assert "time-a-mean-ms" in d
    assert "a:" in t.summary()


def test_depth_estimator_orig_resolution(tmp_path):
    """DepthEstimator must restore non-multiple-of-8 original dims."""
    from patchmatchnet_tpu.compat import load_variables
    from patchmatchnet_tpu.data import adjust_sample_dims
    from patchmatchnet_tpu.infer import DepthEstimator

    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "params_000007.msgpack")
    estimator = DepthEstimator(load_variables(ckpt))

    rng = np.random.default_rng(0)
    n, h, w = 2, 30, 44  # not multiples of 8 -> adjusted to 32x48 internally
    k = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    extr[1, 0, 3] = 0.4
    sample = {
        "images": rng.random((n, h, w, 3)).astype(np.float32),
        "intrinsics": np.broadcast_to(k, (n, 3, 3)).copy(),
        "extrinsics": extr,
        "depth_min": np.float32(2.0),
        "depth_max": np.float32(10.0),
    }
    adjusted = adjust_sample_dims(sample)
    batch = {key: np.asarray(v)[None] if not isinstance(v, str) else [v]
             for key, v in adjusted.items()}
    batch["orig_height"] = np.asarray([adjusted["orig_height"]])
    batch["orig_width"] = np.asarray([adjusted["orig_width"]])
    depth, conf = estimator(batch, jax.random.PRNGKey(0))
    assert depth.shape == (1, h, w)
    assert conf.shape == (1, h, w)
    assert np.isfinite(depth).all()
    assert (depth >= 1.0).all() and (depth <= 11.0).all()
