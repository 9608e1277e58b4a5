"""Standalone depth pretrainer on synthetic saved frames."""

import numpy as np
import pytest

from macarons_tpu.config import Params
from macarons_tpu.trainers import pretrain_depth as PD

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rs = np.random.default_rng(0)
    H, W = 32, 48
    R = np.eye(3, dtype=np.float32)[None]
    for n in range(8):
        T = np.array([[0.1 * n, 0.0, 3.0]], np.float32)
        np.savez(d / f"{n}.npz",
                 rgb=rs.random((1, H, W, 3)).astype(np.float32),
                 zbuf=np.full((1, H, W, 1), 2.0, np.float32),
                 mask=np.ones((1, H, W, 1), bool),
                 R=R, T=T, zfar=np.float32(20.0))
    return str(d)


def test_standalone_depth_training(frames_dir, tmp_path):
    params = Params({
        "image_height": 32, "image_width": 48, "znear": 0.5, "zfar": 20.0,
        "n_depth": 4, "n_alpha": 2, "alphas": [-2, -1], "batch_size": 2,
        "epochs": 2, "learning_rate": 1e-4, "data_augmentation": False,
        "depth_model_name": "test_depth",
    })
    variables, losses = PD.run_training(
        params, frames_dirs=[frames_dir], weights_dir=str(tmp_path / "w"),
        verbose=False)
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    assert (tmp_path / "w" / "unvalidated_test_depth.msgpack").exists()

    # Resume continues the loss history
    params.update({"start_from_scratch": False, "epochs": 3})
    _, losses2 = PD.run_training(
        params, frames_dirs=[frames_dir], weights_dir=str(tmp_path / "w"),
        verbose=False)
    assert len(losses2) == 3
    assert np.isclose(losses2[0], losses[0])
