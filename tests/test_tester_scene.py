"""Scene exploration tester: true coverage grows over a short trajectory."""

import json
import os

import numpy as np
import pytest

from macarons_tpu.config import Params
from macarons_tpu.testers import scene as tester
from test_train_macarons import TINY, scene_dir  # noqa: F401


def test_scene_exploration(scene_dir, tmp_path):  # noqa: F811
    params = Params(dict(TINY, data_path=scene_dir, test_resolution=0.04,
                         n_poses_in_trajectory=3))
    results = tester.run_test(
        params, results_dir=str(tmp_path), results_name="res.json",
        n_start_poses=1, n_poses=3, memory_root=str(tmp_path / "mem"),
        verbose=False,
    )
    assert "cube_scene" in results
    traj = results["cube_scene"]["0"]
    cov = np.array(traj["coverage"])
    assert len(cov) == 4  # initial + 3 NBV poses
    assert np.all(np.isfinite(cov)) and np.all((cov >= 0) & (cov <= 1))
    # TRUE coverage is monotone (covered_scene only accumulates)
    assert np.all(np.diff(cov) >= -1e-6)
    assert cov[-1] > cov[0] * 0.99 and cov[-1] > 0.1
    # Camera history recorded
    assert len(traj["X_cam"]) >= 4
    # Results JSON matches the reference's nesting
    loaded = json.load(open(tmp_path / "res.json"))
    assert loaded["cube_scene"]["0"]["coverage"] == traj["coverage"]
