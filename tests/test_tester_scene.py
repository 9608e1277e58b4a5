"""Scene exploration tester: true coverage grows over a short trajectory."""

import json
import os

import numpy as np
import pytest

from macarons_tpu.config import Params
from macarons_tpu.testers import scene as tester
from test_train_macarons import TINY, scene_dir  # noqa: F401

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


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


def test_reference_test_config_schema(scene_dir, tmp_path):  # noqa: F811
    """A test config in the REFERENCE's schema (configs/test/*.json keys:
    params_name/model_name/results_json_name/compute_collision/numGPU/
    load_json, reference testers/scene.py:621-652) runs unmodified."""
    from macarons_tpu.config import normalize_test_config

    base = tmp_path / "app"
    cfg_dir = base / "configs" / "macarons"
    cfg_dir.mkdir(parents=True)
    Params(dict(TINY)).save(str(cfg_dir / "macarons_default_training_config.json"))

    ref_cfg = Params(dict(
        numGPU=0,
        dataset_path=scene_dir,
        test_scenes=["cube_scene", "missing_scene"],
        params_name="macarons_default_training_config.json",
        model_name="trained_macarons.pth",
        results_json_name="test_results_in_default_scenes.json",
        test_resolution=0.04,
        use_perfect_depth_map=False,
        compute_collision=False,
        load_json=False,
        random_seed=8,
        torch_seed=9,
    ))
    params = normalize_test_config(ref_cfg, str(base))
    assert params.training_config.endswith(
        "macarons_default_training_config.json")
    assert params.weights_path == os.path.join(
        "weights", "macarons", "trained_macarons")
    assert params.results_name == "test_results_in_default_scenes.json"
    assert params.use_collision is False
    assert params.use_perfect_depth is False
    assert params.memory_dir_name == "test_memory_0"

    # Inherit the training config exactly like test_scenes.py main()
    from macarons_tpu.config import load_params
    train_params = load_params(
        str(cfg_dir / "macarons_default_training_config.json"))
    train_params.update(params.to_dict())
    params = train_params

    results = tester.run_test(
        params, results_dir=str(tmp_path / "res"),
        results_name=params.get("results_name"),
        n_start_poses=1, n_poses=2,
        memory_root=str(tmp_path / "mem"),
        load_json=bool(params.get("load_json", False)),
        verbose=False,
    )
    # the missing scene is skipped with a warning; the real one ran
    assert list(results.keys()) == ["cube_scene"]
    out = tmp_path / "res" / "test_results_in_default_scenes.json"
    assert out.exists()

    # load_json=True merges with the existing file
    prior = json.load(open(out))
    prior["phantom_scene"] = {"0": {"coverage": [0.5]}}
    json.dump(prior, open(out, "w"))
    results2 = tester.run_test(
        params, results_dir=str(tmp_path / "res"),
        results_name=params.get("results_name"),
        n_start_poses=1, n_poses=2,
        memory_root=str(tmp_path / "mem2"),
        load_json=True, verbose=False,
    )
    merged = json.load(open(out))
    assert "phantom_scene" in merged and "cube_scene" in merged
