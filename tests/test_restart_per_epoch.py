"""Restart-per-epoch training: each epoch in a fresh process draws the same
RNG streams as a single-process run (per-epoch derivation in run_training), so
a run split across processes produces the SAME losses. This is the pattern
that keeps every epoch on async dispatch through the tunneled TPU runtime
(ROADMAP CRITICAL fact 1: any d2h permanently degrades the process)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from macarons_tpu.config import Params
from macarons_tpu.data.mesh_io import Mesh, save_obj
from macarons_tpu.trainers import train_macarons as TM
from test_rasterizer import cube_mesh
from test_train_macarons import TINY

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("rpe_scenes")
    d = root / "cube_scene"
    d.mkdir()
    verts, faces = cube_mesh(1.0)
    colors = (np.asarray(verts) + 1) / 2
    save_obj(str(d / "mesh.obj"),
             Mesh(np.asarray(verts), np.asarray(faces),
                  colors.astype(np.float32)))
    settings = {
        "scene": {"x_min": [-1.3, -1.3, -1.3], "x_max": [1.3, 1.3, 1.3],
                  "grid_l": 3, "grid_w": 3, "grid_h": 3},
        "camera": {"x_min": [-4, -4, -4], "x_max": [4, 4, 4],
                   "pose_l": 4, "pose_w": 4, "pose_h": 4,
                   "pose_n_elev": 3, "pose_n_azim": 8,
                   "start_positions": []},
        "contrast_factor": 1.0,
    }
    (d / "settings.json").write_text(json.dumps(settings))
    return str(root)


def _tiny(scene_root, name):
    return dict(
        TINY, data_path=scene_root, epochs=2, n_poses_in_trajectory=2,
        n_memory_loops=1, n_memory_scene_loops=1, remap_at_pose=1,
        random_mirror_scenes=False, macarons_model_name=name,
    )


def test_split_run_equals_single_run(scene_root, tmp_path):
    """run_training with max_epochs_per_process=1, called twice (scratch then
    resume), reproduces a single 2-epoch run's losses exactly."""
    # A: one process, both epochs
    pa = Params(dict(_tiny(scene_root, "rpe_a")))
    _, losses_a = TM.run_training(
        pa, weights_dir=str(tmp_path / "wa"),
        memory_root=str(tmp_path / "ma"), verbose=False)
    assert len(losses_a) == 2

    # B: epoch 0 from scratch, epoch 1 resumed — fresh RNG both times, as a
    # restarted process would have
    pb0 = Params(dict(_tiny(scene_root, "rpe_b"), max_epochs_per_process=1))
    _, losses_b0 = TM.run_training(
        pb0, weights_dir=str(tmp_path / "wb"),
        memory_root=str(tmp_path / "mb"), verbose=False)
    assert len(losses_b0) == 1
    pb1 = Params(dict(_tiny(scene_root, "rpe_b"), max_epochs_per_process=1,
                      start_from_scratch=False))
    _, losses_b1 = TM.run_training(
        pb1, weights_dir=str(tmp_path / "wb"),
        memory_root=str(tmp_path / "mb"), verbose=False)
    assert len(losses_b1) == 2  # meta carries the full curve

    for k in ("depth", "occ", "cov"):
        np.testing.assert_allclose(
            [e[k] for e in losses_a], [e[k] for e in losses_b1],
            rtol=0, atol=1e-6, err_msg=k)


@pytest.mark.heavy
def test_cli_restart_per_epoch(scene_root, tmp_path):
    """train.py --restart-per-epoch drives the whole run through child
    processes and matches the plain single-process CLI run."""
    cfg = dict(_tiny(scene_root, "rpe_cli"))
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(
        os.environ, MACARONS_PLATFORM="cpu",
        MACARONS_CACHE_DIR=os.environ.get(
            "MACARONS_TEST_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "macarons_tpu_test_jax")),
    )

    def run(extra, wdir, mroot):
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "-c", str(cfg_path), "--weights-dir", str(wdir),
               "--memory-root", str(mroot)] + extra
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=3000)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    run([], tmp_path / "w_single", tmp_path / "m_single")
    run(["--restart-per-epoch"], tmp_path / "w_rpe", tmp_path / "m_rpe")

    with open(tmp_path / "w_single" / "losses_data_rpe_cli.json") as f:
        single = json.load(f)
    with open(tmp_path / "w_rpe" / "losses_data_rpe_cli.json") as f:
        rpe = json.load(f)
    assert len(single["train_losses"]) == 2
    assert len(rpe["train_losses"]) == 2
    for a, b in zip(single["train_losses"], rpe["train_losses"]):
        for k in ("depth", "occ", "cov"):
            np.testing.assert_allclose(a[k], b[k], rtol=0, atol=1e-6,
                                       err_msg=k)
