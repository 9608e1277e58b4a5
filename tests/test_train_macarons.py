"""Online MACARONS training smoke test: tiny cube scene, short trajectory."""

import json
import os

import jax
import numpy as np
import pytest

from macarons_tpu.config import Params
from macarons_tpu.data.mesh_io import Mesh, save_obj
from macarons_tpu.trainers import train_macarons as TM
from test_rasterizer import cube_mesh

TINY = dict(
    image_height=48, image_width=64, znear=0.5, zfar=20.0, n_depth=8,
    n_alpha=2, n_alpha_for_supervision=2, alphas=[-2, -1],
    n_interpolation_steps=2, n_proxy_points=1500, seq_len=64,
    n_gt_surface_points=1024, surface_cell_resolution=0.08,
    view_state_n_elev=7, view_state_n_azim=14, harmonic_degree=8,
    k_for_knn=8, n_cell_per_occ_forward_pass=4, occ_cell_batch=2,
    min_occ_for_proxy_points=0.01, use_occ_to_sample_proxy_points=True,
    use_sigmoid=True, sensor_range=25.0, gathering_factor=0.3,
    learning_rate=1e-4, epochs=1, n_poses_in_trajectory=3,
    online_learning=True, data_augmentation=False, random_seed=42,
    torch_seed=5, scene_scale_factor=1.0, macarons_model_name="test_mac",
    n_memory_loops=1, recompute_surface_every_n_loop=0,
    n_proxy_point_for_occupancy_supervision=200,
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    d = root / "cube_scene"
    d.mkdir()
    verts, faces = cube_mesh(1.0)
    colors = (np.asarray(verts) + 1) / 2
    save_obj(str(d / "mesh.obj"),
             Mesh(np.asarray(verts), np.asarray(faces), colors.astype(np.float32)))
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


def test_online_training_smoke(scene_dir, tmp_path):
    """One epoch, 3 NBV steps: everything runs, losses finite, coverage grows,
    checkpoints + memory written."""
    # Use the depth model at small scale; patch ManyDepth input size via params
    params = Params(dict(TINY, data_path=scene_dir))
    variables, train_losses = TM.run_training(
        params, weights_dir=str(tmp_path / "w"),
        memory_root=str(tmp_path / "mem"), verbose=False,
    )
    assert len(train_losses) == 1
    l = train_losses[0]
    assert np.isfinite(l["depth"]) and l["depth"] > 0
    assert np.isfinite(l["occ"]) and np.isfinite(l["cov"])
    # Checkpoints
    assert os.path.exists(tmp_path / "w" / "unvalidated_test_mac.msgpack")
    assert os.path.exists(tmp_path / "w" / "epoch_0_test_mac.msgpack")
    # Memory: frames for the trajectory (init 3 + 3 poses x 2 interp steps)
    fdir = tmp_path / "mem" / "cube_scene" / "macarons_memory" / "training" / "0"
    n_frames = len(list((fdir / "frames").glob("*.npz")))
    assert n_frames == 3 + 3 * 2
    # Scene snapshots saved for replay
    assert (fdir / "surface" / "scene.npz").exists()
    assert (fdir / "occupancy" / "field.npz").exists()
    assert (fdir / "poses" / "epoch_0.npz").exists()
