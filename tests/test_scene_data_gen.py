"""Scene data generation: settings heuristics + occupied-pose detection."""

import numpy as np
import pytest

from macarons_tpu.data.mesh_io import Mesh
from macarons_tpu.data.scenes import (
    compute_occupied_poses,
    compute_scene_settings,
)
from macarons_tpu.scene.camera import PoseSpace
from test_rasterizer import cube_mesh


def test_compute_scene_settings_dims():
    verts, _ = cube_mesh(2.0)
    s = compute_scene_settings(np.asarray(verts), cell_size=1.0, pose_step=2.0)
    assert s["scene"]["grid_l"] >= 4
    assert s["camera"]["pose_l"] >= 2
    assert len(s["camera"]["start_positions"]) == 0


@pytest.mark.slow  # compiles the backface-cull rasterizer (~5 s on CPU)
def test_occupied_poses_backface_cull():
    """Camera inside a closed mesh sees only backfaces -> culling empties the
    view -> occupied (reference generate_scene_data.py:246-285). Far-outside
    poses see front faces -> unchanged -> free."""
    verts, faces = cube_mesh(1.0)
    mesh = Mesh(np.asarray(verts), np.asarray(faces), None)
    ps = PoseSpace(np.array([-3.0, -3, -3]), np.array([3.0, 3, 3]),
                   3, 3, 3, 3, 8)
    out = compute_occupied_poses(mesh, ps, image_size=(32, 32))
    grid = {tuple(x): bool(o) for x, o in zip(out["X_idx"], out["occupied"])}
    assert grid[(1, 1, 1)] is True  # lattice center = inside the cube
    # All 8 lattice corners are far outside and see only front faces
    for i in (0, 2):
        for j in (0, 2):
            for k in (0, 2):
                assert grid[(i, j, k)] is False
    assert out["X_idx"].shape == (27, 3)
