"""Blender-export / plotting helpers (reference testers/scene.py:18-60,
render_utils.py:11-60)."""

import json

import numpy as np

from macarons_tpu.utils import export as E


def test_blender_vector_roundtrip():
    v = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    b = E.convert_vector_to_blender(v)
    np.testing.assert_allclose(E.convert_blender_to_vector(b), v, atol=1e-6)
    # Axis semantics: (x, y, z) -> (x, -z, y)
    np.testing.assert_allclose(b[:, 0], v[:, 0])
    np.testing.assert_allclose(b[:, 1], -v[:, 2])
    np.testing.assert_allclose(b[:, 2], v[:, 1])


def test_look_at_points_match_camera_rays():
    """create_points_to_look_at reproduces get_camera_RT's view ray."""
    import jax.numpy as jnp

    from macarons_tpu.ops.geometry import FoVCamera
    from macarons_tpu.scene.camera import get_camera_RT

    X = np.array([[1.0, 2.0, 3.0]], np.float32)
    V = np.array([[25.0, 140.0]], np.float32)
    look = E.create_points_to_look_at(X, V, camera_size=2.0)
    R, T = get_camera_RT(jnp.asarray(X), jnp.asarray(V))
    cam = FoVCamera.create(R, T, zfar=10.0)
    # The look-at point lies ahead of the camera along +z in view space
    lv = np.asarray(cam.world_to_view(jnp.asarray(look)[None]))[0, 0]
    np.testing.assert_allclose(lv[:2], 0.0, atol=1e-4)
    np.testing.assert_allclose(lv[2], 2.0, atol=1e-4)


def test_blender_curves_and_export(tmp_path):
    rs = np.random.default_rng(1)
    X = rs.normal(size=(12, 3)).astype(np.float32)
    V = rs.uniform(-60, 60, size=(12, 2)).astype(np.float32)
    cx, cl = E.create_blender_curves(X, V, n_interpolation_steps=4,
                                     scene_scale_factor=2.0, jump_poses=2)
    assert len(cx) == len(cl) == 4  # poses 4, 6, 8, 10
    p = E.export_trajectory_blender(str(tmp_path / "traj.json"), X, V, 4, 2.0)
    d = json.load(open(p))
    assert "camera_X" in d and "camera_look" in d


def test_ply_export(tmp_path):
    pts = np.random.default_rng(2).normal(size=(50, 3)).astype(np.float32)
    colors = np.random.default_rng(3).uniform(size=(50, 3)).astype(np.float32)
    valid = np.arange(50) < 30
    p = E.export_point_cloud_ply(str(tmp_path / "pc.ply"), pts, colors, valid)
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 30" in lines[2]
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == 30
    assert len(body[0].split()) == 6  # xyz + rgb
