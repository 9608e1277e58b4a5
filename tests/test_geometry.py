"""Tests for camera/coordinate geometry: roundtrips, conventions, torch cross-check."""

import numpy as np
import jax.numpy as jnp

from macarons_tpu.ops import geometry as geo


def test_spherical_cartesian_roundtrip(rng):
    r = rng.uniform(0.5, 10.0, (100,))
    elev = rng.uniform(-1.5, 1.5, (100,))
    azim = rng.uniform(-np.pi + 0.01, np.pi - 0.01, (100,))
    X = geo.get_cartesian_coords(jnp.array(r), jnp.array(elev), jnp.array(azim))
    r2, e2, a2 = geo.get_spherical_coords(X)
    np.testing.assert_allclose(np.asarray(r2), r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), elev, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), azim, atol=2e-3)  # f32 acos precision


def test_spherical_coords_edge_cases():
    # On-axis points must not produce NaN (reference clamps explicitly).
    X = jnp.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0],
                   [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    r, elev, azim = geo.get_spherical_coords(X)
    assert np.all(np.isfinite(np.asarray(elev)))
    assert np.all(np.isfinite(np.asarray(azim)))
    np.testing.assert_allclose(np.asarray(elev)[:2], [np.pi / 2, -np.pi / 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(azim)[2:], [0.0, np.pi, np.pi / 2], atol=1e-6)


def test_look_at_places_at_on_axis():
    # The look-at target must project onto the +z view axis.
    R, T = geo.look_at_view_transform(dist=3.0, elev=30.0, azim=45.0)
    cam = geo.FoVCamera.create(R, T)
    at_view = cam.world_to_view(jnp.zeros((1, 1, 3)))
    np.testing.assert_allclose(np.asarray(at_view)[0, 0], [0, 0, 3.0], atol=1e-5)
    # Camera center maps to origin of view space
    C = cam.camera_center()
    c_view = cam.world_to_view(C[:, None, :])
    np.testing.assert_allclose(np.asarray(c_view), 0.0, atol=1e-5)


def test_camera_position_convention():
    # azim=0, elev=0 -> camera at (0, 0, dist) looking at origin (PT3D convention).
    R, T = geo.look_at_view_transform(dist=2.0, elev=0.0, azim=0.0)
    C = geo.camera_center_from_RT(R, T)
    np.testing.assert_allclose(np.asarray(C)[..., :], [[0.0, 0.0, 2.0]], atol=1e-6)
    # elev=90 -> camera at (0, dist, 0).
    R, T = geo.look_at_view_transform(dist=2.0, elev=90.0, azim=0.0)
    C = geo.camera_center_from_RT(R, T)
    np.testing.assert_allclose(np.asarray(C), [[0.0, 2.0, 0.0]], atol=1e-6)


def test_project_unproject_roundtrip(rng):
    R, T = geo.look_at_view_transform(dist=4.0, elev=20.0, azim=-60.0)
    cam = geo.FoVCamera.create(R, T, fov=60.0, znear=0.5, zfar=50.0, aspect_ratio=1.5)
    pts = jnp.array(rng.uniform(-1, 1, (1, 64, 3)), jnp.float32)
    view = cam.world_to_view(pts)
    ndc = cam.project_view(view)
    # unproject with true view-space depth
    ndc_depth = jnp.concatenate((ndc[..., :2], view[..., 2:]), axis=-1)
    back = cam.unproject_ndc_depth(ndc_depth)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_zndc_range():
    R, T = geo.look_at_view_transform(dist=4.0, elev=0.0, azim=0.0)
    cam = geo.FoVCamera.create(R, T, znear=1.0, zfar=10.0)
    # Points at z_view = znear -> z_ndc 0; z_view = zfar -> z_ndc 1.
    pts_view = jnp.array([[[0.0, 0.0, 1.0], [0.0, 0.0, 10.0]]])
    ndc = cam.project_view(pts_view)
    np.testing.assert_allclose(np.asarray(ndc)[0, :, 2], [0.0, 1.0], atol=1e-6)


def test_ndc_pixel_grid_matches_reference_formula():
    H, W = 256, 456
    ndc_x, ndc_y = geo.ndc_pixel_grid(H, W)
    s = min(H, W)
    # Reference macarons_utils.py:1928-1938
    assert np.isclose(float(ndc_x[0, 0]), W / s)
    assert np.isclose(float(ndc_x[0, -1]), W / s - 2 * (W - 1) / (s - 1))
    assert np.isclose(float(ndc_y[0, 0]), H / s)
    assert np.isclose(float(ndc_y[-1, 0]), H / s - 2 * (H - 1) / (s - 1))
    min_x, max_x, min_y, max_y = geo.ndc_bounds(H, W)
    assert np.isclose(min_x, float(ndc_x[-1, -1])) and np.isclose(max_x, float(ndc_x[0, 0]))
    assert np.isclose(min_y, float(ndc_y[-1, -1])) and np.isclose(max_y, float(ndc_y[0, 0]))


def test_rotation_algebra_roundtrip(rng):
    aa = jnp.array(rng.normal(size=(32, 3)) * 1.5, jnp.float32)
    R = geo.matrix_from_axis_angle(aa)
    # Valid rotations
    eye = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    aa2 = geo.axis_angle_from_matrix(R)
    R2 = geo.matrix_from_axis_angle(aa2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_quaternion_matrix_roundtrip(rng):
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = geo.matrix_from_quaternion(jnp.array(q, jnp.float32))
    q2 = np.asarray(geo.quaternion_from_matrix(R))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_relative_and_compose_pose(rng):
    R_a, T_a = geo.look_at_view_transform(dist=3.0, elev=10.0, azim=20.0)
    R_b, T_b = geo.look_at_view_transform(dist=5.0, elev=-30.0, azim=100.0)
    R_rel, T_rel = geo.relative_pose(R_a, T_a, R_b, T_b)
    pts = jnp.array(rng.uniform(-1, 1, (1, 16, 3)), jnp.float32)
    cam_a = geo.FoVCamera.create(R_a, T_a)
    cam_b = geo.FoVCamera.create(R_b, T_b)
    va = cam_a.world_to_view(pts)
    vb = cam_b.world_to_view(pts)
    vb2 = jnp.einsum("...nj,...ji->...ni", va, R_rel) + T_rel[..., None, :]
    np.testing.assert_allclose(np.asarray(vb2), np.asarray(vb), atol=1e-4)
    # compose: A->B then B->(world->B composed) consistency
    R_ab, T_ab = geo.compose_pose(R_a, T_a, R_rel, T_rel)
    np.testing.assert_allclose(np.asarray(R_ab), np.asarray(R_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T_ab), np.asarray(T_b), atol=1e-4)


def test_sample_cameras_on_sphere():
    X = geo.sample_cameras_on_sphere(25, 2.0)
    assert X.shape == (25, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(X), axis=-1), 2.0, rtol=1e-5)
