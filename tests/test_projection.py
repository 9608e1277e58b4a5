import numpy as np
import jax.numpy as jnp

from macarons_tpu.ops import geometry as geo
from macarons_tpu.ops import projection as proj


def _camera(n=1, dist=4.0):
    R, T = geo.look_at_view_transform(
        dist=dist, elev=jnp.arange(n, dtype=jnp.float32) * 10.0,
        azim=jnp.arange(n, dtype=jnp.float32) * 30.0
    )
    return geo.FoVCamera.create(R, T, fov=60.0, znear=0.5, zfar=20.0)


def test_backproject_constant_depth_plane():
    H, W = 16, 24
    cam = _camera()
    depth = jnp.full((1, H, W, 1), 3.0)
    pts, mask = proj.project_depth_back_to_3D(depth, cam)
    assert pts.shape == (1, H * W, 3) and bool(mask.all())
    zb = proj.get_points_zbuf(pts, cam)
    np.testing.assert_allclose(np.asarray(zb), 3.0, atol=1e-4)


def test_backproject_then_project_hits_pixel_centers():
    H, W = 8, 12
    cam = _camera()
    depth = jnp.full((1, H, W, 1), 2.5)
    pts, _ = proj.project_depth_back_to_3D(depth, cam)
    ndc = cam.transform_points(pts)
    nx, ny = geo.ndc_pixel_grid(H, W)
    np.testing.assert_allclose(
        np.asarray(ndc)[0, :, 0], np.asarray(nx).reshape(-1), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ndc)[0, :, 1], np.asarray(ny).reshape(-1), atol=1e-4
    )


def test_fov_mask():
    H, W = 16, 16
    cam = _camera()
    C = cam.camera_center()[0]
    # Points: at origin (in fov), far behind camera, far to the side
    pts = jnp.stack([jnp.zeros(3), C + (C - 0.0) * 2.0, jnp.array([100.0, 0, 0])])
    mask = proj.points_in_fov_mask(pts[None], cam, H, W)
    np.testing.assert_array_equal(np.asarray(mask)[0], [True, False, False])
    # Range limit excludes the origin when fov_range < dist
    mask2 = proj.points_in_fov_mask(pts[None], cam, H, W, fov_range=1.0)
    assert not np.asarray(mask2)[0, 0]


def test_signed_distance_to_depth_map():
    H, W = 32, 32
    cam = _camera()
    depth_maps = jnp.full((1, H, W, 1), 3.0)
    mask = jnp.ones((1, H, W, 1), bool)
    C = np.asarray(cam.camera_center())[0]
    # Look direction: from camera toward origin
    d = -C / np.linalg.norm(C)
    pts = jnp.array(
        np.stack([C + d * 2.0, C + d * 3.0, C + d * 3.5]), jnp.float32
    )
    sd = np.asarray(
        proj.signed_distance_to_depth_maps(pts, depth_maps, mask, cam, zfar=20.0)
    )[0, :, 0]
    np.testing.assert_allclose(sd, [-1.0, 0.0, 0.5], atol=1e-3)
    # Masked-out depth -> treated as far plane (1.1 * zfar): point is in front
    sd2 = np.asarray(
        proj.signed_distance_to_depth_maps(
            pts, depth_maps, jnp.zeros((1, H, W, 1), bool), cam, zfar=20.0
        )
    )[0, :, 0]
    assert np.all(sd2 < 0)


def test_disparity_depth_roundtrip():
    depth = jnp.array([0.5, 1.0, 10.0, 100.0])
    disp = proj.depth_to_disparity(depth, 0.5, 100.0)
    back = proj.disparity_to_depth(disp, 0.5, 100.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(depth), rtol=1e-5)
