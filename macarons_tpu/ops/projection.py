"""Depth-map <-> 3D projection kernels (fixed-shape, masked).

Replaces the reference's depth backprojection and signed-distance carving
primitives (utils.py:1458-1487, macarons_utils.py:2339-2360, 2400-2435,
2451-2500). Boolean filtering becomes validity masks; everything is batched and
jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import FoVCamera, ndc_pixel_grid, ndc_bounds
from .grid_sample import sample_points_bilinear


def project_depth_back_to_3D(depth, cameras: FoVCamera):
    """Backproject depth maps to world points.

    depth: (n_cam, H, W, 1) view-space z (zbuf; invalid pixels < 0).
    Returns (points (n_cam, H*W, 3), mask (n_cam, H*W)) — fixed shape; the
    reference's boolean filter (utils.py:1484-1486) becomes the mask.
    """
    n_cam, H, W = depth.shape[0], depth.shape[1], depth.shape[2]
    ndc_x, ndc_y = ndc_pixel_grid(H, W, dtype=depth.dtype)
    flat = depth.reshape(n_cam, H * W)
    ndc_points = jnp.stack(
        (
            jnp.broadcast_to(ndc_x.reshape(1, -1), (n_cam, H * W)),
            jnp.broadcast_to(ndc_y.reshape(1, -1), (n_cam, H * W)),
            flat,
        ),
        axis=-1,
    )
    pts = cameras.unproject_ndc_depth(ndc_points)
    mask = flat > -1
    return pts, mask


def points_in_fov_mask(pts, camera: FoVCamera, height: int, width: int,
                       fov_range=None, camera_center=None):
    """Frustum mask for pts (..., N, 3) (reference macarons_utils.py:2400-2435).

    In-FoV = NDC within the pixel-grid bounds AND view-space z > 0, optionally
    AND range < fov_range from the camera center.
    """
    min_x, max_x, min_y, max_y = ndc_bounds(height, width)
    ndc = camera.transform_points(pts)
    view = camera.world_to_view(pts)
    mask = (
        (ndc[..., 0] >= min_x)
        & (ndc[..., 0] <= max_x)
        & (ndc[..., 1] >= min_y)
        & (ndc[..., 1] <= max_y)
        & (view[..., 2] > 0.0)
    )
    if fov_range is not None:
        if camera_center is None:
            camera_center = camera.camera_center()
        d = jnp.linalg.norm(pts - camera_center[..., None, :], axis=-1)
        mask = mask & (d < fov_range)
    return mask


def ndc_to_grid_coords(ndc_xy, height: int, width: int):
    """PyTorch3D NDC xy -> grid_sample coords in [-1, 1].

    Matches reference macarons_utils.py:2487-2492: factor = -min(H, W);
    gx = factor/W * x_ndc, gy = factor/H * y_ndc (sign flip because PT3D NDC has
    +X left / +Y up while grid coords have +x right / +y down).
    """
    factor = -float(min(height, width))
    gx = factor / width * ndc_xy[..., 0]
    gy = factor / height * ndc_xy[..., 1]
    return jnp.stack((gx, gy), axis=-1)


def get_points_zbuf(pts, camera: FoVCamera):
    """View-space z of pts under camera (reference macarons_utils.py:2437-2449)."""
    return camera.world_to_view(pts)[..., 2:]


def signed_distance_to_depth_maps(pts, depth_maps, mask, camera: FoVCamera,
                                  zfar):
    """Signed distance of points to the surfaces given by depth maps.

    Positive = point is behind the depth map (occluded region), negative = in
    front (carved free space). Matches reference macarons_utils.py:2451-2500:
    masked-out pixels are treated as depth 1.1*zfar, the depth map is bilinearly
    sampled (border padding) at each point's projection.

    pts (n_pts, 3) or (n_cam, n_pts, 3); depth_maps (n_cam, H, W, 1);
    mask (n_cam, H, W, 1) bool. Returns (n_cam, n_pts, 1).
    """
    n_cam, H, W = depth_maps.shape[0], depth_maps.shape[1], depth_maps.shape[2]
    if pts.ndim == 2:
        pts = jnp.broadcast_to(pts[None], (n_cam, *pts.shape))

    pts_zbuf = get_points_zbuf(pts, camera)  # (n_cam, n_pts, 1)

    depths = jnp.where(mask, depth_maps, 1.1 * zfar)
    ndc = camera.transform_points(pts)
    grid_xy = ndc_to_grid_coords(ndc[..., :2], H, W)
    map_zbuf = sample_points_bilinear(depths, grid_xy, padding_mode="border")
    return pts_zbuf - map_zbuf


def disparity_to_depth(disp, znear, zfar):
    """disp in (0,1) -> depth via 1/(a*disp + b), a = 1/znear - 1/zfar, b = 1/zfar.

    (reference depth_model_utils.py:844-855)
    """
    a = 1.0 / znear - 1.0 / zfar
    b = 1.0 / zfar
    return 1.0 / (a * disp + b)


def depth_to_disparity(depth, znear, zfar):
    a = 1.0 / znear - 1.0 / zfar
    b = 1.0 / zfar
    return (1.0 / depth - b) / a
