"""ShapeNet GT generation — surface points, partial point clouds, coverage
matrices, and space-carved occupancy fields per mesh.

TPU-native rebuild of reference data/ShapeNetCore.v1/generate_shapenet_data.py:26-255:
- GT surface: area-weighted sampling on the mesh (reference :127);
- per-candidate partial clouds: perspective rasterization -> zbuf backprojection
  (reference :139-151), fixed-shape padded to part_pc_length with masks;
- coverage matrices: thresholded nearest-distance from GT surface to each
  partial cloud (reference :153-159), chunked so the distance matrix never
  materializes at full size;
- occupancy field: 6-view orthographic space carving of uniform + near-surface
  samples, balanced and topped up with surface points at occ=1
  (reference :163-225).

Artifacts are saved as .npz with the reference's dict keys; the dataset loader
accepts both .npz and the reference's .pt files.
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import FoVCamera, OrthoCamera, look_at_view_transform
from ..ops.grid_sample import sample_points_bilinear
from ..ops.knn import pairwise_sqdist
from ..ops.projection import project_depth_back_to_3D
from ..ops.rasterizer import rasterize
from ..ops.sampling import (
    random_subsample_mask,
    sample_points_on_mesh_surface,
    sample_X_in_box,
)
from ..ops.view_state import get_cameras_on_sphere


def adjust_mesh_diagonally(verts, diag_range: float = 1.0):
    """Center and scale verts so the bbox diagonal is diag_range
    (reference utils.py:633-648)."""
    min_c = jnp.min(verts, axis=0)
    max_c = jnp.max(verts, axis=0)
    diag = jnp.linalg.norm(max_c - min_c)
    center = (min_c + max_c) / 2.0
    return (verts - center) * diag_range / diag


def compute_surface_epsilon(X_surf, quantile: float = 0.9, chunk: int = 2048):
    """Quantile of nearest-neighbor distances (reference utils.py:873-880), chunked."""
    n = X_surf.shape[0]
    chunk = min(chunk, n)

    def body(i, acc):
        sl = jax.lax.dynamic_slice_in_dim(X_surf, i * chunk, chunk, axis=0)
        d2 = pairwise_sqdist(sl, X_surf)
        d2 = jnp.where(d2 <= 0.0, 1e6, d2)
        return acc.at[i].set(jnp.sqrt(jnp.min(d2, axis=-1)))

    n_chunks = n // chunk
    mins = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((n_chunks, chunk), X_surf.dtype)
    ).reshape(-1)
    if n % chunk:
        tail = X_surf[n_chunks * chunk :]
        d2 = pairwise_sqdist(tail, X_surf)
        d2 = jnp.where(d2 <= 0.0, 1e6, d2)
        mins = jnp.concatenate([mins, jnp.sqrt(jnp.min(d2, axis=-1))])
    return jnp.quantile(mins, quantile)


def min_dist_to_cloud(queries, cloud, cloud_mask=None, chunk: int = 2048,
                      big: float = 1e6):
    """Min Euclidean distance from each query to a (masked) cloud, chunked."""
    n = queries.shape[0]
    pad = (-n) % chunk
    q = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)]) if pad else queries

    def body(carry, sl):
        d2 = pairwise_sqdist(sl, cloud)
        if cloud_mask is not None:
            d2 = jnp.where(cloud_mask[None, :], d2, big)
        return carry, jnp.sqrt(jnp.min(d2, axis=-1))

    _, out = jax.lax.scan(body, None, q.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


class ShapeNetGTConfig(NamedTuple):
    """Knobs mirroring generate_shapenet_data_config.json."""

    surface_resolution: float = 1.5
    n_points_surface: int = 16384
    part_pc_length: int = 2048
    surface_epsilon_is_constant: bool = True
    surface_epsilon: float = 0.00707
    epsilon_quantile: float = 0.9
    sampling_diagonal_range: float = 1.0
    sampling_ratio: float = 0.5
    sampling_noise_std: float = 0.036736797628535885
    n_samples_for_occupancy: int = 300000
    n_max_samples: int = 600000
    image_size: int = 512
    n_ortho_camera: int = 6
    ortho_camera_dist: float = 1.5
    camera_dist: float = 1.5
    pole_cameras: bool = True
    n_camera_elev: int = 5
    n_camera_azim: int = 10
    raster_chunk: int = 256


def candidate_cameras(cfg: ShapeNetGTConfig):
    """The 52 candidate FoV cameras on the sphere (reference :70-77)."""
    X_cam, dist, elev, azim = get_cameras_on_sphere(
        cfg.n_camera_elev, cfg.n_camera_azim, cfg.camera_dist,
        pole_cameras=cfg.pole_cameras,
    )
    R, T = look_at_view_transform(dist=dist, elev=elev, azim=azim)
    return X_cam, FoVCamera.create(R, T, fov=60.0, znear=0.01, zfar=10.0)


def ortho_cameras(cfg: ShapeNetGTConfig):
    """The 6 axis-aligned orthographic carving cameras (config ortho_* lists)."""
    elev = jnp.array([0.0, 0.0, 0.0, 0.0, 90.0, -90.0])
    azim = jnp.array([0.0, 90.0, 180.0, 270.0, 0.0, 0.0])
    dist = jnp.full_like(elev, cfg.ortho_camera_dist)
    R, T = look_at_view_transform(dist=dist, elev=elev, azim=azim)
    return OrthoCamera.create(R, T, znear=0.01, zfar=10.0)


def compute_partial_point_clouds(key, verts, faces, cameras: FoVCamera,
                                 cfg: ShapeNetGTConfig, image_size=None):
    """Per-camera partial clouds (padded) + validity masks.

    verts must already be diag-1 normalized (dataset convention); rasterization
    happens at surface_resolution scale and is mapped back (reference :139-151).
    Returns (part_pc (C, L, 3), part_mask (C, L)).
    """
    if image_size is None:
        image_size = (cfg.image_size, cfg.image_size)
    surf_verts = adjust_mesh_diagonally(verts, cfg.surface_resolution)
    frags = rasterize(surf_verts, faces, cameras, image_size,
                      chunk=cfg.raster_chunk, perspective_correct=True)
    pts, mask = project_depth_back_to_3D(frags.zbuf[..., None], cameras)
    pts = pts / cfg.surface_resolution

    n_cam = pts.shape[0]
    keys = jax.random.split(key, n_cam)
    out_pts, out_mask = [], []
    for c in range(n_cam):
        idx, valid = random_subsample_mask(keys[c], mask[c], cfg.part_pc_length)
        out_pts.append(pts[c][idx])
        out_mask.append(valid)
    return jnp.stack(out_pts), jnp.stack(out_mask)


def compute_coverage_matrix(gt_surface, part_pc, part_mask, key,
                            cfg: ShapeNetGTConfig):
    """Per-camera binary coverage of each GT surface point (reference :153-159).

    The reference subsamples 2*n_points_surface from the (large) backprojected
    surface; our partial clouds are already capped at part_pc_length, so the
    distance goes against the full padded cloud with its mask.
    Returns (C, n_points_surface) float 0/1.
    """
    eps = (
        cfg.surface_epsilon
        if cfg.surface_epsilon_is_constant
        else compute_surface_epsilon(gt_surface, cfg.epsilon_quantile)
    )
    rows = []
    for c in range(part_pc.shape[0]):
        d = min_dist_to_cloud(gt_surface, part_pc[c], cloud_mask=part_mask[c])
        rows.append((eps - d > 0).astype(jnp.float32))
    return jnp.stack(rows)


def compute_occupancy_field(key, verts, faces, gt_surface, cfg: ShapeNetGTConfig,
                            image_size=None):
    """6-view orthographic space carving (reference :163-225).

    Returns (n_samples_for_occupancy + n_points_surface, 4) [xyz + occ].
    """
    if image_size is None:
        image_size = (cfg.image_size, cfg.image_size)
    k_uni, k_pick, k_noise, k_shuf, k_bal = jax.random.split(key, 5)

    n_uniform = int(cfg.n_max_samples * cfg.sampling_ratio)
    n_surface = cfg.n_max_samples - n_uniform
    X_uni = sample_X_in_box(k_uni, cfg.sampling_diagonal_range, n_uniform)
    pick = jax.random.randint(k_pick, (n_surface,), 0, gt_surface.shape[0])
    X_surf = gt_surface[pick] + cfg.sampling_noise_std * jax.random.normal(
        k_noise, (n_surface, 3)
    )
    r = cfg.sampling_diagonal_range
    X_surf = jnp.clip(X_surf, -r / 2, r / 2)
    X_world = jnp.concatenate((X_uni, X_surf), axis=0)
    X_world = jax.random.permutation(k_shuf, X_world, axis=0)

    # Orthographic carving at surface_resolution scale.
    cams = ortho_cameras(cfg)
    surf_verts = adjust_mesh_diagonally(verts, cfg.surface_resolution)
    frags = rasterize(surf_verts, faces, cams, image_size,
                      chunk=cfg.raster_chunk, perspective_correct=True)
    depth = frags.zbuf[..., None]  # (6, H, W, 1)
    depth = jnp.where(depth > -1, depth, 100 * r * cfg.surface_resolution)

    Xs = X_world * cfg.surface_resolution
    X_zbuf = cams.world_to_view(jnp.broadcast_to(Xs[None], (6, *Xs.shape)))[..., 2]
    ndc = cams.transform_points(jnp.broadcast_to(Xs[None], (6, *Xs.shape)))
    grid_xy = -ndc[..., :2]  # square image: factor -min(H,W)/W = -1 (reference :200)
    ortho_z = sample_points_bilinear(depth, grid_xy, padding_mode="border")[..., 0]
    occ = jnp.prod((X_zbuf - ortho_z > 0).astype(jnp.float32), axis=0)

    # Balance: occupied first, then empty; truncate; shuffle (reference :216-222).
    order = jnp.argsort(-occ, stable=True)
    X_world = X_world[order][: cfg.n_samples_for_occupancy]
    occ = occ[order][: cfg.n_samples_for_occupancy]
    perm = jax.random.permutation(k_bal, cfg.n_samples_for_occupancy)
    X_world, occ = X_world[perm], occ[perm]

    X_world = jnp.concatenate((X_world, gt_surface), axis=0)
    occ = jnp.concatenate((occ, jnp.ones(gt_surface.shape[0])), axis=0)
    return jnp.concatenate((X_world, occ[:, None]), axis=-1)


def generate_mesh_gt(key, verts, faces, cfg: ShapeNetGTConfig = ShapeNetGTConfig(),
                     image_size=None) -> Dict[str, np.ndarray]:
    """All GT artifacts for one (diag-1 normalized) mesh.

    Returns the reference's dict layout: surface_points/epsilon/quantile/resolution,
    partial_point_cloud (+ masks), coverage, occupancy_field.
    """
    k_surf, k_pc, k_cov, k_occ = jax.random.split(key, 4)
    gt_surface = sample_points_on_mesh_surface(
        k_surf, verts, faces, cfg.n_points_surface
    )
    epsilon = compute_surface_epsilon(gt_surface, cfg.epsilon_quantile)

    _, cams = candidate_cameras(cfg)
    part_pc, part_mask = compute_partial_point_clouds(
        k_pc, verts, faces, cams, cfg, image_size=image_size
    )
    coverage = compute_coverage_matrix(gt_surface, part_pc, part_mask, k_cov, cfg)
    occupancy = compute_occupancy_field(
        k_occ, verts, faces, gt_surface, cfg, image_size=image_size
    )
    return {
        "surface_points": np.asarray(gt_surface),
        "epsilon": np.asarray(epsilon),
        "quantile": np.float32(cfg.epsilon_quantile),
        "resolution": np.float32(cfg.surface_resolution),
        "partial_point_cloud": np.asarray(part_pc),
        "partial_point_cloud_mask": np.asarray(part_mask),
        "coverage": np.asarray(coverage),
        "occupancy_field": np.asarray(occupancy),
    }


def save_mesh_gt(gt: Dict[str, np.ndarray], save_dir: str):
    """Write the three artifact files (npz; reference writes .pt with same keys)."""
    os.makedirs(save_dir, exist_ok=True)
    np.savez(
        os.path.join(save_dir, "surface_points.npz"),
        surface_points=gt["surface_points"], epsilon=gt["epsilon"],
        quantile=gt["quantile"], resolution=gt["resolution"],
    )
    np.savez(
        os.path.join(save_dir, "partial_point_clouds.npz"),
        partial_point_cloud=gt["partial_point_cloud"],
        partial_point_cloud_mask=gt["partial_point_cloud_mask"],
        coverage=gt["coverage"],
    )
    np.savez(
        os.path.join(save_dir, "occupancy_field.npz"),
        occupancy_field=gt["occupancy_field"],
    )
