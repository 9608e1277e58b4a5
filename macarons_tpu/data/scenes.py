"""Scene dataset + settings (reference CustomDataset.SceneDataset + Settings).

Per-scene directory: `<scene>/<name>.obj` + `settings.json` (bbox, grid dims,
camera pose lattice, start poses, contrast — reference macarons_utils.py:
1812-1850) + optionally `occupied_pose.npz`/`.pt`. Also the scene-data
generator: settings heuristics and occupied-pose detection by comparing normal
vs backface-culled renders (reference data/scenes/generate_scene_data.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .mesh_io import Mesh, load_obj


@dataclass
class SceneSettings:
    """Parsed settings.json (reference Settings class :1812-1850)."""

    scene_x_min: np.ndarray
    scene_x_max: np.ndarray
    grid_l: int
    grid_w: int
    grid_h: int
    pose_x_min: np.ndarray
    pose_x_max: np.ndarray
    pose_l: int
    pose_w: int
    pose_h: int
    pose_n_elev: int
    pose_n_azim: int
    start_positions: List
    contrast_factor: float = 1.0

    @classmethod
    def from_json(cls, path: str) -> "SceneSettings":
        with open(path) as f:
            d = json.load(f)
        scene = d["scene"]
        camera = d["camera"]
        return cls(
            scene_x_min=np.asarray(scene["x_min"], np.float32),
            scene_x_max=np.asarray(scene["x_max"], np.float32),
            grid_l=scene["grid_l"], grid_w=scene["grid_w"], grid_h=scene["grid_h"],
            pose_x_min=np.asarray(camera["x_min"], np.float32),
            pose_x_max=np.asarray(camera["x_max"], np.float32),
            pose_l=camera["pose_l"], pose_w=camera["pose_w"],
            pose_h=camera["pose_h"],
            pose_n_elev=camera["pose_n_elev"], pose_n_azim=camera["pose_n_azim"],
            start_positions=camera.get("start_positions", []),
            contrast_factor=d.get("contrast_factor", 1.0),
        )


class SceneDataset:
    """Walk scene directories (reference CustomDataset.py:313-362)."""

    def __init__(self, data_path: str, scene_names: Optional[List[str]] = None):
        self.data_path = data_path
        if scene_names is None:
            scene_names = sorted(
                d for d in os.listdir(data_path)
                if os.path.isdir(os.path.join(data_path, d))
                and os.path.exists(os.path.join(data_path, d, "settings.json"))
            )
        self.scene_names = scene_names

    def __len__(self):
        return len(self.scene_names)

    def __getitem__(self, i):
        name = self.scene_names[i]
        d = os.path.join(self.data_path, name)
        objs = [f for f in os.listdir(d) if f.endswith(".obj")]
        settings = SceneSettings.from_json(os.path.join(d, "settings.json"))
        occupied = None
        npz = os.path.join(d, "occupied_pose.npz")
        pt = os.path.join(d, "occupied_pose.pt")
        if os.path.exists(npz):
            occupied = dict(np.load(npz))
        elif os.path.exists(pt):
            import torch

            data = torch.load(pt, map_location="cpu")
            occupied = {k: np.asarray(v) for k, v in data.items()}
        return {
            "scene_name": name,
            "obj_path": os.path.join(d, objs[0]) if objs else None,
            "settings": settings,
            "occupied_pose": occupied,
        }


def occupied_pose_grid(occupied_pose: dict, pose_l: int, pose_w: int,
                       pose_h: int) -> np.ndarray:
    """(L, W, H) bool occupancy grid from the reference's occupied_pose dict
    ({'X_idx': (N, 3), 'occupied': (N,)})."""
    grid = np.zeros((pose_l, pose_w, pose_h), bool)
    X_idx = np.asarray(occupied_pose["X_idx"]).astype(int)
    occ = np.asarray(occupied_pose["occupied"]).astype(bool).reshape(-1)
    for i in range(len(X_idx)):
        x, y, z = X_idx[i]
        if 0 <= x < pose_l and 0 <= y < pose_w and 0 <= z < pose_h:
            grid[x, y, z] = occ[i]
    return grid


def compute_scene_settings(verts: np.ndarray, cell_size: float = 1.0,
                           pose_step: float = 1.0, n_elev: int = 5,
                           n_azim: int = 8) -> dict:
    """Settings heuristics (reference generate_scene_data.py:15-86): grid and
    pose-lattice dims sized from the mesh bbox."""
    mn = verts.min(0) * 1.01
    mx = verts.max(0) * 1.01
    extent = mx - mn
    grid_dims = np.maximum(np.ceil(extent / cell_size).astype(int), 1)
    pose_dims = np.maximum(np.ceil(extent / pose_step).astype(int), 2)
    return {
        "scene": {
            "x_min": mn.tolist(), "x_max": mx.tolist(),
            "grid_l": int(grid_dims[0]), "grid_w": int(grid_dims[1]),
            "grid_h": int(grid_dims[2]),
        },
        "camera": {
            "x_min": mn.tolist(), "x_max": mx.tolist(),
            "pose_l": int(pose_dims[0]), "pose_w": int(pose_dims[1]),
            "pose_h": int(pose_dims[2]),
            "pose_n_elev": n_elev, "pose_n_azim": n_azim,
            "start_positions": [],
        },
        "contrast_factor": 1.0,
    }


def compute_occupied_poses(mesh: Mesh, pose_space, image_size=(64, 64),
                           threshold: float = 1e-3, zfar: float = 100.0,
                           rs: Optional[np.random.Generator] = None) -> dict:
    """Detect camera positions inside geometry by comparing a normal render
    against a backface-culled render (reference generate_scene_data.py:246-285).

    A camera inside a watertight mesh sees only backfaces, so culling them
    changes the image everywhere (mean abs diff > threshold); outside, front
    faces dominate and culling changes (almost) nothing."""
    import jax.numpy as jnp

    from ..ops.geometry import FoVCamera
    from ..ops.projection import points_in_fov_mask
    from ..ops.rasterizer import PointLights, front_face_mask, render_mesh
    from ..scene.camera import get_camera_RT

    rs = rs or np.random.default_rng(0)
    verts = jnp.asarray(mesh.verts)
    faces = jnp.asarray(mesh.faces)
    colors = (jnp.asarray(mesh.vert_colors)
              if mesh.vert_colors is not None else None)
    lights = PointLights.create(jnp.zeros((1, 3)), ambient=1.0, diffuse=0.0,
                                specular=0.0)
    H, W = image_size

    def cam_for(pose):
        X = jnp.asarray(pose[:3]).reshape(1, 3)
        V = jnp.asarray(pose[3:]).reshape(1, 2)
        R, T = get_camera_RT(X, V)
        return FoVCamera.create(R, T, zfar=zfar)

    X_idx = []
    occupied = []
    dims = pose_space.dims
    for i in range(dims[0]):
        for j in range(dims[1]):
            for k in range(dims[2]):
                idx = np.array([i, j, k, 0, 0])
                pose = np.array(pose_space.pose_from_idx(jnp.asarray(idx)))
                cam = cam_for(pose)
                # Re-sample the view direction until the fov is non-empty
                # (reference :255-263)
                for _ in range(32):
                    if bool(points_in_fov_mask(verts[None], cam, H, W,
                                               fov_range=5 * zfar).any()):
                        break
                    pose[3] = -90.0 + 180.0 * (
                        1 + rs.integers(0, dims[3])) / (dims[3] + 1)
                    pose[4] = 360.0 * rs.integers(0, dims[4]) / dims[4]
                    cam = cam_for(pose)
                # Black background so culled-to-background pixels always
                # register in the diff even for untextured meshes (the
                # reference's scenes are textured; diff is background-invariant
                # for pixels covered in both renders).
                normal, _ = render_mesh(verts, faces, cam, image_size, lights,
                                        vert_colors=colors, background=0.0)
                culled, _ = render_mesh(verts, faces, cam, image_size, lights,
                                        vert_colors=colors, background=0.0,
                                        face_mask=front_face_mask(verts, faces,
                                                                  cam))
                diff = float(jnp.mean(jnp.abs(normal - culled)))
                X_idx.append([i, j, k])
                occupied.append(diff > threshold)
    return {"X_idx": np.asarray(X_idx, np.int64),
            "occupied": np.asarray(occupied, bool)}
