"""Trajectory / point-cloud export helpers for offline visualization.

Rebuilds the reference testers' Blender-export branch and render_utils
plotting utilities (reference macarons/testers/scene.py:18-60 —
create_points_to_look_at, convert_vector_to_blender, create_blender_curves —
and utility/render_utils.py:11-60). Host-side numpy only; the plotly wrappers
degrade gracefully when plotly is absent.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def create_points_to_look_at(X_cam, V_cam, camera_size: float):
    """Look-at point camera_size ahead of each pose (reference scene.py:18-27).

    X_cam (N, 3); V_cam (N, 2) (elev, azim) in degrees. Returns (N, 3)."""
    X_cam = np.asarray(X_cam, np.float32).reshape(-1, 3)
    V_cam = np.asarray(V_cam, np.float32).reshape(-1, 2)
    elev = np.deg2rad(-V_cam[:, 0])
    azim = np.deg2rad(180.0 + V_cam[:, 1])
    rays = -np.stack((np.cos(elev) * np.sin(azim), np.sin(elev),
                      np.cos(elev) * np.cos(azim)), axis=-1)
    return X_cam + camera_size * rays


def convert_vector_to_blender(vec):
    """PT3D/world axes -> Blender axes: (x, y, z) -> (x, -z, y)
    (reference scene.py:30-35)."""
    v = np.array(vec, np.float32)
    out = v.copy()
    out[..., 1] = -v[..., 2]
    out[..., 2] = v[..., 1]
    return out


def convert_blender_to_vector(vec):
    """Inverse of convert_vector_to_blender (reference scene.py:37-41)."""
    v = np.array(vec, np.float32)
    out = v.copy()
    out[..., 1] = v[..., 2]
    out[..., 2] = -v[..., 1]
    return out


def create_blender_curves(X_cam_history, V_cam_history,
                          n_interpolation_steps: int,
                          scene_scale_factor: float = 1.0,
                          cam_size: float = 10.0, jump_poses: int = 1,
                          mirrored_axes=None):
    """Camera-position + look-at curves in Blender coordinates, subsampled to
    real poses (reference create_blender_curves scene.py:44-60).

    Returns (camera_X, camera_look) as nested lists (JSON-ready)."""
    X = np.asarray(X_cam_history, np.float32).reshape(-1, 3)
    V = np.asarray(V_cam_history, np.float32).reshape(-1, 2)
    X = X[n_interpolation_steps::jump_poses]
    V = V[n_interpolation_steps::jump_poses]
    look = create_points_to_look_at(X, V, cam_size * scene_scale_factor)
    camera_X = convert_vector_to_blender(X)
    camera_look = convert_vector_to_blender(look)
    if mirrored_axes:
        for a in mirrored_axes:
            camera_X[..., a] *= -1.0
            camera_look[..., a] *= -1.0
    camera_X = camera_X / scene_scale_factor
    camera_look = camera_look / scene_scale_factor
    return camera_X.tolist(), camera_look.tolist()


def export_trajectory_blender(path: str, X_cam_history, V_cam_history,
                              n_interpolation_steps: int,
                              scene_scale_factor: float = 1.0,
                              cam_size: float = 10.0, jump_poses: int = 1,
                              mirrored_axes=None):
    """Write the Blender camera curves as JSON (the reference pastes these
    lists into its Blender scene script, scene.py:608-618)."""
    cx, cl = create_blender_curves(
        X_cam_history, V_cam_history, n_interpolation_steps,
        scene_scale_factor, cam_size, jump_poses, mirrored_axes)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"camera_X": cx, "camera_look": cl}, f)
    return path


def export_point_cloud_ply(path: str, points, colors: Optional[np.ndarray] = None,
                           valid=None):
    """ASCII PLY point-cloud export (offline rendering / Blender import —
    replaces the reference's notebook-side Pointclouds plotting)."""
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    if valid is not None:
        v = np.asarray(valid).reshape(-1).astype(bool)
        pts = pts[v]
        if colors is not None:
            colors = np.asarray(colors).reshape(-1, np.shape(colors)[-1])[v]
    n = len(pts)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        if colors is not None:
            c = np.clip(np.asarray(colors, np.float32)[:, :3], 0, 1)
            c = (c * 255).astype(np.uint8)
            for p, ci in zip(pts, c):
                f.write(f"{p[0]} {p[1]} {p[2]} {ci[0]} {ci[1]} {ci[2]}\n")
        else:
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
    return path


def plot_point_cloud(points, features=None, name: str = "", point_size: int = 2,
                     max_points: int = 20000, cmap: str = "rgb"):
    """Plotly 3-D scatter of a point cloud (reference render_utils.py:11-47).

    Returns a plotly Figure, or None when plotly is unavailable."""
    try:
        import plotly.graph_objs as go
    except Exception:
        return None
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    if len(pts) > max_points:
        idx = np.random.default_rng(0).choice(len(pts), max_points,
                                              replace=False)
        pts = pts[idx]
        if features is not None:
            features = np.asarray(features).reshape(len(np.asarray(features)), -1)[idx]
    color = None
    if features is not None:
        feat = np.asarray(features, np.float32)
        if cmap == "gray":
            feat = np.repeat(feat.reshape(-1, 1), 3, axis=-1)
        elif cmap == "rainbow":
            feat = (pts - pts.min()) / max(pts.max() - pts.min(), 1e-8)
        color = ["rgb({},{},{})".format(*(np.clip(c, 0, 1) * 255).astype(int))
                 for c in feat.reshape(-1, feat.shape[-1])[:, :3]]
    fig = go.Figure(data=[go.Scatter3d(
        x=pts[:, 0], y=pts[:, 1], z=pts[:, 2], mode="markers",
        marker=dict(size=point_size, color=color), name=name)])
    return fig


def plot_graph(x, y, x_label: str = "X-axis", y_label: str = "Y-axis",
               title: Optional[str] = None, names=None):
    """Plotly line/marker curves (reference render_utils.py:50-60)."""
    try:
        import plotly.graph_objs as go
    except Exception:
        return None
    ys = y if isinstance(y, list) else [y]
    data = []
    for i, yi in enumerate(ys):
        kw = {"name": names[i]} if names else {}
        data.append(go.Scatter(x=x, y=yi, mode="lines+markers", **kw))
    return go.Figure(data=data, layout=go.Layout(
        title=title, xaxis=dict(title=x_label), yaxis=dict(title=y_label)))
