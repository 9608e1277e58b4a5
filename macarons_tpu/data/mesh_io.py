"""Mesh IO: OBJ loading without PyTorch3D (host-side, numpy).

Replaces PT3D's load_obj (SURVEY.md §2.9 row 8 — offline path, perf-noncritical).
Supports v/vn/vt/f lines, per-vertex colors ('v x y z r g b', common in scanned
scene meshes), triangulation of polygon faces, and the reference's mesh
normalization/mirroring hooks (utils.py:613-673).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np


class Mesh(NamedTuple):
    verts: np.ndarray  # (V, 3) float32
    faces: np.ndarray  # (F, 3) int32
    vert_colors: Optional[np.ndarray] = None  # (V, 3) float32 or None


def load_obj(path: str) -> Mesh:
    verts, colors, faces = [], [], []
    has_colors = False
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(x) for x in parts[1:4]])
                if len(parts) >= 7:
                    has_colors = True
                    colors.append([float(x) for x in parts[4:7]])
                else:
                    colors.append([0.5, 0.5, 0.5])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append([idx[0], idx[k], idx[k + 1]])
    if not verts or not faces:
        raise ValueError(f"{path}: no vertices/faces found (empty or non-OBJ file)")
    return Mesh(
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
        np.asarray(colors, np.float32) if has_colors else None,
    )


def save_obj(path: str, mesh: Mesh):
    with open(path, "w") as f:
        for i, v in enumerate(mesh.verts):
            if mesh.vert_colors is not None:
                c = mesh.vert_colors[i]
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in mesh.faces:
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def adjust_mesh(verts: np.ndarray, x_range: float = 1.0,
                center: bool = True) -> np.ndarray:
    """Max-extent normalization (reference utils.py:613-630)."""
    mn, mx = verts.min(0), verts.max(0)
    scale = x_range / max(mx - mn)
    out = verts * scale
    if center:
        out = out - (out.min(0) + out.max(0)) / 2
    return out


def mirror_mesh(mesh: Mesh, axes) -> Mesh:
    """Mirror vertices along the given axes and flip face orientation
    (the reference's random mirror augmentation, train_macarons.py setup)."""
    verts = mesh.verts.copy()
    for a in axes:
        verts[:, a] = -verts[:, a]
    faces = mesh.faces.copy()
    if len(axes) % 2 == 1:
        faces = faces[:, ::-1]
    return Mesh(verts, faces, mesh.vert_colors)
