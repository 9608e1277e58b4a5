"""Camera & coordinate geometry — pure JAX re-implementation, no kernels needed.

Replaces the reference's PyTorch3D camera/transform stack (SURVEY.md §2.9 row 3):
spherical<->cartesian coordinates (reference: macarons/utility/CustomGeometry.py:5-77),
look-at transforms, FoV-perspective projection/unprojection with PyTorch3D's
row-vector + screen-space conventions (+X left, +Y up, +Z into screen; world->view is
``X_view = X_world @ R + T``), and the non-square NDC pixel grid used by the
reference Camera (macarons/utility/macarons_utils.py:1928-1938).

Everything is batched, static-shape, and safe under jit/vmap.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (3x3) but parity-critical: always full f32 on MXU.
_HI = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# Spherical coordinates
# ---------------------------------------------------------------------------


def get_cartesian_coords(r, elev, azim, in_degrees: bool = False):
    """Cartesian coords of points given (radius, elevation, azimuth).

    Convention (matches reference CustomGeometry.py:5-24):
    x = cos(elev) sin(azim), y = sin(elev), z = cos(elev) cos(azim).

    Args: r, elev, azim — broadcastable arrays, shape (..., 1) or (...).
    Returns: (..., 3) array.
    """
    factor = jnp.pi / 180.0 if in_degrees else 1.0
    e = jnp.asarray(elev) * factor
    a = jnp.asarray(azim) * factor
    X = jnp.stack(
        (jnp.cos(e) * jnp.sin(a), jnp.sin(e), jnp.cos(e) * jnp.cos(a)), axis=-1
    )
    r = jnp.asarray(r)
    if r.ndim == X.ndim - 1:
        r = r[..., None]
    return r * X


def get_spherical_coords(X, eps: float = 0.0):
    """Spherical (r, elev, azim) of cartesian points, with clamped edge cases.

    Matches reference CustomGeometry.py:27-45: elev = asin(y/r) in [-pi/2, pi/2];
    azim = acos(z / (r cos(elev))) with the sign of x (azim measured from +z towards
    +x, in (-pi, pi]). Ratios are clamped to [-1, 1] exactly like the reference's
    explicit boundary overrides.

    Args: X — (..., 3).
    Returns: (r, elev, azim), each shaped (...,).
    """
    X = jnp.asarray(X)
    r = jnp.linalg.norm(X, axis=-1)
    safe_r = jnp.maximum(r, 1e-20)

    sin_elev = jnp.clip(X[..., 1] / safe_r, -1.0, 1.0)
    elev = jnp.arcsin(sin_elev)

    cos_elev = jnp.cos(elev)
    denom = jnp.maximum(safe_r * cos_elev, 1e-20)
    cos_azim = jnp.clip(X[..., 2] / denom, -1.0, 1.0)
    azim = jnp.arccos(cos_azim)
    azim = jnp.where(X[..., 0] < 0, -azim, azim)

    return r, elev, azim


def sample_cameras_on_sphere(n_X: int, radius: float, dtype=jnp.float32):
    """Deterministic sphere sampling of camera positions (reference CustomGeometry.py:47-77).

    n_X must be a square integer; returns (n_X, 3).
    """
    import numpy as np

    delta_theta = 0.9 * np.pi
    delta_phi = 0.9 * 2 * np.pi
    n_dim = int(np.sqrt(n_X))
    d_theta = 2 * delta_theta / (n_dim - 1)
    d_phi = 2 * delta_phi / (n_dim - 1)

    inc = jnp.linspace(0, n_dim - 1, n_dim, dtype=dtype)
    thetas = -delta_theta + inc * d_theta
    phis = -delta_phi + inc * d_phi
    thetas = jnp.broadcast_to(thetas[:, None], (n_dim, n_dim))
    phis = jnp.broadcast_to(phis[None, :], (n_dim, n_dim))
    X = jnp.stack(
        (
            jnp.cos(thetas) * jnp.sin(phis),
            jnp.sin(thetas),
            jnp.cos(thetas) * jnp.cos(phis),
        ),
        axis=2,
    )
    return radius * X.reshape(-1, 3)


def dot_prod(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


# ---------------------------------------------------------------------------
# Look-at transforms (PyTorch3D row-vector convention)
# ---------------------------------------------------------------------------


def normalize(v, axis: int = -1, eps: float = 1e-5):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def look_at_rotation(camera_position, at=None, up=None):
    """Rotation R (columns = camera x/y/z axes in world coords).

    Row-vector convention: ``X_view = (X_world - C) @ R``. Handles the degenerate
    case where the up vector is parallel to the view direction, like PyTorch3D.

    Args: camera_position (..., 3); at (..., 3) default origin; up default +Y.
    Returns: (..., 3, 3).
    """
    camera_position = jnp.asarray(camera_position)
    if at is None:
        at = jnp.zeros_like(camera_position)
    if up is None:
        up = jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0], camera_position.dtype), camera_position.shape
        )
    z_axis = normalize(at - camera_position)
    x_axis = normalize(jnp.cross(up, z_axis))
    y_axis = normalize(jnp.cross(z_axis, x_axis))
    # Degenerate: up parallel to z -> cross is ~0; rebuild x from y,z
    is_close = jnp.all(jnp.abs(x_axis) < 5e-3, axis=-1, keepdims=True)
    replacement = normalize(jnp.cross(y_axis, z_axis))
    x_axis = jnp.where(is_close, replacement, x_axis)
    R = jnp.stack((x_axis, y_axis, z_axis), axis=-2)  # rows = axes
    return jnp.swapaxes(R, -1, -2)  # columns = axes


def look_at_view_transform(dist=1.0, elev=0.0, azim=0.0, at=None, up=None,
                           in_degrees: bool = True, eye=None):
    """(R, T) for cameras looking at `at` from spherical offsets (dist, elev, azim).

    ``X_view = X_world @ R + T`` with ``T = -C @ R``.
    Matches PyTorch3D's look_at_view_transform semantics (degrees by default).
    Returns R (..., 3, 3), T (..., 3).
    """
    if eye is not None:
        C = jnp.atleast_2d(jnp.asarray(eye))
        if at is None:
            at = jnp.zeros_like(C)
    else:
        dist = jnp.atleast_1d(jnp.asarray(dist, dtype=jnp.float32))
        elev = jnp.atleast_1d(jnp.asarray(elev, dtype=jnp.float32))
        azim = jnp.atleast_1d(jnp.asarray(azim, dtype=jnp.float32))
        dist, elev, azim = jnp.broadcast_arrays(dist, elev, azim)
        offset = get_cartesian_coords(dist, elev, azim, in_degrees=in_degrees)
        if at is None:
            at = jnp.zeros_like(offset)
        else:
            at = jnp.broadcast_to(jnp.asarray(at, dtype=jnp.float32), offset.shape)
        C = at + offset
    R = look_at_rotation(C, at=at, up=up)
    T = -jnp.einsum("...i,...ij->...j", C, R, precision=_HI)
    return R, T


def camera_center_from_RT(R, T):
    """Camera center C in world coords from (R, T): C = -T @ R^T."""
    return -jnp.einsum("...j,...ij->...i", T, R, precision=_HI)


# ---------------------------------------------------------------------------
# FoV perspective camera (PyTorch3D conventions)
# ---------------------------------------------------------------------------


class FoVCamera(NamedTuple):
    """A batched FoV-perspective camera, row-vector convention.

    Fields broadcast together; R is (..., 3, 3), T (..., 3), scalars (...,).
    fov is in degrees (matching the reference configs).
    """

    R: jnp.ndarray
    T: jnp.ndarray
    fov: jnp.ndarray  # degrees
    znear: jnp.ndarray
    zfar: jnp.ndarray
    aspect_ratio: jnp.ndarray  # max_x / max_y

    @classmethod
    def create(cls, R, T, fov=60.0, znear=0.5, zfar=100.0, aspect_ratio=1.0):
        R = jnp.asarray(R)
        dt = R.dtype
        batch = R.shape[:-2]

        def b(v):
            return jnp.broadcast_to(jnp.asarray(v, dt), batch)

        return cls(R, jnp.asarray(T, dt), b(fov), b(znear), b(zfar), b(aspect_ratio))

    # -- transforms ---------------------------------------------------------
    def world_to_view(self, pts):
        """(..., N, 3) world points -> view coords (X left, Y up, Z into screen)."""
        return jnp.einsum("...nj,...ji->...ni", pts, self.R, precision=_HI) + self.T[..., None, :]

    def view_to_world(self, pts_view):
        return jnp.einsum(
            "...nj,...ij->...ni", pts_view - self.T[..., None, :], self.R
        , precision=_HI)

    def camera_center(self):
        return camera_center_from_RT(self.R, self.T)

    def project_view(self, pts_view):
        """View-space points -> (x_ndc, y_ndc, z_ndc) with z_ndc in [0, 1]."""
        tan_half = jnp.tan(jnp.deg2rad(self.fov) / 2.0)[..., None]
        z = pts_view[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        x_ndc = pts_view[..., 0] / (safe_z * tan_half * self.aspect_ratio[..., None])
        y_ndc = pts_view[..., 1] / (safe_z * tan_half)
        zf = self.zfar[..., None]
        zn = self.znear[..., None]
        z_ndc = zf / (zf - zn) - (zf * zn) / ((zf - zn) * safe_z)
        return jnp.stack((x_ndc, y_ndc, z_ndc), axis=-1)

    def transform_points(self, pts):
        """World points -> NDC (full projection transform), like PT3D
        get_full_projection_transform().transform_points."""
        return self.project_view(self.world_to_view(pts))

    def unproject_ndc_depth(self, ndc_points):
        """(x_ndc, y_ndc, depth) -> world points.

        depth is the real view-space z (PT3D unproject_points with
        scaled_depth_input=False; reference macarons_utils.py:2349-2360).
        """
        tan_half = jnp.tan(jnp.deg2rad(self.fov) / 2.0)[..., None]
        depth = ndc_points[..., 2]
        x_view = ndc_points[..., 0] * depth * tan_half * self.aspect_ratio[..., None]
        y_view = ndc_points[..., 1] * depth * tan_half
        pts_view = jnp.stack((x_view, y_view, depth), axis=-1)
        return self.view_to_world(pts_view)


class OrthoCamera(NamedTuple):
    """Batched orthographic camera (PyTorch3D FoVOrthographicCameras defaults:
    NDC box [-1,1]^2, scale 1). Used by the GT data generators
    (reference utils.py:676-706 make_rasterizer)."""

    R: jnp.ndarray
    T: jnp.ndarray
    znear: jnp.ndarray
    zfar: jnp.ndarray

    @classmethod
    def create(cls, R, T, znear=0.5, zfar=100.0):
        R = jnp.asarray(R)
        dt = R.dtype
        batch = R.shape[:-2]

        def b(v):
            return jnp.broadcast_to(jnp.asarray(v, dt), batch)

        return cls(R, jnp.asarray(T, dt), b(znear), b(zfar))

    def world_to_view(self, pts):
        return jnp.einsum("...nj,...ji->...ni", pts, self.R, precision=_HI) + self.T[..., None, :]

    def view_to_world(self, pts_view):
        return jnp.einsum(
            "...nj,...ij->...ni", pts_view - self.T[..., None, :], self.R,
            precision=_HI,
        )

    def camera_center(self):
        return camera_center_from_RT(self.R, self.T)

    def project_view(self, pts_view):
        zf = self.zfar[..., None]
        zn = self.znear[..., None]
        z_ndc = (pts_view[..., 2] - zn) / (zf - zn)
        return jnp.stack((pts_view[..., 0], pts_view[..., 1], z_ndc), axis=-1)

    def transform_points(self, pts):
        return self.project_view(self.world_to_view(pts))

    def unproject_ndc_depth(self, ndc_points):
        pts_view = jnp.stack(
            (ndc_points[..., 0], ndc_points[..., 1], ndc_points[..., 2]), axis=-1
        )
        return self.view_to_world(pts_view)


# ---------------------------------------------------------------------------
# NDC pixel grids (reference macarons_utils.py:1928-1938)
# ---------------------------------------------------------------------------


def ndc_pixel_grid(height: int, width: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel PyTorch3D NDC coordinates for an HxW image.

    Matches the reference tables exactly: for pixel (row i, col j), with
    s = min(H, W):  x_ndc = W/s - 2 j/(s-1),  y_ndc = H/s - 2 i/(s-1).
    (+X left, +Y up: column 0 is the rightmost in NDC.)

    Returns (ndc_x, ndc_y), each (H, W).
    """
    s = min(height, width)
    j = jnp.arange(width, dtype=dtype)[None, :]
    i = jnp.arange(height, dtype=dtype)[:, None]
    ndc_x = jnp.broadcast_to(width / s - 2.0 * j / (s - 1), (height, width))
    ndc_y = jnp.broadcast_to(height / s - 2.0 * i / (s - 1), (height, width))
    return ndc_x, ndc_y


def ndc_bounds(height: int, width: int) -> Tuple[float, float, float, float]:
    """(min_x, max_x, min_y, max_y) of the NDC pixel grid."""
    s = min(height, width)
    max_x = width / s
    min_x = width / s - 2.0 * (width - 1) / (s - 1)
    max_y = height / s
    min_y = height / s - 2.0 * (height - 1) / (s - 1)
    return float(min_x), float(max_x), float(min_y), float(max_y)


# ---------------------------------------------------------------------------
# Rotation algebra (for pose composition in the depth module)
# ---------------------------------------------------------------------------


def quaternion_from_matrix(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) (w, x, y, z).

    Branch-free (selects the numerically best of the 4 Shepperd variants),
    safe under jit/vmap.
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Shepperd's method: the candidate with the largest diagonal term s^2 keeps the
    # un-normalized quaternion proportional to [.., s^2, ..] (no sqrt needed — the
    # final normalize fixes the scale, and s^2 > 0 for the selected branch).
    q0 = jnp.stack(
        (1 + tr, m21 - m12, m02 - m20, m10 - m01), axis=-1
    )
    q1 = jnp.stack(
        (m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20), axis=-1
    )
    q2 = jnp.stack(
        (m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21), axis=-1
    )
    q3 = jnp.stack(
        (m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22), axis=-1
    )
    case = jnp.argmax(
        jnp.stack((tr, m00, m11, m22), axis=-1), axis=-1
    )
    q = jnp.select(
        [case[..., None] == 0, case[..., None] == 1, case[..., None] == 2],
        [q0, q1, q2],
        q3,
    )
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def matrix_from_quaternion(q):
    """Unit quaternion (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    q = normalize(q, eps=1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)), axis=-1
    )
    row1 = jnp.stack(
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)), axis=-1
    )
    row2 = jnp.stack(
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)), axis=-1
    )
    return jnp.stack((row0, row1, row2), axis=-2)


def axis_angle_from_matrix(R):
    """Rotation matrix -> axis-angle vector (..., 3)."""
    q = quaternion_from_matrix(R)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-12))
    axis = q[..., 1:] / s[..., None]
    small = (angle < 1e-6)[..., None]
    return jnp.where(small, q[..., 1:] * 2.0, axis * angle[..., None])


def matrix_from_axis_angle(aa):
    """Axis-angle vector (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    small = angle < 1e-8
    axis = aa / jnp.where(small, 1.0, angle)
    half = angle[..., 0] / 2.0
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    # For tiny angles use first-order quaternion
    w = jnp.where(small[..., 0], 1.0, w)
    xyz = jnp.where(small, aa / 2.0, xyz)
    return matrix_from_quaternion(jnp.concatenate((w[..., None], xyz), axis=-1))


def relative_pose(R_a, T_a, R_b, T_b):
    """Relative world->view pose taking view-space of A to view-space of B.

    With row-vector convention X_a = X_w @ R_a + T_a, the map A->B is
    X_b = X_a @ R_rel + T_rel where R_rel = R_a^{-1} R_b = R_a^T... computed here
    as R_rel = R_a^{-T} R_b and T_rel = T_b - T_a @ R_rel.
    """
    R_rel = jnp.einsum("...ji,...jk->...ik", R_a, R_b, precision=_HI)  # R_a^T? careful: rows/cols
    # X_w = (X_a - T_a) @ R_a^{-1}; R orthonormal => R^{-1} = R^T applied as
    # X_w = (X_a - T_a) @ R_a^T  (row-vector). Then X_b = X_w @ R_b + T_b.
    # => X_b = X_a @ (R_a^T R_b) - T_a @ (R_a^T R_b) + T_b
    # (row-vector matmul: (X @ A) @ B = X @ (A B)); A = R_a^T as an operator on rows
    # means matrix product R_a^T R_b with entries: (R_a^T R_b)[i,k] = sum_j R_a[j,i]...
    T_rel = T_b - jnp.einsum("...j,...jk->...k", T_a, R_rel, precision=_HI)
    return R_rel, T_rel


def compose_pose(R_ab, T_ab, R_bc, T_bc):
    """Compose row-vector poses: X_c = (X_a @ R_ab + T_ab) @ R_bc + T_bc."""
    R_ac = jnp.einsum("...ij,...jk->...ik", R_ab, R_bc, precision=_HI)
    T_ac = jnp.einsum("...j,...jk->...k", T_ab, R_bc, precision=_HI) + T_bc
    return R_ac, T_ac
