"""Embodied camera agent: 5-D pose lattice, neighbor moves, capture.

TPU rebuild of the reference Camera (macarons_utils.py:1852-2500): the pose
space is arrays instead of string-keyed dicts; neighbor enumeration, pose
validity tests, interpolation, and capture are fixed-shape device functions;
the Camera object itself is a thin host-side episode bookkeeper.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import FoVCamera, get_cartesian_coords, look_at_view_transform
from ..ops.projection import points_in_fov_mask
from ..ops.rasterizer import PointLights, render_mesh
from .depth_runtime import FrameRing, ring_push


def get_camera_RT(X_cam, V_cam):
    """(R, T) from camera centers X_cam (n,3) and (elev, azim) degrees V_cam (n,2)
    (reference macarons_utils.py:740-756)."""
    X_cam = jnp.atleast_2d(X_cam)
    V_cam = jnp.atleast_2d(V_cam)
    rays = -get_cartesian_coords(
        jnp.ones((V_cam.shape[0], 1)),
        -1.0 * V_cam[:, 0:1],
        180.0 + V_cam[:, 1:2],
        in_degrees=True,
    ).reshape(-1, 3)
    return look_at_view_transform(eye=X_cam, at=X_cam + rays)


@partial(jax.jit, static_argnames=("height", "width", "zfar",
                                   "contrast_factor", "ambient"))
def _capture_program(verts, faces, vert_colors, texture_atlas, R, T,
                     height: int, width: int, zfar: float,
                     contrast_factor: float, ambient: float):
    """ONE device program for a whole capture batch: render + shade +
    contrast + depth/mask extraction (the eager path issued ~30 launches
    per capture — deadly once a d2h has flipped the tunneled runtime into
    synchronous dispatch)."""
    cam = FoVCamera.create(R, T, zfar=zfar)
    # Reference capture uses AmbientLights (macarons_utils.py:715-719)
    lights = PointLights.create(jnp.zeros((1, 3)), ambient=ambient,
                                diffuse=0.0, specular=0.0)
    images, frags = render_mesh(
        verts, faces, cam, (height, width), lights,
        vert_colors=vert_colors, texture_atlas=texture_atlas, background=1.0,
        # PT3D picks perspective-correct interpolation for FoV cameras by
        # default; the zbuf feeds carving/backprojection, so accuracy matters.
        perspective_correct=True,
    )
    if contrast_factor != 1.0:
        mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
        images = jnp.clip(mean + contrast_factor * (images - mean), 0, 1)
    depth = frags.zbuf[..., None]
    mask = depth > -1
    return images, depth, mask


@partial(jax.jit, static_argnames=("height", "width", "zfar",
                                   "contrast_factor", "ambient"))
def _capture_ring_program(verts, faces, vert_colors, texture_atlas, X, V,
                          ring: FrameRing, height: int, width: int,
                          zfar: float, contrast_factor: float,
                          ambient: float):
    """Fused interpolated-move capture: pose->extrinsics, render of ALL
    interpolation steps, and the frame-ring push in one launch."""
    R, T = get_camera_RT(X, V)
    images, depth, mask = _capture_program(
        verts, faces, vert_colors, texture_atlas, R, T, height, width, zfar,
        contrast_factor, ambient)
    ring = ring_push(ring, images, depth, mask, R, T, zfar)
    return images, depth, mask, R, T, ring


def capture_ring(camera: "Camera", verts, faces, X: np.ndarray, V: np.ndarray,
                 ring: FrameRing, vert_colors=None, texture_atlas=None,
                 ambient: float = 1.0):
    """Host wrapper over _capture_ring_program using `camera`'s statics."""
    return _capture_ring_program(
        verts, faces, vert_colors, texture_atlas, jnp.asarray(X),
        jnp.asarray(V), ring, camera.image_height, camera.image_width,
        float(camera.zfar), float(camera.contrast_factor), float(ambient))


# ---------------------------------------------------------------------------
# Device-resident episode state (zero-sync trajectories)
# ---------------------------------------------------------------------------
# The tunneled TPU runtime permanently degrades to synchronous dispatch after
# ANY device->host transfer (ROADMAP "CRITICAL runtime facts": a big train
# step costs 2.2 ms async vs 731 ms sync). The online pose loop therefore
# keeps the WHOLE episode — current pose, visited set, histories — on device;
# these pure functions replace the host Camera bookkeeping inside the fused
# decide/move/capture program. The host Camera class remains for testers and
# offline tools.


class DeviceEpisode(NamedTuple):
    """Episode state living entirely on device.

    Mirrors the reference Camera's mutable episode fields
    (macarons_utils.py:1852-2500): cam_idx / pose_history / X_cam / V_cam /
    fov_camera plus the index history the trainer flushes at epoch end."""

    cam_idx: jnp.ndarray  # (5,) int32 current lattice pose
    visited: jnp.ndarray  # (n_poses,) bool flat pose history
    X: jnp.ndarray  # (1, 3) current position
    V: jnp.ndarray  # (1, 2) current (elev, azim) degrees
    R: jnp.ndarray  # (1, 3, 3) current extrinsics
    T: jnp.ndarray  # (1, 3)
    idx_history: jnp.ndarray  # (max_moves, 5) int32
    X_history: jnp.ndarray  # (max_frames, 3) every captured pose
    V_history: jnp.ndarray  # (max_frames, 2)
    n_moves: jnp.ndarray  # () int32
    n_frames: jnp.ndarray  # () int32


class PoseSpaceTables(NamedTuple):
    """Static lattice tables passed INTO device programs (host numpy at trace
    time would bake them as constants; as arguments the compiled program is
    shared across scenes with equal lattice shapes)."""

    x_min: jnp.ndarray  # (3,)
    steps: jnp.ndarray  # (3,)
    shifts: jnp.ndarray  # (54, 5) int32 neighbor move set
    occupied: jnp.ndarray  # (L, W, H) bool


def pose_space_tables(ps: "PoseSpace",
                      occupied: Optional[np.ndarray] = None) -> PoseSpaceTables:
    occ = (np.zeros((ps.pose_l, ps.pose_w, ps.pose_h), bool)
           if occupied is None else np.asarray(occupied, bool))
    return PoseSpaceTables(
        x_min=jnp.asarray(ps.x_min, jnp.float32),
        steps=jnp.asarray(ps.steps, jnp.float32),
        shifts=jnp.asarray(POSE_SHIFTS, jnp.int32),
        occupied=jnp.asarray(occ),
    )


def episode_pose_from_idx(idx, tables: PoseSpaceTables, n_elev: int,
                          n_azim: int):
    """Device twin of PoseSpace.pose_from_idx: (..., 5) idx -> (..., 5) pose
    [x, y, z, elev_deg, azim_deg]."""
    idx = jnp.asarray(idx)
    pos = tables.x_min + (idx[..., :3].astype(jnp.float32) + 0.5) * tables.steps
    elev = -90.0 + 180.0 * (1 + idx[..., 3].astype(jnp.float32)) / (n_elev + 1)
    azim = 360.0 * idx[..., 4].astype(jnp.float32) / n_azim
    return jnp.concatenate((pos, elev[..., None], azim[..., None]), axis=-1)


def episode_flat_index(idx, dims: Tuple[int, ...]):
    f = jnp.zeros(idx.shape[:-1], jnp.int32)
    for k in range(5):
        f = f * dims[k] + idx[..., k]
    return f


def episode_neighbors(ep: DeviceEpisode, tables: PoseSpaceTables,
                      dims: Tuple[int, ...]):
    """Neighbor pose candidates of the current pose, on device (reference
    :2059-2084 + get_valid_neighbors :2086-2115 masks).

    Returns (idx (54, 5) int32, new_ok (54,), visited (54,)). Duplicates after
    clamping are left in place (harmless under argmax) but masked out of
    new_ok/visited so gains never select a duplicate over the original."""
    L, W, H, NE, NA = dims
    res = ep.cam_idx[None, :] + tables.shifts  # (54, 5)
    res = res.at[:, 0].set(jnp.clip(res[:, 0], 0, L - 1))
    res = res.at[:, 1].set(jnp.clip(res[:, 1], 0, W - 1))
    res = res.at[:, 2].set(jnp.clip(res[:, 2], 0, H - 1))
    res = res.at[:, 3].set(jnp.clip(res[:, 3], 0, NE - 1))
    res = res.at[:, 4].set(res[:, 4] % NA)
    translating = jnp.abs(res[:, :3] - ep.cam_idx[None, :3]).sum(axis=1) > 0
    # Dedup mask: first occurrence wins (sorted-pairwise compare is O(54^2),
    # trivial at this size)
    same = jnp.all(res[:, None, :] == res[None, :, :], axis=-1)  # (54, 54)
    first = jnp.argmax(same, axis=1) == jnp.arange(res.shape[0])
    ok = translating & first
    flat = episode_flat_index(res, dims)
    visited = ep.visited[flat]
    occ = tables.occupied[res[:, 0], res[:, 1], res[:, 2]]
    new_ok = ok & ~visited & ~occ
    return res, new_ok, ok & visited


def episode_interpolations(ep: DeviceEpisode, new_idx, tables: PoseSpaceTables,
                           n_elev: int, n_azim: int, n_steps: int):
    """All n_steps interpolated (X (K,3), V (K,2)) of a move to new_idx — the
    device twin of Camera.interpolated_poses (reference :2141-2183, azimuth
    wrap included)."""
    old_pose = episode_pose_from_idx(ep.cam_idx, tables, n_elev, n_azim)
    new_pose = episode_pose_from_idx(jnp.asarray(new_idx), tables, n_elev,
                                     n_azim)
    o4, n4 = ep.cam_idx[4], jnp.asarray(new_idx)[4]
    offset = jnp.where((o4 == 0) & (n4 == n_azim - 1), -360.0,
                       jnp.where((o4 == n_azim - 1) & (n4 == 0), 360.0, 0.0))
    a = (jnp.arange(1, n_steps + 1, dtype=jnp.float32) / n_steps)[:, None]
    X = old_pose[None, :3] + (new_pose[None, :3] - old_pose[None, :3]) * a
    V = old_pose[None, 3:] + (new_pose[None, 3:] - old_pose[None, 3:]) * a
    # The azimuth detour applies to intermediate steps only; the final step
    # lands on the canonical pose value (reference update_camera `final`).
    wrap = jnp.where(jnp.arange(1, n_steps + 1)[:, None] == n_steps, 0.0,
                     offset * a)
    V = V.at[:, 1:2].add(wrap)
    return X, V


def episode_commit(ep: DeviceEpisode, new_idx, X, V, R, T,
                   dims: Tuple[int, ...]) -> DeviceEpisode:
    """Apply a completed move: histories, visited flag, current pose state
    (device twin of Camera.commit_move)."""
    new_idx = jnp.asarray(new_idx)
    K = X.shape[0]
    flat = episode_flat_index(new_idx, dims)
    return ep._replace(
        cam_idx=new_idx,
        visited=ep.visited.at[flat].set(True),
        X=X[-1:], V=V[-1:], R=R[-1:], T=T[-1:],
        idx_history=jax.lax.dynamic_update_slice(
            ep.idx_history, new_idx[None], (ep.n_moves, 0)),
        X_history=jax.lax.dynamic_update_slice(ep.X_history, X,
                                               (ep.n_frames, 0)),
        V_history=jax.lax.dynamic_update_slice(ep.V_history, V,
                                               (ep.n_frames, 0)),
        n_moves=ep.n_moves + 1,
        n_frames=ep.n_frames + K,
    )


def init_device_episode(start_idx, tables: PoseSpaceTables, dims,
                        n_elev: int, n_azim: int, max_moves: int,
                        max_frames: int) -> DeviceEpisode:
    """Episode state at a start pose (device twin of Camera.initialize:
    visited flag set, one history entry recorded). start_idx may be a traced
    (5,) int32 — episode init runs inside the start-pose-selection program."""
    start_idx = jnp.asarray(start_idx).astype(jnp.int32)
    pose = episode_pose_from_idx(start_idx, tables, n_elev, n_azim)
    X, V = pose[None, :3], pose[None, 3:]
    R, T = get_camera_RT(X, V)
    n_flat = int(np.prod(dims))
    flat = episode_flat_index(start_idx, tuple(dims))
    return DeviceEpisode(
        cam_idx=start_idx,
        visited=jnp.zeros((n_flat,), bool).at[flat].set(True),
        X=X, V=V, R=R, T=T,
        idx_history=jnp.zeros((max_moves, 5), jnp.int32).at[0].set(start_idx),
        X_history=jnp.zeros((max_frames, 3), jnp.float32).at[0].set(X[0]),
        V_history=jnp.zeros((max_frames, 2), jnp.float32).at[0].set(V[0]),
        n_moves=jnp.asarray(1, jnp.int32),
        n_frames=jnp.asarray(1, jnp.int32),
    )


def episode_random_start(key, tables: PoseSpaceTables, dims, n_elev: int,
                         n_azim: int, verts, proxy_points, H: int, W: int,
                         zfar: float, batch: int = 256,
                         max_attempts: int = 8):
    """Pick a random valid start pose ON DEVICE (device twin of
    Camera.get_random_valid_pose, reference :2019-2051): sample `batch`
    lattice poses, keep the first unoccupied one whose FoV contains mesh AND
    proxy points. The host path rejection-samples until it finds a valid
    pose; here a device while_loop re-samples up to ``max_attempts`` batches
    (no host round-trip), and a degenerate scene (no fully-valid pose in any
    batch) falls back to an UNOCCUPIED pose rather than silently starting
    inside geometry. Returns ((5,) int32 idx, () bool any_valid)."""

    def sample(k):
        ks = jax.random.split(k, 5)
        idx = jnp.stack(
            [jax.random.randint(ks[i], (batch,), 0, int(dims[i]))
             for i in range(5)], axis=-1)
        poses = episode_pose_from_idx(idx, tables, n_elev, n_azim)
        R, T = get_camera_RT(poses[:, :3], poses[:, 3:])
        cams = FoVCamera.create(R, T, zfar=zfar)
        v = jnp.broadcast_to(verts[None], (batch, *verts.shape))
        ok = points_in_fov_mask(v, cams, H, W, fov_range=5 * zfar).any(axis=-1)
        if proxy_points is not None:
            p = jnp.broadcast_to(proxy_points[None],
                                 (batch, *proxy_points.shape))
            ok = ok & points_in_fov_mask(p, cams, H, W,
                                         fov_range=5 * zfar).any(axis=-1)
        unocc = ~tables.occupied[idx[:, 0], idx[:, 1], idx[:, 2]]
        return idx, ok & unocc, unocc

    k0, k_loop = jax.random.split(key)
    idx0, ok0, unocc0 = sample(k0)
    slot0 = jnp.argmax(ok0)  # first valid (argmax returns the first max)
    found0 = jnp.any(ok0)
    # Degenerate-scene fallback: an unoccupied pose (idx0[0] only until one
    # is sampled). Retry batches keep upgrading it while searching.
    fb_ok0 = found0 | jnp.any(unocc0)
    fb = jnp.where(jnp.any(unocc0), idx0[jnp.argmax(unocc0)], idx0[0])
    sel0 = jnp.where(found0, idx0[slot0], fb)

    def cond(carry):
        i, _k, _sel, found, _fb_ok = carry
        return (i < max_attempts) & ~found

    def body(carry):
        i, k, sel, found, fb_ok = carry
        k, sub = jax.random.split(k)
        idx, ok, unocc = sample(sub)
        hit = jnp.any(ok)
        hit_unocc = jnp.any(unocc)
        sel = jnp.where(
            hit & ~found, idx[jnp.argmax(ok)],
            jnp.where(~found & ~fb_ok & hit_unocc,
                      idx[jnp.argmax(unocc)], sel))
        return i + 1, k, sel, found | hit, fb_ok | hit_unocc

    _, _, sel, found, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1), k_loop, sel0, found0, fb_ok0))
    return sel, found


def build_pose_shifts() -> np.ndarray:
    """The neighbor move set: exactly-1-unit translation x <=1-unit rotation
    (reference :1953-1963). Shape (54, 5)."""
    grid = np.stack(np.meshgrid(*([np.arange(-1, 2)] * 5), indexing="ij"),
                    axis=-1).reshape(-1, 5)
    t_ok = np.abs(grid[:, :3]).sum(axis=1) == 1
    r_ok = np.abs(grid[:, 3:]).sum(axis=1) <= 1
    return grid[t_ok & r_ok].astype(np.int32)


POSE_SHIFTS = build_pose_shifts()


@dataclass
class PoseSpace:
    """5-D camera pose lattice (x, y, z, elev, azim) — reference :1940-1976."""

    x_min: np.ndarray
    x_max: np.ndarray
    pose_l: int
    pose_w: int
    pose_h: int
    pose_n_elev: int
    pose_n_azim: int

    def __post_init__(self):
        self.x_min = np.asarray(self.x_min, np.float32)
        self.x_max = np.asarray(self.x_max, np.float32)
        self.steps = (self.x_max - self.x_min) / np.array(
            [self.pose_l, self.pose_w, self.pose_h], np.float32)
        self.dims = np.array(
            [self.pose_l, self.pose_w, self.pose_h, self.pose_n_elev,
             self.pose_n_azim], np.int64)
        self.n_poses = int(np.prod(self.dims))

    def pose_from_idx(self, idx):
        """5-D pose values [x, y, z, elev_deg, azim_deg] for idx (..., 5)."""
        idx = jnp.asarray(idx)
        pos = jnp.asarray(self.x_min) + (idx[..., :3] + 0.5) * jnp.asarray(self.steps)
        elev = -90.0 + 180.0 * (1 + idx[..., 3]) / (self.pose_n_elev + 1)
        azim = 360.0 * idx[..., 4] / self.pose_n_azim
        return jnp.concatenate(
            (pos, elev[..., None], azim[..., None]), axis=-1
        )

    def pose_from_idx_np(self, idx):
        """Host-numpy twin of pose_from_idx for episode bookkeeping — the
        interpolated-move math must not round-trip through the device."""
        idx = np.asarray(idx, np.float32)
        pos = self.x_min + (idx[..., :3] + 0.5) * self.steps
        elev = -90.0 + 180.0 * (1 + idx[..., 3]) / (self.pose_n_elev + 1)
        azim = 360.0 * idx[..., 4] / self.pose_n_azim
        return np.concatenate((pos, elev[..., None], azim[..., None]), axis=-1)

    def flat_index(self, idx):
        idx = np.asarray(idx)
        f = 0
        for k in range(5):
            f = f * self.dims[k] + idx[..., k]
        return f

    def neighbors(self, idx):
        """Neighbor pose indices with clamping/wrap (reference :2059-2084).

        Returns (n, 5) int array (duplicates removed, non-translating removed).
        """
        idx = np.asarray(idx)
        res = idx[None, :] + POSE_SHIFTS
        res[:, 0] = np.clip(res[:, 0], 0, self.pose_l - 1)
        res[:, 1] = np.clip(res[:, 1], 0, self.pose_w - 1)
        res[:, 2] = np.clip(res[:, 2], 0, self.pose_h - 1)
        res[:, 3] = np.clip(res[:, 3], 0, self.pose_n_elev - 1)
        res[:, 4] = res[:, 4] % self.pose_n_azim
        translating = np.abs(res[:, :3] - idx[None, :3]).sum(axis=1) > 0
        res = res[translating]
        return np.unique(res, axis=0)


@dataclass
class Camera:
    """Host-side camera agent over a PoseSpace (reference Camera class).

    Device math (pose->RT, fov tests, capture) lives in pure functions; this
    object tracks the trajectory, pose history, and frame IO.
    """

    pose_space: PoseSpace
    zfar: float
    image_height: int
    image_width: int
    n_interpolation_steps: int = 1
    contrast_factor: float = 1.0
    gathering_factor: float = 0.05
    occupied_poses: Optional[np.ndarray] = None  # (L, W, H) bool
    save_dir_path: Optional[str] = None

    def __post_init__(self):
        self.cam_idx: Optional[np.ndarray] = None
        self.X_cam = None
        self.V_cam = None
        self.fov_camera: Optional[FoVCamera] = None
        self.fov_camera_0: Optional[FoVCamera] = None
        self.cam_idx_history = []
        self.X_cam_history = []
        self.V_cam_history = []
        self.pose_history = np.zeros(self.pose_space.n_poses, bool)
        self.n_frames_captured = 0

    # -- pose management ----------------------------------------------------
    def fov_camera_from_pose(self, pose):
        pose = jnp.asarray(pose).reshape(-1)
        X_cam = pose[:3].reshape(1, 3)
        V_cam = pose[3:].reshape(1, 2)
        R, T = get_camera_RT(X_cam, V_cam)
        return X_cam, V_cam, FoVCamera.create(R, T, zfar=self.zfar)

    def initialize(self, start_cam_idx):
        self.update_camera(np.asarray(start_cam_idx))
        self.fov_camera_0 = self.fov_camera

    def update_camera(self, new_cam_idx, interpolation_step: Optional[int] = None):
        """Move (with pose interpolation + azimuth wrap, reference :2141-2183)."""
        ps = self.pose_space
        n_steps = self.n_interpolation_steps
        if interpolation_step is None:
            interpolation_step = n_steps
        final = interpolation_step == n_steps

        if self.cam_idx is None:
            old_idx = np.asarray(new_cam_idx)
        else:
            old_idx = self.cam_idx
        old_pose = ps.pose_from_idx_np(old_idx)
        new_pose = ps.pose_from_idx_np(new_cam_idx)

        offset_azim = 0.0
        if not final:
            if old_idx[4] == 0 and np.asarray(new_cam_idx)[4] == ps.pose_n_azim - 1:
                offset_azim = -360.0
            elif old_idx[4] == ps.pose_n_azim - 1 and np.asarray(new_cam_idx)[4] == 0:
                offset_azim = 360.0

        a = interpolation_step / n_steps
        X = old_pose[:3] + (new_pose[:3] - old_pose[:3]) * a
        V = old_pose[3:] + (new_pose[3:] - old_pose[3:]) * a
        V = V.copy()
        V[1] += offset_azim * a

        if final:
            self.cam_idx = np.asarray(new_cam_idx)
            self.cam_idx_history.append(np.asarray(new_cam_idx))
            self.pose_history[ps.flat_index(new_cam_idx)] = True

        self.X_cam = jnp.asarray(X).reshape(1, 3)
        self.V_cam = jnp.asarray(V).reshape(1, 2)
        self.X_cam_history.append(np.asarray(self.X_cam))
        self.V_cam_history.append(np.asarray(self.V_cam))
        R, T = get_camera_RT(self.X_cam, self.V_cam)
        self.fov_camera = FoVCamera.create(R, T, zfar=self.zfar)

    def get_neighboring_poses(self, pose_idx=None):
        if pose_idx is None:
            pose_idx = self.cam_idx
        return self.pose_space.neighbors(pose_idx)

    def pose_is_occupied(self, pose_idx) -> bool:
        if self.occupied_poses is None:
            return False
        i = np.asarray(pose_idx)
        return bool(self.occupied_poses[i[0], i[1], i[2]])

    def is_fov_empty(self, verts, fov_camera=None) -> bool:
        """No mesh vertex in the field of view (reference :2266-2292)."""
        cam = fov_camera if fov_camera is not None else self.fov_camera
        mask = points_in_fov_mask(verts[None], cam, self.image_height,
                                  self.image_width, fov_range=5 * self.zfar)
        return not bool(mask.any())

    def pose_is_valid(self, verts, pose_idx, proxy_points=None) -> bool:
        if self.pose_is_occupied(pose_idx):
            return False
        pose = self.pose_space.pose_from_idx(jnp.asarray(pose_idx))
        _, _, cam = self.fov_camera_from_pose(pose)
        if self.is_fov_empty(verts, cam):
            return False
        if proxy_points is not None:
            m = points_in_fov_mask(proxy_points[None], cam, self.image_height,
                                   self.image_width, fov_range=5 * self.zfar)
            if not bool(m.any()):
                return False
        return True

    def _batch_validity(self, pose_indices: np.ndarray, verts,
                        proxy_points=None) -> np.ndarray:
        """Validity of MANY pose indices in one device launch (the per-pose
        python loop over pose_is_valid costs ~3 launches + a host sync per
        neighbor — batched, a whole neighbor set is one launch + one sync)."""
        idx = np.asarray(pose_indices).reshape(-1, 5)
        n_real = idx.shape[0]
        # Pad to a static batch so the launch compiles once (neighbor counts
        # vary 5..54 per pose)
        pad = (-n_real) % 64
        if pad:
            idx = np.concatenate([idx, np.repeat(idx[:1], pad, axis=0)])
        poses = self.pose_space.pose_from_idx(jnp.asarray(idx))
        R, T = get_camera_RT(poses[:, :3], poses[:, 3:])
        cams = FoVCamera.create(R, T, zfar=self.zfar)
        B = idx.shape[0]
        v = jnp.broadcast_to(jnp.asarray(verts)[None],
                             (B, *np.shape(verts)))
        ok = points_in_fov_mask(v, cams, self.image_height, self.image_width,
                                fov_range=5 * self.zfar).any(axis=-1)
        if proxy_points is not None:
            p = jnp.broadcast_to(jnp.asarray(proxy_points)[None],
                                 (B, *np.shape(proxy_points)))
            ok = ok & points_in_fov_mask(
                p, cams, self.image_height, self.image_width,
                fov_range=5 * self.zfar).any(axis=-1)
        # The whole neighbor set's validity comes home in ONE sanctioned pull
        with jax.transfer_guard_device_to_host("allow"):
            ok = np.asarray(ok)
        if self.occupied_poses is not None:
            occ = self.occupied_poses[idx[:, 0], idx[:, 1], idx[:, 2]]
            ok = ok & ~np.asarray(occ)
        return ok[:n_real]

    def get_valid_neighbors(self, neighbor_indices, verts):
        """Valid unvisited neighbors; falls back to visited ones
        (reference :2086-2115). Validity of the whole neighbor set is one
        batched device call."""
        idx = np.asarray(neighbor_indices).reshape(-1, 5)
        flat = self.pose_space.flat_index(idx)
        visited_m = self.pose_history[flat]
        unvisited = idx[~visited_m]
        new_valid = (unvisited[self._batch_validity(unvisited, verts)]
                     if len(unvisited) else unvisited)
        chosen = new_valid if len(new_valid) else idx[visited_m]
        return np.array(chosen).reshape(-1, 5)

    def get_random_valid_pose(self, rs: np.random.Generator, verts,
                              proxy_points=None, max_tries: int = 1000,
                              batch: int = 64):
        """Rejection-sample a valid start pose (reference :2019-2051), testing
        `batch` candidates per launch."""
        ps = self.pose_space
        for _ in range(max(1, max_tries // batch)):
            idx = np.stack([rs.integers(0, d, size=batch) for d in ps.dims],
                           axis=-1).astype(np.int64)
            ok = self._batch_validity(idx, verts, proxy_points=proxy_points)
            hits = np.flatnonzero(ok)
            if hits.size:
                return idx[hits[0]]
        raise RuntimeError("no valid pose found")

    # -- capture ------------------------------------------------------------
    def capture_image(self, verts, faces, vert_colors=None, fov_camera=None,
                      lights: Optional[PointLights] = None,
                      ambient_light_intensity: float = 1.0,
                      texture_atlas=None):
        """Render RGB + zbuf from the current camera (reference :2294-2337).

        Returns (images (1, H, W, 3), depth (1, H, W, 1), mask (1, H, W, 1)).
        The frame dict (rgb, zbuf, mask, R, T, zfar) matches the reference's
        saved frame schema; persistence is handled by scene.memory.
        """
        cam = fov_camera if fov_camera is not None else self.fov_camera
        images, depth, mask = _capture_program(
            verts, faces, vert_colors, texture_atlas, cam.R, cam.T,
            self.image_height, self.image_width, float(cam.zfar.reshape(-1)[0]),
            float(self.contrast_factor), float(ambient_light_intensity))
        self.n_frames_captured += int(cam.R.shape[0])
        return images, depth, mask

    def interpolated_poses(self, new_cam_idx) -> Tuple[np.ndarray, np.ndarray]:
        """Host-numpy (X (K,3), V (K,2)) for all n_interpolation_steps of a
        move to new_cam_idx (the per-step math of update_camera, reference
        :2141-2183), WITHOUT touching the device — the fused capture program
        consumes the whole batch in one launch."""
        ps = self.pose_space
        n_steps = self.n_interpolation_steps
        old_idx = (np.asarray(new_cam_idx) if self.cam_idx is None
                   else self.cam_idx)
        old_pose = ps.pose_from_idx_np(old_idx)
        new_pose = ps.pose_from_idx_np(new_cam_idx)
        offset_azim = 0.0
        if old_idx[4] == 0 and np.asarray(new_cam_idx)[4] == ps.pose_n_azim - 1:
            offset_azim = -360.0
        elif (old_idx[4] == ps.pose_n_azim - 1
              and np.asarray(new_cam_idx)[4] == 0):
            offset_azim = 360.0
        Xs, Vs = [], []
        for step in range(1, n_steps + 1):
            a = step / n_steps
            X = old_pose[:3] + (new_pose[:3] - old_pose[:3]) * a
            V = (old_pose[3:] + (new_pose[3:] - old_pose[3:]) * a).copy()
            if step != n_steps:
                V[1] += offset_azim * a
            Xs.append(X)
            Vs.append(V)
        return (np.stack(Xs).astype(np.float32),
                np.stack(Vs).astype(np.float32))

    def commit_move(self, new_cam_idx, X_interp: np.ndarray,
                    V_interp: np.ndarray, R_dev, T_dev):
        """Episode bookkeeping for a completed interpolated move: histories,
        pose lattice state, and the new fov_camera built from the capture
        program's (K,3,3)/(K,3) extrinsics (no extra device math)."""
        ps = self.pose_space
        for i in range(X_interp.shape[0]):
            self.X_cam_history.append(X_interp[i : i + 1].copy())
            self.V_cam_history.append(V_interp[i : i + 1].copy())
        self.cam_idx = np.asarray(new_cam_idx)
        self.cam_idx_history.append(np.asarray(new_cam_idx))
        self.pose_history[ps.flat_index(new_cam_idx)] = True
        self.X_cam = jnp.asarray(X_interp[-1:])
        self.V_cam = jnp.asarray(V_interp[-1:])
        self.fov_camera = FoVCamera.create(R_dev[-1:], T_dev[-1:],
                                           zfar=self.zfar)
        self.n_frames_captured += int(X_interp.shape[0])

    def neighbor_candidates(self, bucket: int = 64):
        """Padded candidate table for the fused decision program.

        Returns (neighbor_idx (n,5) int, poses (B,5) f32, new_ok (B,),
        visited (B,)) where B is the smallest multiple of `bucket` >= n.
        new_ok marks unvisited, non-occupied neighbors (their final validity —
        a non-empty FoV — is checked on device inside the decision program);
        visited marks the fallback set (reference get_valid_neighbors
        :2086-2115)."""
        idx = np.asarray(self.get_neighboring_poses()).reshape(-1, 5)
        ps = self.pose_space
        flat = ps.flat_index(idx)
        visited = self.pose_history[flat]
        occupied = np.zeros((idx.shape[0],), bool)
        if self.occupied_poses is not None:
            occupied = np.asarray(
                self.occupied_poses[idx[:, 0], idx[:, 1], idx[:, 2]]
            ).astype(bool)
        new_ok = ~visited & ~occupied
        poses = (np.stack([ps.pose_from_idx_np(i) for i in idx])
                 .astype(np.float32) if idx.shape[0]
                 else np.zeros((0, 5), np.float32))
        n = idx.shape[0]
        B = max(bucket, ((n + bucket - 1) // bucket) * bucket)
        pad = B - n
        if pad:
            filler = poses[:1] if n else np.zeros((1, 5), np.float32)
            poses = np.concatenate([poses, np.repeat(filler, pad, axis=0)])
            new_ok = np.concatenate([new_ok, np.zeros((pad,), bool)])
            visited = np.concatenate([visited, np.zeros((pad,), bool)])
        return idx, poses, new_ok, visited
