"""View-state histograms and their harmonic features (SCONE runtime core).

Rebuilds reference scone_utils.py:714-960: per-point binary histograms of visited
view directions over a discretized (n_elev x n_azim) sphere grid, the
"rotation" of those histograms into a camera frame, and their projection onto
the spherical-harmonics basis via an L2 inner product on the sphere.

Parity notes: the reference uses torch.floor_divide (which TRUNCATES toward zero
in torch 1.7) plus a positive modulo for nearest-bin rounding, and asymmetric
clamping that differs between compute_view_state (scone_utils.py:838-841) and
move_view_state_to_view_space (:917-920). Both quirks are replicated exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import (
    FoVCamera,
    get_cartesian_coords,
    get_spherical_coords,
)
from .harmonics import real_spherical_harmonics


def _trunc_div(x, step):
    """torch-1.7 floor_divide semantics: truncation toward zero."""
    return jnp.trunc(x / step)


def sphere_grid_angles(n_elev: int, n_azim: int):
    """The canonical (elev, azim) grid in radians, flattened elev-major.

    elev_i = -pi/2 + (i+1)/(n_elev+1)*pi; azim_j = 2*pi*j/n_azim
    (reference scone_utils.py:723-727).
    """
    elev = np.array(
        [-np.pi / 2 + (i + 1) / (n_elev + 1) * np.pi for i in range(n_elev)
         for _ in range(n_azim)]
    )
    azim = np.array([2 * np.pi * j / n_azim for _ in range(n_elev)
                     for j in range(n_azim)])
    return jnp.asarray(elev, jnp.float32), jnp.asarray(azim, jnp.float32)


def get_all_harmonics_under_degree(degree: int, n_elev: int, n_azim: int):
    """Harmonic basis evaluated on the sphere grid (reference scone_utils.py:714-738).

    Returns (base_harmonics (degree^2, n_elev*n_azim), h_polar, h_azim) as
    HOST numpy arrays: these are constant tables that get closed over by
    jitted programs, and capturing committed device arrays degrades the
    runtime's async dispatch (see ops.harmonics.real_spherical_harmonics_np).
    """
    from .harmonics import real_spherical_harmonics_np

    elev = np.array(
        [-np.pi / 2 + (i + 1) / (n_elev + 1) * np.pi for i in range(n_elev)
         for _ in range(n_azim)], np.float64)
    h_azim = np.array([2 * np.pi * j / n_azim for _ in range(n_elev)
                       for j in range(n_azim)], np.float64)
    h_polar = -elev + np.pi / 2
    z = real_spherical_harmonics_np(h_polar, h_azim, degree=degree)
    return (z.T.astype(np.float32), h_polar.astype(np.float32),
            h_azim.astype(np.float32))


def get_cameras_on_sphere(n_elev: int, n_azim: int, camera_dist: float,
                          pole_cameras: bool = False):
    """Candidate camera positions on a sphere (reference scone_utils.py:741-785).

    Returns (X_cam (n_cam, 3), dist, elev_deg, azim_deg)."""
    elev = [-90.0 + (i + 1) / (n_elev + 1) * 180.0 for i in range(n_elev)
            for _ in range(n_azim)]
    azim = [360.0 * j / n_azim for _ in range(n_elev) for j in range(n_azim)]
    if pole_cameras:
        elev = [-89.9] + elev + [89.9]
        azim = [0.0] + azim + [0.0]
    elev = jnp.asarray(elev, jnp.float32)
    azim = jnp.asarray(azim, jnp.float32)
    dist = jnp.full_like(elev, camera_dist)
    X_cam = get_cartesian_coords(dist, elev, azim, in_degrees=True)
    return X_cam, dist, elev, azim


def normalize_points_in_prediction_box(points, center, diag):
    """(points - center) / diag (reference scone_utils.py:790-797)."""
    return (points - center) / diag


def _bin_directions(ray_elev, ray_azim, n_elev: int, n_azim: int,
                    elev_upper_clamp: int):
    """Shared nearest-bin index computation, bit-exact with the reference's
    rounding/clamping quirks (torch-1.7 trunc floor_divide, asymmetric clamps,
    below-pole wrap — scone_utils.py:825-849 and :908-925).

    elev_upper_clamp: n_elev - 1 for compute_view_state's asymmetric clamp
    (applied to raw idx >= n_elev), or n_elev // 2 for the view-space variant.
    Returns flat bin indices in [0, n_elev*n_azim).
    """
    elev_step = np.pi / (n_elev + 1)
    azim_step = 2 * np.pi / n_azim

    idx_elev = _trunc_div(ray_elev, elev_step)
    idx_azim = _trunc_div(ray_azim, azim_step)
    idx_elev = jnp.where(jnp.mod(ray_elev, elev_step) > elev_step / 2.0,
                         idx_elev + 1, idx_elev)
    idx_azim = jnp.where(jnp.mod(ray_azim, azim_step) > azim_step / 2.0,
                         idx_azim + 1, idx_azim)

    if elev_upper_clamp == n_elev - 1:
        # compute_view_state variant (reference scone_utils.py:840-849):
        # the lower clamp is `-n_elev // 2` — PYTHON FLOOR division, i.e. -4
        # for n_elev=7, one below the bottom row. After the +n_elev//2 shift
        # that row lands at -1 and the reference's explicit `indices %=
        # n_candidates` WRAPS it into the top elevation rows; the final mod
        # below reproduces exactly that.
        idx_elev = jnp.where(idx_elev >= n_elev, n_elev - 1, idx_elev)
        lower = -((n_elev + 1) // 2)  # floor(-n_elev / 2)
    else:
        # view-space variant (reference scone_utils.py:916-918) parenthesizes:
        # -(n_elev // 2) = -3, symmetric
        idx_elev = jnp.where(idx_elev > elev_upper_clamp, elev_upper_clamp, idx_elev)
        lower = -(n_elev // 2)
    idx_elev = jnp.where(idx_elev < lower, lower, idx_elev)
    idx_azim = jnp.where(idx_azim > n_azim // 2, -(n_azim // 2), idx_azim)

    idx_elev = idx_elev + n_elev // 2
    idx_azim = jnp.where(idx_azim < 0, idx_azim + n_azim, idx_azim)

    indices = idx_elev.astype(jnp.int32) * n_azim + idx_azim.astype(jnp.int32)
    return jnp.mod(indices, n_elev * n_azim)


@partial(jax.jit, static_argnames=("n_elev", "n_azim"))
def compute_view_state(pts, X_view, n_elev: int, n_azim: int, view_mask=None):
    """Binary histogram of visited view directions per point.

    pts (n_cloud, L, >=3); X_view (n_view, 3) shared camera positions, or
    (n_cloud, n_view, 3) per-cloud; view_mask (n_view,) or (n_cloud, n_view)
    zeroes out padded views (fixed-shape batching).
    Returns (n_cloud, L, n_elev*n_azim) (reference scone_utils.py:799-860).
    """
    X_pts = pts[..., :3]
    if X_view.ndim == 2:
        rays = X_view[None, None, :, :] - X_pts[:, :, None, :]  # (B, L, V, 3)
    else:
        rays = X_view[:, None, :, :] - X_pts[:, :, None, :]
    _, ray_elev, ray_azim = get_spherical_coords(rays)
    indices = _bin_directions(ray_elev, ray_azim, n_elev, n_azim,
                              elev_upper_clamp=n_elev - 1)  # (B, L, V)
    n_candidates = n_elev * n_azim
    one_hot = jax.nn.one_hot(indices, n_candidates, dtype=jnp.float32)
    if view_mask is not None:
        if view_mask.ndim == 1:
            one_hot = one_hot * view_mask[None, None, :, None]
        else:
            one_hot = one_hot * view_mask[:, None, :, None]
    return jnp.minimum(jnp.sum(one_hot, axis=-2), 1.0)


def update_view_state(view_state, pts, X_view, n_elev: int, n_azim: int,
                      pts_mask=None):
    """Incremental OR-accumulation of new views into an existing view state."""
    new = compute_view_state(pts, X_view, n_elev, n_azim)
    if pts_mask is not None:
        new = new * pts_mask[..., None]
    return jnp.maximum(view_state, new)


def view_space_permutation(camera: FoVCamera, n_elev: int, n_azim: int):
    """Gather indices that rotate a view state into `camera`'s view frame.

    (reference scone_utils.py:863-930). Returns (n_elev*n_azim,) int32."""
    elev, azim = sphere_grid_angles(n_elev, n_azim)
    X_ref = get_cartesian_coords(jnp.ones_like(elev), elev, azim)
    world = camera.view_to_world(X_ref[None])[0]
    dirs = world - camera.camera_center()
    dirs = dirs.reshape(-1, 3)
    _, ray_elev, ray_azim = get_spherical_coords(dirs)
    return _bin_directions(ray_elev, ray_azim, n_elev, n_azim,
                           elev_upper_clamp=n_elev // 2)


def move_view_state_to_view_space(view_state, camera: FoVCamera, n_elev: int,
                                  n_azim: int):
    """Permutation-gather of the histogram into the camera frame."""
    indices = view_space_permutation(camera, n_elev, n_azim)
    return jnp.take(view_state, indices, axis=-1)


def compute_view_harmonics(view_state, base_harmonics, h_polar, n_elev: int,
                           n_azim: int):
    """Project histograms onto the SH basis: spherical L2 inner product.

    view_state (B, L, n_values); base_harmonics (H, n_values); h_polar (n_values,).
    Returns (B, L, H) (reference scone_utils.py:934-960)."""
    polar_step = np.pi / (n_elev + 1)
    azim_step = 2 * np.pi / n_azim
    weights = base_harmonics * jnp.sin(h_polar)[None, :] * polar_step * azim_step
    return jnp.einsum("blv,hv->blh", view_state, weights)


def filter_proxy_points_mask(view_cameras: FoVCamera, X, pc, filter_tol: float = 0.01,
                             pc_mask=None, view_mask=None):
    """Mask of proxy points inside the projected bbox of the observed cloud.

    Fixed-shape version of reference scone_utils.py:1001-1027 (returns the mask
    instead of filtering): keep X whose projections lie within
    [min(pc_proj)-tol, max(pc_proj)+tol] for EVERY view camera.
    X (N, 3); pc (M, 3); view_cameras batched (n_view,).
    """
    X_proj = view_cameras.transform_points(
        jnp.broadcast_to(X[None], (view_cameras.R.shape[0], *X.shape))
    )[..., :2]
    pc_proj = view_cameras.transform_points(
        jnp.broadcast_to(pc[None], (view_cameras.R.shape[0], *pc.shape))
    )[..., :2]
    if pc_mask is not None:
        big = 1e10
        max_proj = jnp.max(jnp.where(pc_mask[None, :, None], pc_proj, -big), axis=-2,
                           keepdims=True)
        min_proj = jnp.min(jnp.where(pc_mask[None, :, None], pc_proj, big), axis=-2,
                           keepdims=True)
    else:
        max_proj = jnp.max(pc_proj, axis=-2, keepdims=True)
        min_proj = jnp.min(pc_proj, axis=-2, keepdims=True)
    ok = (X_proj < max_proj + filter_tol) & (X_proj > min_proj - filter_tol)
    if view_mask is not None:
        # Padded view cameras constrain nothing.
        ok = ok | ~view_mask[:, None, None]
    return jnp.all(ok, axis=(0, -1))


def sample_proxy_points(key, X_world, preds, view_harmonics, n_sample: int,
                        min_occ: float, use_occ_to_sample: bool = True,
                        valid_mask=None):
    """Occupancy-weighted Monte-Carlo sampling of proxy points, fixed shape.

    TPU redesign of reference scone_utils.py:1030-1076: instead of
    multinomial -> unique -> inverse-index resampling (dynamic shapes), we sample
    n_sample indices WITH repeats via inverse-CDF. Repeated points contribute
    multiple times to downstream sums, which is exactly the MC estimate the
    reference reconstructs through its inverse indices — same expectation, one
    fixed shape.

    Returns (pts4 (n_sample, 4) [xyz+occ], harmonics (n_sample, H), idx, mask).
    mask is False only if no point passes min_occ.
    """
    occ = preds[..., 0]
    sel = occ > min_occ
    if valid_mask is not None:
        sel = sel & valid_mask
    if use_occ_to_sample:
        probs = jnp.where(sel, occ, 0.0)
        total = jnp.sum(probs)
        safe = jnp.where(total > 0, probs, jnp.ones_like(probs))
        cdf = jnp.cumsum(safe)
        cdf = cdf / cdf[-1]
        u = jax.random.uniform(key, (n_sample,))
        idx = jnp.clip(jnp.searchsorted(cdf, u), 0, occ.shape[0] - 1)
        mask = jnp.broadcast_to(total > 0, (n_sample,)) & sel[idx]
    else:
        # take the first n_sample valid entries (reference :1059-1067)
        order = jnp.argsort(~sel)  # valid first, stable
        idx = order[:n_sample]
        mask = sel[idx]
    pts4 = jnp.concatenate((X_world[idx], preds[idx]), axis=-1)
    return pts4, view_harmonics[idx], idx, mask
