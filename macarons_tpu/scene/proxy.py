"""Proxy-point field: occupancy probabilities, view states, carving counters.

TPU rebuild of the reference Scene's flat proxy state (macarons_utils.py:
2786-2985): one fixed-shape pytree of per-point arrays, updated by masked
jit kernels — no boolean indexing, no host loops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import pairwise_sqdist
from ..ops.view_state import compute_view_state


class ProxyState(NamedTuple):
    """All per-proxy-point state (N fixed)."""

    points: jnp.ndarray  # (N, 3)
    proba: jnp.ndarray  # (N, 1) predicted occupancy
    supervision_occ: jnp.ndarray  # (N, 1) carving pseudo-GT
    view_states: jnp.ndarray  # (N, n_elev*n_azim)
    out_of_field: jnp.ndarray  # (N, 1) 1 = never seen
    n_inside_fov: jnp.ndarray  # (N, 1)
    n_behind_depth: jnp.ndarray  # (N, 1)


def initialize_proxy_points(key, x_min, x_max, n_proxy_points: int,
                            n_view_state_cameras: int = 98,
                            default_proba: float = 0.5) -> ProxyState:
    """Uniform box sampling + default state (reference :2788-2799)."""
    x_min = jnp.asarray(x_min)
    x_max = jnp.asarray(x_max)
    pts = x_min + (x_max - x_min) * jax.random.uniform(key, (n_proxy_points, 3))
    N = n_proxy_points
    return ProxyState(
        points=pts,
        proba=jnp.full((N, 1), default_proba),
        supervision_occ=jnp.ones((N, 1)),
        view_states=jnp.zeros((N, n_view_state_cameras)),
        out_of_field=jnp.ones((N, 1)),
        n_inside_fov=jnp.zeros((N, 1)),
        n_behind_depth=jnp.zeros((N, 1)),
    )


def initialize_proxy_points_np(seed: int, x_min, x_max, n_proxy_points: int,
                               n_view_state_cameras: int = 98,
                               default_proba: float = 0.5):
    """Host-numpy twin of initialize_proxy_points: the trainer builds the cell
    index table from the SAME host copy of the points, so scene setup never
    reads the device array back (any d2h permanently degrades the tunneled
    runtime to synchronous dispatch — ROADMAP "CRITICAL runtime facts").
    numpy's seeded default_rng is stable across processes, so snapshot
    layouts survive restarts. Returns (ProxyState, points_np)."""
    x_min = np.asarray(x_min, np.float32)
    x_max = np.asarray(x_max, np.float32)
    rs = np.random.default_rng(seed)
    pts_np = (x_min + (x_max - x_min)
              * rs.random((n_proxy_points, 3), np.float32))
    N = n_proxy_points
    state = ProxyState(
        points=jnp.asarray(pts_np),
        proba=jnp.full((N, 1), default_proba),
        supervision_occ=jnp.ones((N, 1)),
        view_states=jnp.zeros((N, n_view_state_cameras)),
        out_of_field=jnp.ones((N, 1)),
        n_inside_fov=jnp.zeros((N, 1)),
        n_behind_depth=jnp.zeros((N, 1)),
    )
    return state, pts_np


def distance_between_proxy_points(x_min, x_max, n_proxy_points: int) -> float:
    """Typical proxy spacing (reference :2667-2673)."""
    vol = float(np.prod(np.asarray(x_max) - np.asarray(x_min)))
    radius = (3 * (vol / n_proxy_points) / (4 * np.pi)) ** (1.0 / 3.0)
    return 2 * radius


@partial(jax.jit, static_argnames=("n_elev", "n_azim"))
def update_view_states(state: ProxyState, X_cam, fov_mask,
                       n_elev: int, n_azim: int,
                       signed_distances=None, distance_to_surface=None):
    """OR-accumulate the camera direction bin for points in fov_mask.

    If signed_distances (N, 1) given, only points with sd < distance_to_surface
    update (reference update_proxy_view_states :2818-2877).
    """
    update = fov_mask
    if signed_distances is not None:
        update = update & (signed_distances[..., 0] < distance_to_surface)
    vs = compute_view_state(
        state.points[None], jnp.atleast_2d(X_cam), n_elev, n_azim
    )[0]
    new = jnp.where(update[:, None], jnp.maximum(state.view_states, vs),
                    state.view_states)
    return state._replace(view_states=new)


@jax.jit
def update_out_of_field(state: ProxyState, fov_mask):
    """Mark points seen at least once (reference :2879-2886)."""
    oof = jnp.where(fov_mask[:, None], 0.0, state.out_of_field)
    return state._replace(out_of_field=oof)


@jax.jit
def update_supervision_occ(state: ProxyState, fov_mask, signed_distances,
                           score_threshold: float = 1.0, tol: float = 0.0):
    """Score-based carving update (reference update_proxy_supervision_occ
    :2888-2913): per point, count fov hits and behind-depth hits; occupied iff
    behind/inside >= score_threshold."""
    inc_in = fov_mask[:, None].astype(state.n_inside_fov.dtype)
    behind = (signed_distances >= -tol) & fov_mask[:, None]
    n_in = state.n_inside_fov + inc_in
    n_behind = state.n_behind_depth + behind.astype(state.n_behind_depth.dtype)
    ratio = n_behind / jnp.maximum(n_in, 1)
    occ = jnp.where(
        fov_mask[:, None], (ratio >= score_threshold).astype(state.supervision_occ.dtype),
        state.supervision_occ,
    )
    return state._replace(
        n_inside_fov=n_in, n_behind_depth=n_behind, supervision_occ=occ
    )


def reset_supervision_occ(state: ProxyState):
    return state._replace(
        supervision_occ=jnp.ones_like(state.supervision_occ),
        n_inside_fov=jnp.zeros_like(state.n_inside_fov),
        n_behind_depth=jnp.zeros_like(state.n_behind_depth),
    )


@partial(jax.jit, static_argnames=("n_interpolation_steps", "collision_n_threshold",
                                   "oof_collides"))
def camera_collides(state: ProxyState, x_min, x_max, X_current, X_target,
                    proxy_distance: float,
                    n_interpolation_steps: int = 4,
                    oof_collides: bool = False,
                    collision_n_threshold: int = 12):
    """Ray-vs-occupied-proxy collision test (reference camera_collides
    :2944-2985): occupied (carved, in-field) proxy points within proxy_distance
    of the interpolated camera path; colliding iff count > threshold. Targets
    outside the scene bbox never collide."""
    in_bbox = jnp.all((X_target >= jnp.asarray(x_min))
                      & (X_target <= jnp.asarray(x_max)))
    t = jnp.linspace(0.0, 1.0, n_interpolation_steps)[:, None]
    ray = X_current[None, :] + t * (X_target - X_current)[None, :]
    d2 = pairwise_sqdist(state.points, ray)
    close = jnp.min(d2, axis=-1) < proxy_distance**2
    carved = state.supervision_occ[:, 0] > 0.0
    oof = state.out_of_field[:, 0] > 0.0
    if oof_collides:
        hit = (oof | carved) & close
    else:
        hit = (carved & ~oof) & close
    return in_bbox & (jnp.sum(hit) > collision_n_threshold)
