"""Fixed-shape masked voxel scene store — the TPU 'Scene'/'Cell' (SURVEY.md §7.1).

The reference keeps a python dict of per-cell tensors with dynamic point counts
(macarons_utils.py:2503-3088). Here the whole grid is one padded device tensor
`(n_cells, capacity, 3[+F])` plus a validity mask, and every operation —
fill with resolution dedup + random eviction, coverage gain, scene coverage —
is a jit-compiled fixed-shape kernel. Host code never loops over cells.

Semantics matched to the reference:
- fill: candidate points are deduplicated against EXISTING cell points only
  (min distance > resolution, Cell.fill :2566-2571), then a RANDOM subset of the
  union (old + new) of size <= capacity survives (:2573-2575 randperm eviction).
- capacity/resolution coupling: same area heuristic (Cell.__init__ :2517-2538).
- coverage gain: per stored surface point, covered iff within epsilon of the
  partial cloud; gain counts newly covered points (features store coveredness)
  (:2987-3029).
- scene coverage: GT points matched only against recovered points in the SAME
  cell (:3031-3056) — boundary semantics preserved.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import pairwise_sqdist

_BIG = 1e9


class GridConfig(NamedTuple):
    """Static grid geometry (hashable; safe as a jit static arg)."""

    x_min: Tuple[float, float, float]
    x_max: Tuple[float, float, float]
    grid_l: int
    grid_w: int
    grid_h: int
    capacity: int
    resolution: float
    feature_dim: int = 0

    @property
    def n_cells(self) -> int:
        return self.grid_l * self.grid_w * self.grid_h

    @property
    def cell_size(self):
        mn = np.array(self.x_min)
        mx = np.array(self.x_max)
        return (mx - mn) / np.array([self.grid_l, self.grid_w, self.grid_h])

    def cell_centers(self):
        mn = jnp.asarray(self.x_min)
        sz = jnp.asarray(self.cell_size)
        ii = jnp.stack(
            jnp.meshgrid(
                jnp.arange(self.grid_l), jnp.arange(self.grid_w),
                jnp.arange(self.grid_h), indexing="ij",
            ),
            axis=-1,
        ).reshape(-1, 3)
        return mn + (ii + 0.5) * sz


def make_grid_config(x_min, x_max, grid_l, grid_w, grid_h,
                     capacity: Optional[int] = None,
                     resolution: Optional[float] = None,
                     feature_dim: int = 0) -> GridConfig:
    """Derive capacity<->resolution with the reference's area heuristic
    (Cell.__init__, macarons_utils.py:2513-2539)."""
    mn = np.asarray(x_min, np.float64)
    mx = np.asarray(x_max, np.float64)
    l, w, h = (mx - mn) / np.array([grid_l, grid_w, grid_h])
    a1 = l * np.sqrt(w**2 + h**2)
    a2 = w * np.sqrt(h**2 + l**2)
    a3 = h * np.sqrt(l**2 + w**2)
    area = max(a1, a2, a3)
    if resolution is None:
        if capacity is None:
            raise ValueError("need capacity or resolution")
        radius = np.sqrt((area / capacity) / np.pi)
        resolution = 2 * radius
    elif capacity is None:
        radius = resolution / 2.0
        capacity = int(area // (np.pi * radius**2))
    return GridConfig(tuple(np.asarray(x_min, float)), tuple(np.asarray(x_max, float)),
                      grid_l, grid_w, grid_h, int(capacity), float(resolution),
                      feature_dim)


class GridState(NamedTuple):
    """Device state: points (C, K, 3), features (C, K, F), valid (C, K)."""

    points: jnp.ndarray
    features: jnp.ndarray
    valid: jnp.ndarray


def empty_grid(cfg: GridConfig) -> GridState:
    C, K, F = cfg.n_cells, cfg.capacity, cfg.feature_dim
    return GridState(
        jnp.zeros((C, K, 3)), jnp.zeros((C, K, max(F, 1))),
        jnp.zeros((C, K), bool),
    )


@partial(jax.jit, static_argnames=("cfg",))
def cell_index(cfg: GridConfig, pts):
    """Flat cell id for each point (clamped like reference :2693-2712)."""
    mn = jnp.asarray(cfg.x_min)
    sz = jnp.asarray(cfg.cell_size)
    idx = jnp.floor((pts - mn) / sz).astype(jnp.int32)
    dims = jnp.array([cfg.grid_l, cfg.grid_w, cfg.grid_h])
    idx = jnp.clip(idx, 0, dims - 1)
    return (idx[..., 0] * cfg.grid_w + idx[..., 1]) * cfg.grid_h + idx[..., 2]


@partial(jax.jit, static_argnames=("cfg",))
def in_bounding_box(cfg: GridConfig, pts):
    mn = jnp.asarray(cfg.x_min)
    mx = jnp.asarray(cfg.x_max)
    return jnp.all((pts >= mn) & (pts <= mx), axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def fill_cells(cfg: GridConfig, state: GridState, key, pts, pts_mask=None,
               features=None):
    """Insert points (P, 3) into the grid (reference Scene.fill_cells + Cell.fill).

    Fixed shape: P is static; invalid entries are masked. Steps:
    1. mask to bbox; 2. dedup each point against the existing points of its cell
    (min dist > resolution); 3. rank incoming points per cell (pre-shuffled, so
    overflow drop is random); 4. scatter into a staging buffer; 5. per cell keep
    a RANDOM capacity-subset of old+new (the reference's randperm eviction).
    """
    P = pts.shape[0]
    C, K = cfg.n_cells, cfg.capacity
    F = state.features.shape[-1]
    if features is None:
        features = jnp.zeros((P, F), state.features.dtype)
    if pts_mask is None:
        pts_mask = jnp.ones((P,), bool)
    k_shuffle, k_evict = jax.random.split(key)

    ok = pts_mask & in_bounding_box(cfg, pts)
    cid = cell_index(cfg, pts)

    # Dedup vs existing points of the point's own cell.
    cell_pts = state.points[cid]  # (P, K, 3)
    cell_valid = state.valid[cid]  # (P, K)
    d2 = jnp.sum((pts[:, None, :] - cell_pts) ** 2, axis=-1)
    d2 = jnp.where(cell_valid, d2, _BIG)
    ok = ok & (jnp.min(d2, axis=-1) > cfg.resolution**2)

    # Random order so that per-cell overflow dropping is unbiased.
    perm = jax.random.permutation(k_shuffle, P)
    pts_s, feat_s, ok_s, cid_s = pts[perm], features[perm], ok[perm], cid[perm]
    cid_s = jnp.where(ok_s, cid_s, C)  # invalid -> overflow bucket

    # Rank within cell: r_p = #earlier same-cell points. O(P log P) via sort.
    order = jnp.argsort(cid_s)
    sorted_cid = cid_s[order]
    pos = jnp.arange(P)
    first_of_run = jnp.concatenate(
        [jnp.array([0]),
         jnp.where(sorted_cid[1:] != sorted_cid[:-1], pos[1:], 0).astype(jnp.int32)]
    )
    run_start = jax.lax.associative_scan(jnp.maximum, first_of_run)
    rank_sorted = pos - run_start
    rank = jnp.zeros((P,), jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))

    keep = ok_s & (rank < K)
    scatter_cell = jnp.where(keep, cid_s, C)
    scatter_slot = jnp.where(keep, rank, 0)

    staging_pts = jnp.zeros((C + 1, K, 3)).at[scatter_cell, scatter_slot].set(pts_s)
    staging_feat = jnp.zeros((C + 1, K, F), state.features.dtype).at[
        scatter_cell, scatter_slot].set(feat_s)
    staging_valid = jnp.zeros((C + 1, K), bool).at[scatter_cell, scatter_slot].set(keep)

    # Union old + new, keep a random capacity-subset per cell.
    all_pts = jnp.concatenate([state.points, staging_pts[:C]], axis=1)  # (C, 2K, 3)
    all_feat = jnp.concatenate([state.features, staging_feat[:C]], axis=1)
    all_valid = jnp.concatenate([state.valid, staging_valid[:C]], axis=1)
    scores = jax.random.uniform(k_evict, all_valid.shape) + jnp.where(
        all_valid, 0.0, _BIG
    )
    _, take = jax.lax.top_k(-scores, K)  # (C, K)
    new_pts = jnp.take_along_axis(all_pts, take[..., None], axis=1)
    new_feat = jnp.take_along_axis(all_feat, take[..., None], axis=1)
    new_valid = jnp.take_along_axis(all_valid, take, axis=1)
    return GridState(new_pts, new_feat, new_valid)


def fill_cells_progressive(cfg: GridConfig, state: GridState, key, pts,
                           pts_mask=None, chunk: int = 1000):
    """Shuffled chunked re-fill (reference fill_surface_scene :522-583):
    feeding points in small batches lets the resolution dedup denoise."""
    P = pts.shape[0]
    if pts_mask is None:
        pts_mask = jnp.ones((P,), bool)
    k_shuf, key = jax.random.split(key)
    perm = jax.random.permutation(k_shuf, P)
    pts = pts[perm]
    pts_mask = pts_mask[perm]
    pad = (-P) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3))])
        pts_mask = jnp.concatenate([pts_mask, jnp.zeros((pad,), bool)])
    n_chunks = pts.shape[0] // chunk

    def body(carry, inp):
        st, k = carry
        p, m = inp
        k, sub = jax.random.split(k)
        return (fill_cells(cfg, st, sub, p, m), k), None

    (state, _), _ = jax.lax.scan(
        body, (state, key),
        (pts.reshape(n_chunks, chunk, 3), pts_mask.reshape(n_chunks, chunk)),
    )
    return state


def all_points(state: GridState):
    """Flattened (C*K, 3) + validity mask."""
    return state.points.reshape(-1, 3), state.valid.reshape(-1)


def all_points_with_features(state: GridState):
    return (state.points.reshape(-1, 3),
            state.features.reshape(-1, state.features.shape[-1]),
            state.valid.reshape(-1))


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def min_dist_to_stored(cfg: GridConfig, state: GridState, queries, chunk: int = 2048):
    """Min distance from each query to ANY stored point (chunked over queries)."""
    pts, valid = all_points(state)
    Q = queries.shape[0]
    pad = (-Q) % chunk
    q = jnp.concatenate([queries, jnp.zeros((pad, 3))]) if pad else queries

    def body(carry, sl):
        d2 = pairwise_sqdist(sl, pts)
        d2 = jnp.where(valid[None, :], d2, _BIG)
        return carry, jnp.sqrt(jnp.min(d2, axis=-1))

    _, out = jax.lax.scan(body, None, q.reshape(-1, chunk, 3))
    return out.reshape(-1)[:Q]


@partial(jax.jit, static_argnames=("cfg",))
def camera_coverage_gain(cfg: GridConfig, state: GridState, part_pc, part_mask,
                         surface_epsilon=None):
    """Newly-covered surface points given a captured partial cloud.

    Features channel 0 stores coveredness. Returns (gain, new_state) where
    new_state has the newly covered points' features set to 1
    (reference camera_coverage_gain :2987-3029 + the trainer's feature update).
    """
    eps = cfg.resolution if surface_epsilon is None else surface_epsilon
    pts, feat, valid = all_points_with_features(state)
    pm = part_mask & in_bounding_box(cfg, part_pc)

    def chunk_min(sl):
        d2 = pairwise_sqdist(sl, part_pc)
        d2 = jnp.where(pm[None, :], d2, _BIG)
        return jnp.min(d2, axis=-1)

    n = pts.shape[0]
    chunk = 4096
    pad = (-n) % chunk
    q = jnp.concatenate([pts, jnp.zeros((pad, 3))]) if pad else pts
    mind2 = jax.lax.map(chunk_min, q.reshape(-1, chunk, 3)).reshape(-1)[:n]
    covered_now = (jnp.sqrt(mind2) < eps) & valid
    already = feat[:, 0] > 0.0
    newly = covered_now & ~already
    gain = jnp.sum(newly.astype(jnp.float32))
    new_flag = jnp.where(newly, 1.0, feat[:, 0])
    new_feat = feat.at[:, 0].set(new_flag)
    C, K = cfg.n_cells, cfg.capacity
    return gain, state._replace(
        features=new_feat.reshape(C, K, -1)
    )


@partial(jax.jit, static_argnames=("cfg",))
def window_coverage_gains(cfg: GridConfig, state: GridState, part_pcs,
                          part_masks, surface_epsilon=None):
    """Per-frame supervision coverage gains for a capture window.

    Matches the reference's online/replay supervision gains
    (train_macarons.py:449-470, :700-716): the window's partial clouds are
    already inserted into `state` with coveredness feature 0 (uncovered) except
    frame 0's points (covered); each frame's gain counts the uncovered stored
    points within epsilon of ITS cloud (no marking between frames of the same
    window); afterwards EVERY stored point becomes covered
    (set_all_features_to_value(1.)).

    part_pcs (F, P, 3), part_masks (F, P). Returns (gains (F,), new_state).
    """
    eps = cfg.resolution if surface_epsilon is None else surface_epsilon
    pts, feat, valid = all_points_with_features(state)
    uncovered = valid & (feat[:, 0] <= 0.0)
    n = pts.shape[0]
    chunk = 4096
    pad = (-n) % chunk
    q = jnp.concatenate([pts, jnp.zeros((pad, 3))]) if pad else pts
    u = (jnp.concatenate([uncovered, jnp.zeros((pad,), bool)])
         if pad else uncovered)

    def per_frame(args):
        pc, pm = args
        pm = pm & in_bounding_box(cfg, pc)

        def chunk_gain(sl):
            s_pts, s_unc = sl
            d2 = pairwise_sqdist(s_pts, pc)
            d2 = jnp.where(pm[None, :], d2, _BIG)
            hit = (jnp.sqrt(jnp.min(d2, axis=-1)) < eps) & s_unc
            return jnp.sum(hit.astype(jnp.float32))

        return jnp.sum(jax.lax.map(
            chunk_gain, (q.reshape(-1, chunk, 3), u.reshape(-1, chunk))))

    gains = jax.lax.map(per_frame, (part_pcs, part_masks))
    new_feat = state.features.at[..., 0].set(1.0)
    return gains, state._replace(features=new_feat)


def _covered_mask_cellwise(gt: GridState, rec: GridState, eps):
    """(C, K) bool: each stored GT point covered by same-cell recovered points.
    Scans over cells so the (K, K) distance block never batches over all cells."""

    def per_cell(args):
        g_pts, g_val, r_pts, r_val = args
        d2 = jnp.sum((g_pts[:, None, :] - r_pts[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(r_val[None, :], d2, _BIG)
        return (jnp.sqrt(jnp.min(d2, axis=-1)) < eps) & g_val

    return jax.lax.map(
        per_cell, (gt.points, gt.valid, rec.points, rec.valid),
        batch_size=64,
    )


@partial(jax.jit, static_argnames=("cfg",))
def scene_coverage(cfg: GridConfig, gt: GridState, rec: GridState,
                   surface_epsilon=None):
    """GT recall against the recovered scene, cell-by-cell
    (reference scene_coverage :3031-3056). Returns (coverage, n_gt_pts)."""
    eps = 2.0 * cfg.resolution if surface_epsilon is None else surface_epsilon
    covered = _covered_mask_cellwise(gt, rec, eps)
    n_gt = jnp.sum(gt.valid)
    return jnp.sum(covered) / jnp.maximum(n_gt, 1), n_gt


@partial(jax.jit, static_argnames=("cfg",))
def get_covered_split(cfg: GridConfig, gt: GridState, rec: GridState,
                      surface_epsilon=None):
    """Covered/uncovered mask per stored GT point (reference :3058-3088)."""
    eps = 2.0 * cfg.resolution if surface_epsilon is None else surface_epsilon
    return _covered_mask_cellwise(gt, rec, eps)
