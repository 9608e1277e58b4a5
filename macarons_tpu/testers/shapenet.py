"""SCONE NBV evaluation on ShapeNet — greedy coverage-gain trajectories.

TPU rebuild of reference macarons/testers/shapenet.py:8-231. The entire
n_view_max-step NBV trajectory for a mesh compiles into ONE device launch: a
`lax.fori_loop` carries the growing view set as a fixed-shape masked vector,
and each step runs view-state -> SconeOcc occupancy -> occupancy-weighted MC
sampling -> SconeVis -> fused 52-candidate coverage gain -> argmax. The
reference runs each step (and each SconeOcc chunk) as separate launches with
host round-trips; here the only host work is loading the mesh artifacts.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..data import datasets as D
from ..models.scone import (
    SconeOcc,
    SconeVis,
    compute_coverage_gain,
    compute_occupancy_probability,
)
from ..ops.geometry import FoVCamera, look_at_view_transform
from ..ops.view_state import (
    compute_view_harmonics,
    compute_view_state,
    filter_proxy_points_mask,
    get_all_harmonics_under_degree,
    normalize_points_in_prediction_box,
    sample_proxy_points,
)
from ..trainers.pretrain_occ import build_model as build_occ_model
from ..trainers.pretrain_occ import candidate_camera_poses
from ..trainers.pretrain_vis import build_vis_model
from ..utils.checkpoint import load_checkpoint, checkpoint_exists


def surface_coverage_from_cam_idx(coverage, view_idx, view_mask):
    """Fraction of GT surface covered by the selected cameras
    (reference scone_utils.py:671-680)."""
    sel = coverage[view_idx] * view_mask[:, None].astype(coverage.dtype)
    return jnp.mean((jnp.sum(sel, axis=0) > 0).astype(coverage.dtype))


def make_nbv_trajectory_fn(params: Params, occ_model: SconeOcc,
                           vis_model: SconeVis):
    """Build the jitted full-trajectory NBV evaluator.

    Returns fn(occ_vars, vis_vars, part_pc, part_mask, coverage, init_view, key)
      -> (coverages (n_view_max,), view_idx (n_view_max,))
    """
    n_elev = params.view_state_n_elev
    n_azim = params.view_state_n_azim
    degree = params.harmonic_degree
    n_view_max = params.n_view_max
    pc_size = params.get("pc_size", 1024)
    n_proxy = params.n_proxy_points
    seq_len = params.seq_len
    min_occ = params.get("min_occ_for_proxy_points", 0.1)
    use_occ_sample = params.get("use_occ_to_sample_proxy_points", True)
    filter_tol = params.get("filter_tol", 0.01)
    gt_max_diagonal = params.gt_max_diagonal
    camera_dist = params.camera_dist
    occ_no_vh = params.get("occ_no_view_harmonics", False)
    no_vh = params.get("no_view_harmonics", False)
    use_sigmoid = params.get("use_sigmoid", True)

    X_cam_world, cand_R, cand_T = candidate_camera_poses(params)
    n_cam = X_cam_world.shape[0]
    base_harmonics, h_polar, _ = get_all_harmonics_under_degree(degree, n_elev, n_azim)
    box_center = jnp.array([0.0, 0.0, camera_dist])

    @jax.jit
    def run(occ_vars, vis_vars, part_pc, part_mask, coverage, init_view, key):
        k_box, k_loop = jax.random.split(key)
        # Prediction space fixed by the initial view (reference :59-75)
        R = cand_R[init_view]
        T = cand_T[init_view]

        def to_view(pts):
            return jnp.einsum("nj,ji->ni", pts, R) + T[None, :]

        def norm(pts):
            return normalize_points_in_prediction_box(pts, box_center, gt_max_diagonal)

        X_cam_n = norm(to_view(X_cam_world))  # (52, 3)
        X_proxy = jax.random.uniform(k_box, (n_proxy, 3), minval=-0.5, maxval=0.5)

        # Partial clouds in normalized prediction space, flattened with masks.
        L = part_pc.shape[1]
        pc_all = norm(to_view(part_pc.reshape(-1, 3))).reshape(n_cam, L, 3)

        view_idx0 = jnp.zeros((n_view_max,), jnp.int32).at[0].set(init_view)
        view_mask0 = jnp.zeros((n_view_max,), bool).at[0].set(True)
        coverages0 = jnp.zeros((n_view_max,))
        coverages0 = coverages0.at[0].set(
            surface_coverage_from_cam_idx(coverage, view_idx0, view_mask0)
        )

        max_pc = n_view_max * pc_size

        def step(j, carry):
            view_idx, view_mask, coverages = carry
            k = jax.random.fold_in(k_loop, j)
            k_pc, k_occ, k_sample = jax.random.split(k, 3)

            # Union of observed clouds, subsampled to a fixed max_pc slots.
            sel_pc = pc_all[view_idx]  # (V, L, 3)
            sel_mask = part_mask[view_idx] & view_mask[:, None]  # (V, L)
            flat_pc = sel_pc.reshape(-1, 3)
            flat_mask = sel_mask.reshape(-1)
            scores = jax.random.uniform(k_pc, flat_mask.shape) + jnp.where(
                flat_mask, 0.0, 1e9
            )
            _, take = jax.lax.top_k(-scores, max_pc)
            pc = flat_pc[take]
            pc_mask = flat_mask[take]

            X_view = X_cam_n[view_idx]  # (V, 3)

            # Proxy filtering by projected bbox from the visited cameras.
            R_v, T_v = look_at_view_transform(eye=X_view, at=jnp.zeros_like(X_view))
            view_cams = FoVCamera.create(R_v, T_v, zfar=1000.0)
            keep = filter_proxy_points_mask(
                view_cams, X_proxy, pc, filter_tol=filter_tol,
                pc_mask=pc_mask, view_mask=view_mask,
            )

            vs = compute_view_state(X_proxy[None], X_view[None], n_elev, n_azim,
                                    view_mask=view_mask[None])
            vh = compute_view_harmonics(vs, base_harmonics, h_polar, n_elev, n_azim)
            occ_vh = jnp.where(occ_no_vh, 0.0, vh)
            vis_vh = jnp.where(no_vh, 0.0, vh)

            occ = compute_occupancy_probability(
                occ_model, occ_vars, pc[None], X_proxy[None], occ_vh,
                key=k_occ, pc_mask=pc_mask[None],
                max_points_per_pass=params.get("max_points_per_scone_occ_pass",
                                               300000),
            )[0]

            pts4, harm, _, smask = sample_proxy_points(
                k_sample, X_proxy, occ, vis_vh[0], seq_len, min_occ,
                use_occ_to_sample=use_occ_sample, valid_mask=keep,
            )
            harmonics = vis_model.apply(vis_vars, pts4[None], harm[None],
                                        pts_mask=smask[None])
            gains = compute_coverage_gain(
                pts4[None], harmonics, X_cam_n[None], pts_mask=smask[None],
                use_sigmoid=use_sigmoid,
            )[0]

            nbv = jnp.argmax(gains).astype(jnp.int32)
            view_idx = view_idx.at[j].set(nbv)
            view_mask = view_mask.at[j].set(True)
            coverages = coverages.at[j].set(
                surface_coverage_from_cam_idx(coverage, view_idx, view_mask)
            )
            return view_idx, view_mask, coverages

        view_idx, view_mask, coverages = jax.lax.fori_loop(
            1, n_view_max, step, (view_idx0, view_mask0, coverages0)
        )
        return coverages, view_idx

    return run


def run_test(params: Params, data_path: Optional[str] = None,
             occ_weights_path: Optional[str] = None,
             vis_weights_path: Optional[str] = None,
             test_novel: bool = False,
             results_dir: str = "results/shapenet_reconstruction",
             max_meshes: Optional[int] = None,
             results_name: Optional[str] = None,
             seed: int = 42, verbose: bool = True):
    """Evaluate NBV trajectories over the test split (reference run_test :234-298)."""
    data_path = data_path or params.data_path
    rng = jax.random.PRNGKey(seed)
    rs = np.random.default_rng(seed)

    occ_model = build_occ_model(params)
    vis_model = build_vis_model(params)
    L_pc = params.n_view_max * params.get("pc_size", 1024)
    rng, k1, k2 = jax.random.split(rng, 3)
    occ_vars = occ_model.init(
        k1, jnp.zeros((1, L_pc, 3)), jnp.zeros((1, 8, 3)),
        jnp.zeros((1, 8, params.harmonic_degree**2)),
    )
    vis_vars = vis_model.init(
        k2, jnp.zeros((1, params.seq_len, 4)),
        jnp.zeros((1, params.seq_len, params.harmonic_degree**2)),
    )
    if occ_weights_path and checkpoint_exists(occ_weights_path):
        occ_vars, _ = load_checkpoint(occ_weights_path, occ_vars)
    if vis_weights_path and checkpoint_exists(vis_weights_path):
        vis_vars, _ = load_checkpoint(vis_weights_path, vis_vars)

    _, _, test_ds = D.get_shapenet_datasets(data_path, test_novel=test_novel)
    paths = test_ds.paths[:max_meshes] if max_meshes else test_ds.paths

    run = make_nbv_trajectory_fn(params, occ_model, vis_model)
    coverage_dict = {}
    sum_cov = np.zeros(params.n_view_max)
    computation_time = 0.0
    for i, p in enumerate(paths):
        part_pc, part_mask, coverage = D.get_gt_partial_point_clouds(p)
        init_view = int(rs.integers(0, coverage.shape[0]))
        rng, k = jax.random.split(rng)
        t0 = time.time()
        coverages, view_idx = run(
            occ_vars, vis_vars, jnp.asarray(part_pc), jnp.asarray(part_mask),
            jnp.asarray(coverage), init_view, k,
        )
        coverages.block_until_ready()
        computation_time += time.time() - t0
        cov = np.asarray(coverages)
        coverage_dict[p] = cov.tolist()
        sum_cov += cov
        if verbose and i % 10 == 0:
            print(f"mesh {i + 1}/{len(paths)}: coverages {np.round(cov, 4)}")

    results = {
        "coverages": coverage_dict,
        "mean_coverages": (sum_cov / max(len(paths), 1)).tolist(),
        "computation_time": computation_time,
        "avg_computation_time": computation_time / max(len(paths), 1),
    }
    os.makedirs(results_dir, exist_ok=True)
    suffix = "novel" if test_novel else "seen"
    results_name = results_name or f"results_{suffix}.json"
    with open(os.path.join(results_dir, results_name), "w") as f:
        json.dump(results, f, indent=2)
    if verbose:
        print("Avg coverages:", np.round(sum_cov / max(len(paths), 1), 4))
        print("Avg NBV computation time per mesh:", results["avg_computation_time"])
    return results
