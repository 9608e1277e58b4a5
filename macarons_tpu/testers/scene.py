"""Scene exploration evaluation — full NBV trajectories with TRUE coverage.

TPU rebuild of reference macarons/testers/scene.py:61-765: for each scene and
start pose, run an n_poses NBV trajectory with frozen weights; at every pose,
backproject the GROUND-TRUTH zbuf into a `covered_scene` grid and score true
coverage against the GT surface grid (reference :322-344). Records coverage
evolution + camera history per start pose into a results JSON matching the
reference's published format (results/scene_exploration/...).

Supports the perfect-depth bypass (use_perfect_depth) and the collision mode
(proxy-based camera_collides filter on candidate poses).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Params
from ..data.scenes import SceneDataset
from ..models.macarons import (
    create_macarons_model,
    init_macarons_variables,
    load_macarons,
)
from ..ops.geometry import FoVCamera
from ..ops.projection import project_depth_back_to_3D
from ..scene import grid as G
from ..scene import proxy as P
from ..scene import runtime as R
from ..parallel.nbv import pad_candidates
from ..scene.camera import get_camera_RT
from ..scene.depth_runtime import create_batch_for_depth_model
from ..scene.memory import Memory
from ..trainers.train_macarons import (
    MacaronsRuntime,
    SceneState,
    capture_and_save,
    mapping_update,
    move_and_capture,
    setup_scene,
)
from ..utils.checkpoint import checkpoint_exists


def true_coverage_update(scene: SceneState, covered_scene: G.GridState,
                         gt_depth, gt_mask, R_b, T_b, key, zfar,
                         surface_epsilon):
    """Backproject GT zbuf -> fill covered_scene -> GT recall
    (reference :322-344)."""
    cam = FoVCamera.create(R_b, T_b, zfar=zfar)
    pts, pmask = project_depth_back_to_3D(gt_depth, cam)
    for i in range(gt_depth.shape[0]):
        key, k = jax.random.split(key)
        good = pmask[i] & (gt_depth[i].reshape(-1) > 0)
        covered_scene = G.fill_cells(scene.cfg, covered_scene, k, pts[i], good)
    cov, _ = G.scene_coverage(scene.cfg, scene.gt_scene, covered_scene,
                              surface_epsilon=surface_epsilon)
    return float(cov), covered_scene, key


def compute_trajectory(rt: MacaronsRuntime, scene: SceneState, memory: Memory,
                       memory_path: str, variables, key, rs, n_poses: int,
                       surface_epsilon: float,
                       use_collision: bool = False,
                       start_idx: Optional[np.ndarray] = None,
                       policy: str = "nbv",
                       verbose: bool = False):
    """One frozen-weights exploration trajectory (reference :284-618).

    ``policy`` selects the next-pose rule — the baselines exist to measure the
    LIFT of the learned NBV model on identical scenes/seeds (the reference's
    published trajectories, results/scene_exploration/
    test_results_in_default_scenes.json, serve the same purpose):
      - "nbv": occupancy field + SconeVis coverage gains (the model).
      - "random": uniform random valid neighbor (no model).
      - "carving": no SconeVis — score each candidate by the summed occupancy
        of never-yet-observed proxy points inside its FoV (a pure
        carving-state heuristic; "observed" = any nonzero view-state bin).
    """
    params = rt.params
    cam = scene.camera
    if start_idx is None:
        start_idx = cam.get_random_valid_pose(
            rs, scene.verts_dev, proxy_points=scene.proxy.points)
    cam.initialize(np.asarray(start_idx))

    covered_scene = G.empty_grid(scene.cfg)
    coverages: List[float] = []

    gt_depths = []
    for _ in range(1 + rt.dcfg.n_alpha):
        _, depth, mask = capture_and_save(scene, memory, memory_path)
        gt_depths.append((depth, mask, cam.fov_camera.R, cam.fov_camera.T))

    # True coverage after the initial captures
    for depth, mask, R_b, T_b in gt_depths:
        cov, covered_scene, key = true_coverage_update(
            scene, covered_scene, depth, mask, R_b, T_b, key, rt.dcfg.zfar,
            surface_epsilon)
    coverages.append(cov)

    for pose_i in range(n_poses):
        cam.fov_camera_0 = cam.fov_camera
        # Decision phase (same as training, no grad)
        frames = memory.load_frame_sequence(
            memory_path, cam.n_frames_captured - 1, 1 + rt.dcfg.n_alpha)
        batch, alpha = create_batch_for_depth_model(rt.dcfg, frames, "inference")
        key, k = jax.random.split(key)
        _, depth, mask, err_mask, _, _, _ = rt.apply_depth_inference(
            variables.depth, batch, alpha, k)
        _, key = mapping_update(rt, scene, depth, mask, err_mask, batch["R"],
                                batch["T"], key,
                                carving_tolerance=params.get("carving_tolerance", 0.0),
                                score_threshold=params.get("score_threshold", 1.0))

        if policy == "nbv":
            key, k_occ = jax.random.split(key)
            proba, pred_mask, harmonics = rt.occupancy_field(
                variables.occ, scene.proxy, scene.surface_scene,
                cam.fov_camera_0, k_occ)
            if params.get("use_supervision_occ", False):
                # Carving pseudo-GT replaces the predicted field (reference
                # use_supervision_occ_instead_of_predicted bypass,
                # macarons_utils.py:1501-1503) — the decoupling fixture that
                # makes exploration quality measurable without trained weights.
                proba = scene.proxy.supervision_occ
                pred_mask = scene.proxy.out_of_field[:, 0] < 1.0
            scene.proxy = scene.proxy._replace(
                proba=jnp.where(pred_mask[:, None], proba, scene.proxy.proba))
            field = R.assemble_scene_field(scene.proxy, proba, pred_mask,
                                           harmonics)

        neighbors = cam.get_neighboring_poses()
        valid_nbrs = cam.get_valid_neighbors(neighbors, scene.verts_dev)
        if use_collision and len(valid_nbrs) > 1:
            keep = []
            for idx in valid_nbrs:
                pose = np.asarray(cam.pose_space.pose_from_idx(jnp.asarray(idx)))
                hit = P.camera_collides(
                    scene.proxy, scene.cfg.x_min, scene.cfg.x_max,
                    jnp.asarray(np.asarray(cam.X_cam)[0]),
                    jnp.asarray(pose[:3]), scene.proxy_distance,
                    n_interpolation_steps=max(cam.n_interpolation_steps, 2))
                if not bool(hit):
                    keep.append(idx)
            if keep:
                valid_nbrs = np.stack(keep)

        if len(valid_nbrs) == 0:
            # Lattice dead end (every neighbor occupied/out-of-bounds — can
            # happen mid-trajectory in synthetic scenes; the reference's
            # default scenes never exercise this). Backtrack to the pose we
            # came from (guaranteed reachable); with no history, stay put
            # and re-capture.
            hist = cam.cam_idx_history
            next_idx = np.asarray(hist[-2] if len(hist) >= 2 else cam.cam_idx)
        elif policy == "random":
            next_idx = valid_nbrs[int(rs.integers(len(valid_nbrs)))]
        else:
            poses = cam.pose_space.pose_from_idx(jnp.asarray(valid_nbrs))
            X_cand = poses[:, :3]
            R_c, T_c = get_camera_RT(X_cand, poses[:, 3:])
            cand_cams = FoVCamera.create(R_c, T_c, zfar=rt.dcfg.zfar)
            # Static candidate bucket => the scorer compiles once (see trainer)
            cand_cams, X_cand, n_cand = pad_candidates(
                cand_cams, X_cand, params.get("nbv_candidate_bucket", 8))
            if policy == "carving":
                # Max-uncovered-proxy heuristic: summed carving occupancy of
                # never-observed proxies in each candidate's FoV. No neural
                # nets — isolates what the carving state alone buys.
                from ..ops.projection import points_in_fov_mask

                C = X_cand.shape[0]
                in_fov = points_in_fov_mask(
                    jnp.broadcast_to(scene.proxy.points[None],
                                     (C, *scene.proxy.points.shape)),
                    cand_cams, rt.H, rt.W, fov_range=rt.sensor_range)
                unseen = jnp.sum(scene.proxy.view_states, axis=-1) == 0
                gains = jnp.sum(
                    jnp.where(in_fov & unseen[None],
                              scene.proxy.supervision_occ[None, :, 0], 0.0),
                    axis=-1)[:n_cand]
            else:
                box_diag = float(np.linalg.norm(
                    np.asarray(scene.cfg.x_max) - np.asarray(scene.cfg.x_min)))
                key, k_cov = jax.random.split(key)
                gains = rt.coverage_gains(
                    variables.vis, *field, cand_cams, X_cand,
                    cam.fov_camera_0, box_diag, scene.cfg.resolution,
                    rt.sensor_range, k_cov)[:n_cand]
            next_idx = valid_nbrs[int(jnp.argmax(gains))]

        # Move and capture (one batched render); TRUE coverage from GT zbuf
        _, gt_depth, gt_mask, batch_cam = move_and_capture(
            scene, memory, memory_path, next_idx)
        cov, covered_scene, key = true_coverage_update(
            scene, covered_scene, gt_depth, gt_mask, batch_cam.R,
            batch_cam.T, key, rt.dcfg.zfar, surface_epsilon)
        coverages.append(cov)

        # Mapping from predicted depths over the new frames (no learning)
        frames = memory.load_frame_sequence(
            memory_path, cam.n_frames_captured - 1,
            rt.n_interpolation_steps + rt.dcfg.n_alpha_for_supervision)
        batch, alpha = create_batch_for_depth_model(rt.dcfg, frames,
                                                    "supervision")
        key, k = jax.random.split(key)
        _, depth, mask, err_mask, _, _, _ = rt.apply_depth_inference(
            variables.depth, batch, alpha, k)
        _, key = mapping_update(rt, scene, depth, mask, err_mask, batch["R"],
                                batch["T"], key,
                                carving_tolerance=params.get("carving_tolerance", 0.0),
                                score_threshold=params.get("score_threshold", 1.0))
        if verbose:
            print(f"  pose {pose_i}: true coverage {cov:.4f}")

    return {
        "coverage": coverages,
        "X_cam": np.concatenate(cam.X_cam_history, 0).tolist(),
        "V_cam": np.concatenate(cam.V_cam_history, 0).tolist(),
        "cam_idx": np.stack(cam.cam_idx_history, 0).tolist(),
    }, key


def run_test(params: Params, data_path: Optional[str] = None,
             weights_path: Optional[str] = None,
             results_dir: str = "results/scene_exploration",
             results_name: str = "test_results.json",
             n_start_poses: int = 5, n_poses: Optional[int] = None,
             memory_root: Optional[str] = None,
             max_scenes: Optional[int] = None,
             test_scenes: Optional[list] = None,
             load_json: bool = False,
             policy: str = "nbv",
             verbose: bool = True):
    """Full evaluation over scenes x start poses (reference run_test :621-765).

    ``test_scenes`` restricts evaluation to the named scenes and ``load_json``
    merges into an existing results file — both reference test-config
    behaviors (reference testers/scene.py:636, :664-668). ``policy`` selects
    the next-pose rule (see compute_trajectory) — "random"/"carving" are the
    baseline policies the learned NBV model is measured against."""
    data_path = data_path or params.get("dataset_path") or params.data_path
    rs = np.random.default_rng(params.get("random_seed", 42))
    key = jax.random.PRNGKey(params.get("torch_seed", 5))

    dataset = SceneDataset(data_path)
    test_scenes = test_scenes or params.get("test_scenes")
    if test_scenes:
        available = set(dataset.scene_names)
        missing = [n for n in test_scenes if n not in available]
        if missing and verbose:
            print(f"warning: test scenes not found under {data_path}: "
                  f"{missing}")
        names_filter = [n for n in test_scenes if n in available]
        dataset = SceneDataset(data_path, scene_names=names_filter)
    model = create_macarons_model(params)
    key, k_init = jax.random.split(key)
    variables = init_macarons_variables(params, model, k_init)
    if weights_path and checkpoint_exists(weights_path):
        variables, _ = load_macarons(weights_path, variables)

    surface_epsilon = (2.0 * params.get("test_resolution", 0.05)
                      * params.get("scene_scale_factor", 1.0))
    results: Dict[str, Dict] = {}
    # Prior results are loaded UP FRONT so the incremental per-trajectory
    # saves never clobber scenes from an earlier run (load_json merge
    # semantics, reference testers/scene.py:664-668).
    _prior: Dict[str, Dict] = {}
    _out_path = os.path.join(results_dir, results_name)
    if load_json and os.path.isfile(_out_path):
        with open(_out_path) as f:
            _prior = json.load(f)
    rt = None
    t0 = time.time()
    names = dataset.scene_names[:max_scenes] if max_scenes else dataset.scene_names
    for name in names:
        item = dataset[dataset.scene_names.index(name)]
        results[name] = {}
        for start_i in range(n_start_poses):
            key, k_scene = jax.random.split(key)
            scene = setup_scene(params, item, k_scene)
            if rt is None:
                rt = MacaronsRuntime(params, model, scene.cfg, scene.cell_table)
            else:
                rt.bind_scene(scene.cfg, scene.cell_table)
            mem_root = memory_root or os.path.join(
                results_dir, params.get("memory_dir_name", "_test_memory"))
            memory_path = os.path.join(mem_root, name, f"start_{start_i}")
            memory = Memory([memory_path])
            start_idx = None
            sp = item["settings"].start_positions
            if sp:
                start_idx = np.asarray(sp[start_i % len(sp)], np.int64)
            traj, key = compute_trajectory(
                rt, scene, memory, memory_path, variables, key, rs,
                n_poses=n_poses or params.get("n_poses_in_trajectory", 100),
                surface_epsilon=surface_epsilon,
                use_collision=params.get("use_collision", False),
                start_idx=start_idx, policy=policy, verbose=verbose,
            )
            results[name][str(start_i)] = traj
            # Incremental save after EVERY trajectory (the reference saves
            # results_json after each scene, testers/scene.py:758-760): a
            # killed long evaluation leaves a valid partial results file.
            os.makedirs(results_dir, exist_ok=True)
            with open(_out_path, "w") as f:
                json.dump({**_prior, **results}, f)
            if params.get("export_results", False):
                # Blender camera curves + reconstructed surface PLY
                # (reference export branches, testers/scene.py:284-618 +
                # render_utils.py)
                from ..utils.export import (
                    export_point_cloud_ply, export_trajectory_blender,
                )

                edir = os.path.join(results_dir, "exports", name)
                export_trajectory_blender(
                    os.path.join(edir, f"start_{start_i}_cameras.json"),
                    np.concatenate(scene.camera.X_cam_history, 0),
                    np.concatenate(scene.camera.V_cam_history, 0),
                    scene.camera.n_interpolation_steps,
                    params.get("scene_scale_factor", 1.0))
                pts, valid = G.all_points(scene.surface_scene)
                export_point_cloud_ply(
                    os.path.join(edir, f"start_{start_i}_surface.ply"),
                    np.asarray(pts), valid=np.asarray(valid))
            if verbose:
                print(f"{name} start {start_i}: final coverage "
                      f"{traj['coverage'][-1]:.4f}")

    os.makedirs(results_dir, exist_ok=True)
    out_path = os.path.join(results_dir, results_name)
    if load_json and os.path.isfile(out_path):
        # Merge-resume semantics (reference :664-668): keep prior scenes,
        # overwrite re-evaluated ones.
        with open(out_path) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out_path, "w") as f:
        json.dump(results, f)
    if verbose:
        print(f"done in {(time.time() - t0) / 60:.1f} min")
    return results
