"""MACARONS online self-supervised training — the full NBV exploration loop.

TPU rebuild of reference macarons/trainers/train_macarons.py (1715 LoC): each
trajectory alternates a jit-compiled DECISION phase (depth inference ->
mapping -> carving -> occupancy field -> fused all-candidate NBV scoring) with
a jit-compiled SUPERVISION phase (depth photometric loss + occupancy MSE +
coverage-gain loss, one optimizer step each), plus host-side episode
bookkeeping: frame memory IO, depth/scone replay, full remapping, freeze
schedules and loss-peak rollback.

The reference's per-neighbor sequential scoring loop and per-cell python loops
are batched device programs here (scene.runtime); its DDP dummy-pass liveness
hack is gone (fixed shapes, same program on every rank). Data parallelism is
one scene per host/device-group exactly like the reference's one scene per GPU.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Params
from ..data.mesh_io import Mesh, adjust_mesh, load_obj, mirror_mesh
from ..data.scenes import SceneDataset, SceneSettings, occupied_pose_grid
from ..models import losses as L
from ..models.macarons import (
    MacaronsModel,
    MacaronsVariables,
    create_macarons_model,
    init_macarons_variables,
    load_macarons,
    save_macarons,
)
from ..ops.geometry import FoVCamera
from ..ops.projection import (
    points_in_fov_mask,
    project_depth_back_to_3D,
    signed_distance_to_depth_maps,
)
from ..ops.sampling import random_subsample_mask, sample_points_on_mesh_surface
from ..scene import grid as G
from ..scene import proxy as P
from ..scene import runtime as R
from ..scene.camera import Camera, PoseSpace, get_camera_RT
from ..scene.depth_runtime import (
    DepthBatchConfig,
    create_batch_for_depth_model,
    make_apply_depth_fn,
)
from ..scene.memory import Memory


# ---------------------------------------------------------------------------
# Scene setup (reference setup_scene / setup_camera :13-158)
# ---------------------------------------------------------------------------


@dataclass
class SceneState:
    name: str
    mesh: Mesh
    settings: SceneSettings
    cfg: G.GridConfig
    gt_scene: G.GridState
    surface_scene: G.GridState
    proxy: P.ProxyState
    cell_table: R.CellIndexTable
    camera: Camera
    proxy_distance: float
    full_pc: List[np.ndarray] = field(default_factory=list)
    coverages: List[float] = field(default_factory=list)


def depth_cfg_from_params(params: Params) -> DepthBatchConfig:
    return DepthBatchConfig(
        n_alpha=params.get("n_alpha", 2),
        n_alpha_for_supervision=params.get("n_alpha_for_supervision", 2),
        alphas=tuple(params.get("alphas", [-2, -1])),
        use_future_frame_for_supervision=params.get(
            "use_future_frame_for_supervision", False),
        znear=params.get("znear", 0.5), zfar=params.get("zfar", 750.0),
        pose_factor=params.get("pose_factor", 100.0),
        rotation_mode=params.get("rotation_mode", "angle"),
        ssim_factor=params.get("ssim_factor", 0.85),
        regularity_factor=params.get("regularity_factor", 0.01),
        regularity_loss=params.get("regularity_loss", True),
        use_depth_mask=params.get("use_depth_mask", True),
        padding_mode=params.get("padding_mode", "border"),
        data_augmentation=params.get("data_augmentation", True),
        jitter_probability=params.get("jitter_probability", 0.5),
        symmetry_probability=params.get("symmetry_probability", 0.5),
    )


def setup_scene(params: Params, scene_item: Dict, key,
                mirrored_axes: Optional[List[int]] = None) -> SceneState:
    """Load mesh + settings, build GT/surface grids + proxy field + camera."""
    mesh = load_obj(scene_item["obj_path"])
    verts = mesh.verts * params.get("scene_scale_factor", 1.0)
    mesh = Mesh(verts, mesh.faces, mesh.vert_colors)
    if mirrored_axes:
        mesh = mirror_mesh(mesh, mirrored_axes)
    s = scene_item["settings"]

    def maybe_mirror(v):
        v = np.asarray(v, np.float32).copy()
        if mirrored_axes:
            for a in mirrored_axes:
                lo, hi = -v[a], -v[a]
            for a in mirrored_axes:
                v[a] = -v[a]
        return v

    x_min = np.asarray(s.scene_x_min, np.float32)
    x_max = np.asarray(s.scene_x_max, np.float32)
    if mirrored_axes:
        for a in mirrored_axes:
            x_min[a], x_max[a] = -x_max[a], -x_min[a]

    cfg = G.make_grid_config(
        tuple(x_min), tuple(x_max), s.grid_l, s.grid_w, s.grid_h,
        resolution=params.get("surface_cell_resolution",
                              params.get("test_resolution", 0.05)
                              * params.get("scene_scale_factor", 1.0)),
        capacity=params.get("surface_cell_capacity"),
        feature_dim=1,
    )

    k_gt, _, k_fill = jax.random.split(key, 3)
    # Proxy positions are deterministic per scene (name-seeded): saved memory
    # snapshots stay layout-compatible across epochs/trajectories and the
    # per-cell occupancy program never recompiles for the same scene.
    k_px = jax.random.PRNGKey(
        abs(hash(("proxy", scene_item["scene_name"]))) % (2**31))
    gt_pts = sample_points_on_mesh_surface(
        k_gt, jnp.asarray(mesh.verts), jnp.asarray(mesh.faces),
        params.get("n_gt_surface_points", 16384),
    )
    gt_scene = G.fill_cells_progressive(cfg, G.empty_grid(cfg), k_fill, gt_pts)
    surface_scene = G.empty_grid(cfg)

    n_proxy = params.get("n_proxy_points", 100000)
    prox = P.initialize_proxy_points(k_px, x_min, x_max, n_proxy)
    table = R.build_cell_index_table(cfg, np.asarray(prox.points))
    proxy_dist = P.distance_between_proxy_points(x_min, x_max, n_proxy)

    pose_space = PoseSpace(
        s.pose_x_min, s.pose_x_max, s.pose_l, s.pose_w, s.pose_h,
        s.pose_n_elev, s.pose_n_azim,
    )
    occupied = None
    if scene_item.get("occupied_pose") is not None:
        occupied = occupied_pose_grid(scene_item["occupied_pose"], s.pose_l,
                                      s.pose_w, s.pose_h)
        if mirrored_axes:
            for a in mirrored_axes:
                occupied = np.flip(occupied, axis=a).copy()
    camera = Camera(
        pose_space=pose_space, zfar=params.get("zfar", 750.0),
        image_height=params.get("image_height", 256),
        image_width=params.get("image_width", 456),
        n_interpolation_steps=params.get("n_interpolation_steps", 4),
        contrast_factor=s.contrast_factor,
        gathering_factor=params.get("gathering_factor", 0.05),
        occupied_poses=occupied,
    )
    return SceneState(
        name=scene_item["scene_name"], mesh=mesh, settings=s, cfg=cfg,
        gt_scene=gt_scene, surface_scene=surface_scene, proxy=prox,
        cell_table=table, camera=camera, proxy_distance=proxy_dist,
    )


# ---------------------------------------------------------------------------
# Runtime bundle: all jitted step functions for one model
# ---------------------------------------------------------------------------


class MacaronsRuntime:
    """Jit-compiled step functions shared across scenes with the same shapes."""

    def __init__(self, params: Params, model: MacaronsModel,
                 cfg: G.GridConfig, table: R.CellIndexTable):
        self.params = params
        self.model = model
        self.dcfg = depth_cfg_from_params(params)
        H = params.get("image_height", 256)
        W = params.get("image_width", 456)
        self.H, self.W = H, W
        self.sensor_range = params.get("sensor_range", 1.2 * params.get("zfar", 750.0))
        self.seq_len = params.get("seq_len", 2048)
        self.n_interpolation_steps = params.get("n_interpolation_steps", 4)

        self.apply_depth_inference = make_apply_depth_fn(
            model.depth, self.dcfg, compute_loss=False,
            use_perfect_depth=params.get("use_perfect_depth", False),
            data_augmentation=False,
        )
        self.apply_depth_loss = make_apply_depth_fn(
            model.depth, self.dcfg, compute_loss=True,
            use_perfect_depth=params.get("use_perfect_depth", False),
            train=True,
        )
        self.occupancy_field = R.make_occupancy_field_fn(
            model.occ, cfg, table,
            n_elev=params.get("view_state_n_elev", 7),
            n_azim=params.get("view_state_n_azim", 14),
            degree=params.get("harmonic_degree", 8),
            prediction_neighborhood_size=params.get("prediction_neighborhood_size", 3.0),
            k_for_knn=params.get("k_for_knn", 16),
            max_cells=params.get("n_cell_per_occ_forward_pass", 12),
            cell_batch=params.get("occ_cell_batch", 2),
        )
        self.coverage_gains = R.make_coverage_gain_fn(
            model.vis, seq_len=self.seq_len, image_height=H, image_width=W,
            min_occ=params.get("min_occ_for_proxy_points", 0.1),
            use_occ_to_sample=params.get("use_occ_to_sample_proxy_points", True),
            use_sigmoid=params.get("use_sigmoid", True),
            dist_factor_mode=params.get("distance_factor_th"),
        )

        depth_lr = params.get("depth_learning_rate", params.get("learning_rate", 1e-4))
        scone_lr = params.get("scone_learning_rate", params.get("learning_rate", 1e-4))
        self.depth_tx = optax.adamw(depth_lr)
        self.scone_tx = optax.adamw(scone_lr)
        self._depth_step = None
        self._scone_step = None

    # -- depth optimizer step ------------------------------------------------
    def depth_train_step(self, depth_vars, opt_state, batch, alpha, key):
        if self._depth_step is None:

            @jax.jit
            def step(depth_vars, opt_state, batch, alpha, key):
                def loss_fn(p):
                    variables = {"params": p,
                                 "batch_stats": depth_vars["batch_stats"]}
                    loss, depth, mask, err, pose, gt, new_stats = (
                        self.apply_depth_loss(variables, batch, alpha, key))
                    return loss, (depth, mask, err, new_stats)

                (loss, (depth, mask, err, new_stats)), grads = (
                    jax.value_and_grad(loss_fn, has_aux=True)(
                        depth_vars["params"]))
                updates, opt_state = self.depth_tx.update(
                    grads, opt_state, depth_vars["params"])
                new_params = optax.apply_updates(depth_vars["params"], updates)
                return ({"params": new_params, "batch_stats": new_stats},
                        opt_state, loss, depth, mask, err)

            self._depth_step = step
        return self._depth_step(depth_vars, opt_state, batch, alpha, key)

    # -- scone optimizer step ------------------------------------------------
    def scone_train_step(self, occ_vars, vis_vars, opt_state, proxy, surface,
                         prediction_camera, close_mask, visited_cams,
                         visited_X, supervision_gains, field, key,
                         n_supervision: int, box_diag: float,
                         cell_resolution: float):
        if self._scone_step is None:

            @jax.jit
            def step(occ_vars, vis_vars, opt_state, proxy, surface,
                     prediction_camera, close_mask, visited_R, visited_T,
                     visited_X, supervision_gains, X_world, harmonics, occ,
                     valid, box_diag, cell_resolution, key):
                k_occ, k_cov = jax.random.split(key)

                def loss_fn(ps):
                    ov = {"params": ps["occ"]}
                    vv = {"params": ps["vis"]}
                    proba, pred_mask, _ = self.occupancy_field(
                        ov, proxy, surface, prediction_camera, k_occ,
                        supervision=True, eligible_override=close_mask,
                    )
                    sup = proxy.supervision_occ
                    err = jnp.where(pred_mask[:, None], (proba - sup) ** 2, 0.0)
                    n_pred = jnp.sum(pred_mask)
                    occ_loss = jnp.sum(err) / jnp.maximum(n_pred, 1) \
                        * n_pred / n_supervision

                    cams = FoVCamera.create(visited_R, visited_T,
                                            zfar=self.dcfg.zfar)
                    gains = self.coverage_gains(
                        vv, X_world, harmonics, occ, valid, cams, visited_X,
                        prediction_camera, box_diag, cell_resolution,
                        self.sensor_range, k_cov,
                    )
                    cov_loss = L.uncentered_l1(
                        gains.reshape(1, -1, 1),
                        supervision_gains.reshape(1, -1, 1),
                    )
                    return occ_loss + cov_loss, (occ_loss, cov_loss)

                ps = {"occ": occ_vars["params"], "vis": vis_vars["params"]}
                (loss, (occ_loss, cov_loss)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(ps)
                updates, opt_state = self.scone_tx.update(grads, opt_state, ps)
                new = optax.apply_updates(ps, updates)
                return ({"params": new["occ"]}, {"params": new["vis"]},
                        opt_state, loss, occ_loss, cov_loss)

            self._scone_step = step
        X_world, harmonics, occ, valid = field
        return self._scone_step(
            occ_vars, vis_vars, opt_state, proxy, surface, prediction_camera,
            close_mask, visited_cams.R, visited_cams.T, visited_X,
            supervision_gains, X_world, harmonics, occ, valid,
            jnp.asarray(box_diag), jnp.asarray(cell_resolution), key)


# ---------------------------------------------------------------------------
# The NBV loop (reference loop :161-547)
# ---------------------------------------------------------------------------


def capture_and_save(scene: SceneState, memory: Memory, memory_path: str,
                     lights_intensity: float = 1.0):
    cam = scene.camera
    colors = (jnp.asarray(scene.mesh.vert_colors)
              if scene.mesh.vert_colors is not None else None)
    images, depth, mask = cam.capture_image(
        jnp.asarray(scene.mesh.verts), jnp.asarray(scene.mesh.faces),
        vert_colors=colors,
    )
    memory.save_frame(memory_path, cam.n_frames_captured - 1, images, depth,
                      mask, cam.fov_camera.R, cam.fov_camera.T, cam.zfar)
    return images, depth, mask


def mapping_update(rt: MacaronsRuntime, scene: SceneState, depth, mask,
                   err_mask, R_b, T_b, key, carving_tolerance: float = 0.0,
                   score_threshold: float = 1.0):
    """Backproject depth -> fill surface grid -> carve proxies (one frame batch)."""
    params = rt.params
    n = depth.shape[0]
    part_pcs = []
    for i in range(n):
        cam_i = FoVCamera.create(R_b[i : i + 1], T_b[i : i + 1],
                                 zfar=rt.dcfg.zfar)
        pts, pmask = project_depth_back_to_3D(depth[i : i + 1], cam_i)
        good = pmask[0] & (mask[i].reshape(-1)) & (err_mask[i].reshape(-1))
        key, k1, k2 = jax.random.split(key, 3)
        n_keep = max(int(good.shape[0] * scene.camera.gathering_factor), 16)
        idx, valid = random_subsample_mask(k1, good, n_keep)
        part_pc = pts[0][idx]
        scene.surface_scene = G.fill_cells(
            scene.cfg, scene.surface_scene, k2, part_pc, valid)
        part_pcs.append((part_pc, valid))

        fov = points_in_fov_mask(scene.proxy.points[None], cam_i, rt.H, rt.W,
                                 fov_range=rt.sensor_range)[0]
        sd = signed_distance_to_depth_maps(
            scene.proxy.points, depth[i : i + 1], mask[i : i + 1], cam_i,
            rt.dcfg.zfar)[0]
        scene.proxy = P.update_view_states(
            scene.proxy, cam_i.camera_center(), fov,
            params.get("view_state_n_elev", 7),
            params.get("view_state_n_azim", 14),
            signed_distances=sd,
            distance_to_surface=3 * scene.proxy_distance)
        scene.proxy = P.update_supervision_occ(
            scene.proxy, fov, sd, score_threshold=score_threshold,
            tol=carving_tolerance)
        scene.proxy = P.update_out_of_field(scene.proxy, fov)
    return part_pcs, key


def nbv_loop_step(rt: MacaronsRuntime, scene: SceneState, memory: Memory,
                  memory_path: str, variables: MacaronsVariables,
                  opt_states: Dict, key, freeze_scone: bool = False,
                  warmup_phase: bool = False, online_learning: bool = True,
                  surface_distance: Optional[float] = None):
    """One full NBV iteration. Returns (variables, opt_states, losses, key)."""
    params = rt.params
    cam = scene.camera
    cam.fov_camera_0 = cam.fov_camera

    # ---------- A. decision phase (no grad) ----------
    frames = memory.load_frame_sequence(
        memory_path, cam.n_frames_captured - 1, 1 + rt.dcfg.n_alpha)
    batch, alpha = create_batch_for_depth_model(rt.dcfg, frames, "inference")
    key, k = jax.random.split(key)
    _, depth, mask, err_mask, _, _, _ = rt.apply_depth_inference(
        variables.depth, batch, alpha, k)

    key, k = jax.random.split(key)
    _, key = mapping_update(
        rt, scene, depth, mask, err_mask, batch["R"], batch["T"], key,
        carving_tolerance=params.get("carving_tolerance", 0.0),
        score_threshold=params.get("score_threshold", 1.0))

    key, k_occ = jax.random.split(key)
    proba, pred_mask, harmonics = rt.occupancy_field(
        variables.occ, scene.proxy, scene.surface_scene, cam.fov_camera_0,
        k_occ, use_supervision_occ_mask=True)
    if warmup_phase:
        proba = scene.proxy.supervision_occ
        pred_mask = (scene.proxy.out_of_field[:, 0] < 1.0)
    scene.proxy = scene.proxy._replace(
        proba=jnp.where(pred_mask[:, None], proba, scene.proxy.proba))
    field = R.assemble_scene_field(scene.proxy, proba, pred_mask, harmonics)

    neighbors = cam.get_neighboring_poses()
    valid_nbrs = cam.get_valid_neighbors(neighbors,
                                         jnp.asarray(scene.mesh.verts))
    poses = cam.pose_space.pose_from_idx(jnp.asarray(valid_nbrs))
    X_cand = poses[:, :3]
    R_c, T_c = get_camera_RT(X_cand, poses[:, 3:])
    cand_cams = FoVCamera.create(R_c, T_c, zfar=rt.dcfg.zfar)

    box_diag = float(np.linalg.norm(
        np.asarray(scene.cfg.x_max) - np.asarray(scene.cfg.x_min)))
    key, k_cov = jax.random.split(key)
    gains = rt.coverage_gains(
        variables.vis, *field, cand_cams, X_cand, cam.fov_camera_0,
        box_diag, scene.cfg.resolution, rt.sensor_range, k_cov)
    next_idx = valid_nbrs[int(np.argmax(np.asarray(gains)))]

    # ---------- B. move & supervise ----------
    for step in range(1, cam.n_interpolation_steps + 1):
        cam.update_camera(next_idx, interpolation_step=step)
        capture_and_save(scene, memory, memory_path)

    frames = memory.load_frame_sequence(
        memory_path, cam.n_frames_captured - 1,
        rt.n_interpolation_steps + rt.dcfg.n_alpha_for_supervision)
    batch, alpha = create_batch_for_depth_model(rt.dcfg, frames, "supervision")

    key, k = jax.random.split(key)
    if online_learning:
        (variables_depth, opt_states["depth"], depth_loss, depth, mask,
         err_mask) = rt.depth_train_step(
            variables.depth, opt_states["depth"], batch, alpha, k)
        variables = variables._replace(depth=variables_depth)
    else:
        depth_loss, depth, mask, err_mask, _, _, _ = rt.apply_depth_loss(
            variables.depth, batch, alpha, k)

    # Supervision signal: mapping updates + close-to-surface mask + pseudo-GT gains
    if surface_distance is None:
        surface_distance = 3 * scene.proxy_distance
    n_frames_sup = depth.shape[0]
    close_mask = jnp.zeros((scene.proxy.points.shape[0],), bool)
    sup_gains = np.zeros((n_frames_sup,), np.float32)
    for i in range(n_frames_sup):
        cam_i = FoVCamera.create(batch["R"][i : i + 1], batch["T"][i : i + 1],
                                 zfar=rt.dcfg.zfar)
        fov = points_in_fov_mask(scene.proxy.points[None], cam_i, rt.H, rt.W,
                                 fov_range=rt.sensor_range)[0]
        sd = signed_distance_to_depth_maps(
            scene.proxy.points, depth[i : i + 1], mask[i : i + 1], cam_i,
            rt.dcfg.zfar)[0]
        close_mask = close_mask | (fov & (jnp.abs(sd[:, 0]) < surface_distance))

    part_pcs, key = mapping_update(
        rt, scene, depth, mask, err_mask, batch["R"], batch["T"], key,
        carving_tolerance=params.get("carving_tolerance", 0.0),
        score_threshold=params.get("score_threshold", 1.0))
    for i, (pc, valid) in enumerate(part_pcs):
        gain, scene.surface_scene = G.camera_coverage_gain(
            scene.cfg, scene.surface_scene, pc, valid,
            surface_epsilon=params.get("surface_epsilon"))
        sup_gains[i] = float(gain)

    occ_loss = cov_loss = 0.0
    if online_learning and not freeze_scone:
        close_mask = close_mask & (scene.proxy.out_of_field[:, 0] < 1.0)
        visited_R = batch["R"]
        visited_T = batch["T"]
        visited_cams = FoVCamera.create(visited_R, visited_T, zfar=rt.dcfg.zfar)
        visited_X = visited_cams.camera_center()
        key, k = jax.random.split(key)
        (occ_vars, vis_vars, opt_states["scone"], scone_loss, occ_loss,
         cov_loss) = rt.scone_train_step(
            variables.occ, variables.vis, opt_states["scone"], scene.proxy,
            scene.surface_scene, cam.fov_camera_0, close_mask, visited_cams,
            visited_X, jnp.asarray(sup_gains), field, k,
            n_supervision=params.get("n_proxy_point_for_occupancy_supervision",
                                     6000),
            box_diag=box_diag, cell_resolution=scene.cfg.resolution)
        variables = variables._replace(occ=occ_vars, vis=vis_vars)
        occ_loss, cov_loss = float(occ_loss), float(cov_loss)

    losses = {"depth": float(depth_loss), "occ": occ_loss, "cov": cov_loss}
    return variables, opt_states, losses, key


def memory_depth_loop(rt: MacaronsRuntime, memory: Memory, memory_path: str,
                      variables: MacaronsVariables, opt_states: Dict, key,
                      rs: np.random.Generator):
    """Depth replay on random past frames (reference memory_loop :550-573)."""
    n_needed = rt.n_interpolation_steps + rt.dcfg.n_alpha_for_supervision
    got = memory.get_random_frames_for_depth(
        rs, memory_path, n_needed, exclude_traj=memory.current_trajectory())
    if got is None:
        return variables, opt_states, None, key
    traj, last = got
    frames = memory.load_frame_sequence(memory_path, last, n_needed, traj)
    batch, alpha = create_batch_for_depth_model(rt.dcfg, frames, "supervision")
    key, k = jax.random.split(key)
    (depth_vars, opt_states["depth"], loss, *_rest) = rt.depth_train_step(
        variables.depth, opt_states["depth"], batch, alpha, k)
    variables = variables._replace(depth=depth_vars)
    return variables, opt_states, float(loss), key


def memory_scone_loop(rt: MacaronsRuntime, scene: SceneState, memory: Memory,
                      memory_path: str, variables: MacaronsVariables,
                      opt_states: Dict, key, rs: np.random.Generator,
                      n_replay_frames: int = 4):
    """SCONE replay on a saved trajectory (reference memory_scene_loop :576-780).

    Rebuilds a replay world from saved predicted depth maps of another
    trajectory of the SAME scene (proxy layout is name-seeded, so the saved
    snapshots and the current cell tables are layout-compatible), then runs one
    scone supervision step with the depth module untouched.
    """
    params = rt.params
    got = memory.get_random_scene_for_scone(
        rs, memory_path, n_replay_frames,
        exclude_traj=memory.current_trajectory())
    if got is None:
        return variables, opt_states, None, key
    traj, frame_nbs = got

    # Fresh replay state over the same proxy layout
    replay_surface = G.empty_grid(scene.cfg)
    replay_proxy = P.reset_supervision_occ(scene.proxy)._replace(
        view_states=jnp.zeros_like(scene.proxy.view_states),
        out_of_field=jnp.ones_like(scene.proxy.out_of_field),
    )

    depths, masks, errs, Rs, Ts = [], [], [], [], []
    for nb in frame_nbs:
        d = memory.load_depth(memory_path, nb, traj)
        depths.append(d["depth"])
        masks.append(d["mask"])
        errs.append(d["error_mask"])
        Rs.append(d["R"])
        Ts.append(d["T"])
    depth = jnp.concatenate([jnp.asarray(d) for d in depths], axis=0)
    mask = jnp.concatenate([jnp.asarray(m) for m in masks], axis=0)
    err = jnp.concatenate([jnp.asarray(e) for e in errs], axis=0)
    R_b = jnp.concatenate([jnp.asarray(r) for r in Rs], axis=0)
    T_b = jnp.concatenate([jnp.asarray(t) for t in Ts], axis=0)

    replay_scene = SceneState(
        name=scene.name, mesh=scene.mesh, settings=scene.settings,
        cfg=scene.cfg, gt_scene=scene.gt_scene, surface_scene=replay_surface,
        proxy=replay_proxy, cell_table=scene.cell_table, camera=scene.camera,
        proxy_distance=scene.proxy_distance,
    )
    part_pcs, key = mapping_update(
        rt, replay_scene, depth, mask, err, R_b, T_b, key,
        carving_tolerance=params.get("carving_tolerance", 0.0),
        score_threshold=params.get("score_threshold", 1.0))

    # Close-to-surface mask + pseudo-GT gains from the replayed world
    surface_distance = 3 * scene.proxy_distance
    close_mask = jnp.zeros((replay_scene.proxy.points.shape[0],), bool)
    sup_gains = np.zeros((depth.shape[0],), np.float32)
    replay_scene.surface_scene = replay_scene.surface_scene._replace(
        features=jnp.zeros_like(replay_scene.surface_scene.features))
    for i in range(depth.shape[0]):
        cam_i = FoVCamera.create(R_b[i : i + 1], T_b[i : i + 1],
                                 zfar=rt.dcfg.zfar)
        fov = points_in_fov_mask(replay_scene.proxy.points[None], cam_i, rt.H,
                                 rt.W, fov_range=rt.sensor_range)[0]
        sd = signed_distance_to_depth_maps(
            replay_scene.proxy.points, depth[i : i + 1], mask[i : i + 1],
            cam_i, rt.dcfg.zfar)[0]
        close_mask = close_mask | (fov & (jnp.abs(sd[:, 0]) < surface_distance))
    for i, (pc, valid) in enumerate(part_pcs):
        gain, replay_scene.surface_scene = G.camera_coverage_gain(
            replay_scene.cfg, replay_scene.surface_scene, pc, valid,
            surface_epsilon=params.get("surface_epsilon"))
        sup_gains[i] = float(gain)

    prediction_camera = FoVCamera.create(R_b[:1], T_b[:1], zfar=rt.dcfg.zfar)
    key, k_occ = jax.random.split(key)
    proba, pred_mask, harmonics = rt.occupancy_field(
        variables.occ, replay_scene.proxy, replay_scene.surface_scene,
        prediction_camera, k_occ)
    field = R.assemble_scene_field(replay_scene.proxy, proba, pred_mask,
                                   harmonics)
    close_mask = close_mask & (replay_scene.proxy.out_of_field[:, 0] < 1.0)
    visited_cams = FoVCamera.create(R_b, T_b, zfar=rt.dcfg.zfar)
    visited_X = visited_cams.camera_center()
    box_diag = float(np.linalg.norm(
        np.asarray(scene.cfg.x_max) - np.asarray(scene.cfg.x_min)))
    key, k = jax.random.split(key)
    (occ_vars, vis_vars, opt_states["scone"], scone_loss, occ_loss,
     cov_loss) = rt.scone_train_step(
        variables.occ, variables.vis, opt_states["scone"], replay_scene.proxy,
        replay_scene.surface_scene, prediction_camera, close_mask,
        visited_cams, visited_X, jnp.asarray(sup_gains), field, k,
        n_supervision=params.get("n_proxy_point_for_occupancy_supervision",
                                 6000),
        box_diag=box_diag, cell_resolution=scene.cfg.resolution)
    variables = variables._replace(occ=occ_vars, vis=vis_vars)
    return variables, opt_states, float(scone_loss), key


def recompute_mapping(rt: MacaronsRuntime, scene: SceneState, memory: Memory,
                      memory_path: str, variables: MacaronsVariables, key,
                      save_depths: bool = True):
    """Re-predict all trajectory depths, rebuild surface + proxy field
    (reference recompute_mapping :783-1000)."""
    params = rt.params
    scene.surface_scene = G.empty_grid(scene.cfg)
    scene.proxy = P.reset_supervision_occ(scene.proxy)
    scene.proxy = scene.proxy._replace(
        view_states=jnp.zeros_like(scene.proxy.view_states),
        out_of_field=jnp.ones_like(scene.proxy.out_of_field),
    )
    n_total = memory.n_frames(memory_path)
    n_alpha = rt.dcfg.n_alpha
    for last in range(n_alpha, n_total):
        frames = memory.load_frame_sequence(memory_path, last, 1 + n_alpha)
        batch, alpha = create_batch_for_depth_model(rt.dcfg, frames, "inference")
        key, k = jax.random.split(key)
        _, depth, mask, err_mask, _, _, _ = rt.apply_depth_inference(
            variables.depth, batch, alpha, k)
        _, key = mapping_update(
            rt, scene, depth, mask, err_mask, batch["R"], batch["T"], key,
            carving_tolerance=params.get("carving_tolerance", 0.0),
            score_threshold=params.get("score_threshold", 1.0))
        if save_depths:
            memory.save_depth(memory_path, last, depth, mask, err_mask,
                              batch["R"], batch["T"])
    return key


# ---------------------------------------------------------------------------
# Trajectory + epoch drivers (reference train :1018-1371, run_training :1374-1715)
# ---------------------------------------------------------------------------


def run_trajectory(rt: MacaronsRuntime, scene: SceneState, memory: Memory,
                   memory_path: str, variables: MacaronsVariables,
                   opt_states: Dict, key, rs: np.random.Generator,
                   n_poses: int, freeze_scone: bool = False,
                   warmup_phase: bool = False, online_learning: bool = True,
                   n_memory_loops: int = 0, remap_at: Optional[int] = None,
                   verbose: bool = False):
    """Explore one trajectory of n_poses NBV steps in a scene."""
    params = rt.params
    cam = scene.camera
    start = cam.get_random_valid_pose(rs, jnp.asarray(scene.mesh.verts),
                                      proxy_points=scene.proxy.points)
    cam.initialize(start)
    # Prime the frame memory with enough frames for the first depth inference
    for _ in range(1 + rt.dcfg.n_alpha):
        capture_and_save(scene, memory, memory_path)

    losses_acc = {"depth": [], "occ": [], "cov": []}
    for pose_i in range(n_poses):
        if (params.get("recompute_surface_every_n_loop", 20) > 0
                and pose_i > 0
                and pose_i % params.get("recompute_surface_every_n_loop", 20) == 0):
            pts, valid = G.all_points(scene.surface_scene)
            key, k = jax.random.split(key)
            scene.surface_scene = G.fill_cells_progressive(
                scene.cfg, G.empty_grid(scene.cfg), k, pts, valid)

        variables, opt_states, losses, key = nbv_loop_step(
            rt, scene, memory, memory_path, variables, opt_states, key,
            freeze_scone=freeze_scone, warmup_phase=warmup_phase,
            online_learning=online_learning)
        for k_ in losses_acc:
            losses_acc[k_].append(losses[k_])

        for _ in range(n_memory_loops):
            variables, opt_states, mem_loss, key = memory_depth_loop(
                rt, memory, memory_path, variables, opt_states, key, rs)

        if online_learning and not freeze_scone:
            for _ in range(params.get("n_memory_scene_loops", 0)):
                variables, opt_states, _, key = memory_scone_loop(
                    rt, scene, memory, memory_path, variables, opt_states,
                    key, rs,
                    n_replay_frames=rt.n_interpolation_steps)

        if remap_at is not None and pose_i == remap_at:
            key = recompute_mapping(rt, scene, memory, memory_path, variables,
                                    key)

        cov, n_gt = G.scene_coverage(scene.cfg, scene.gt_scene,
                                     scene.surface_scene)
        scene.coverages.append(float(cov))
        if verbose:
            print(f"  pose {pose_i}: losses {losses} coverage {float(cov):.4f}")

    # Save scene snapshots for SCONE replay
    memory.save_surface_scene(memory_path, scene.surface_scene)
    memory.save_occupancy_field(memory_path, scene.proxy)
    memory.save_poses(memory_path, memory.current_epoch,
                      np.concatenate(cam.X_cam_history, 0),
                      np.concatenate(cam.V_cam_history, 0),
                      np.stack(cam.cam_idx_history, 0))
    return variables, opt_states, losses_acc, key


def run_training(params: Params, data_path: Optional[str] = None,
                 weights_dir: str = "weights/macarons",
                 memory_root: Optional[str] = None,
                 max_scenes_per_epoch: Optional[int] = None,
                 verbose: bool = True):
    """Full online training driver (reference run_training :1374-1715)."""
    data_path = data_path or params.data_path
    rs = np.random.default_rng(params.get("random_seed", 42))
    key = jax.random.PRNGKey(params.get("torch_seed", 5))

    dataset = SceneDataset(data_path)
    model = create_macarons_model(params)
    key, k_init = jax.random.split(key)
    variables = init_macarons_variables(params, model, k_init)

    name = params.get("macarons_model_name", "macarons")
    start_epoch = 0
    best_loss = float("inf")
    depth_losses_per_epoch: List[float] = []
    resume_path = os.path.join(weights_dir, f"unvalidated_{name}")
    n_freeze = params.get("n_freeze_epochs", 0)
    warmup_epochs = params.get("warmup_phase_epochs", 0)

    rt = None
    opt_states = None
    all_train_losses = []
    best_val_coverage = -1.0
    for epoch in range(start_epoch, params.get("epochs", 1)):
        t0 = time.time()
        epoch_losses = {"depth": [], "occ": [], "cov": []}
        freeze_scone = epoch < n_freeze
        warmup = epoch < warmup_epochs
        scene_indices = rs.permutation(len(dataset))
        if max_scenes_per_epoch:
            scene_indices = scene_indices[:max_scenes_per_epoch]
        for si in scene_indices:
            item = dataset[int(si)]
            mirrored = ([a for a in range(2) if rs.random() < 0.5]
                        if params.get("random_mirror_scenes", False) else None)
            key, k_scene = jax.random.split(key)
            scene = setup_scene(params, item, k_scene, mirrored_axes=mirrored)
            if rt is None:
                rt = MacaronsRuntime(params, model, scene.cfg, scene.cell_table)
                opt_states = {
                    "depth": rt.depth_tx.init(variables.depth["params"]),
                    "scone": rt.scone_tx.init(
                        {"occ": variables.occ["params"],
                         "vis": variables.vis["params"]}),
                }
            else:
                # Rebind the runtime's cell table to this scene's proxy layout
                rt.occupancy_field = R.make_occupancy_field_fn(
                    model.occ, scene.cfg, scene.cell_table,
                    n_elev=params.get("view_state_n_elev", 7),
                    n_azim=params.get("view_state_n_azim", 14),
                    degree=params.get("harmonic_degree", 8),
                    prediction_neighborhood_size=params.get(
                        "prediction_neighborhood_size", 3.0),
                    k_for_knn=params.get("k_for_knn", 16),
                    max_cells=params.get("n_cell_per_occ_forward_pass", 12),
                    cell_batch=params.get("occ_cell_batch", 2),
                )
                rt._scone_step = None

            mem_root = memory_root or data_path
            memory_path = os.path.join(mem_root, item["scene_name"],
                                       "macarons_memory")
            memory = Memory([memory_path], current_epoch=epoch,
                            n_trajectories=params.get("n_memory_trajectories", 1))
            variables, opt_states, traj_losses, key = run_trajectory(
                rt, scene, memory, memory_path, variables, opt_states, key, rs,
                n_poses=params.get("n_poses_in_trajectory", 100),
                freeze_scone=freeze_scone, warmup_phase=warmup,
                online_learning=params.get("online_learning", True),
                n_memory_loops=params.get("n_memory_loops", 0),
                remap_at=params.get("remap_at_pose"),
                verbose=verbose,
            )
            for k_ in epoch_losses:
                epoch_losses[k_] += traj_losses[k_]
            if verbose:
                print(f"epoch {epoch} scene {item['scene_name']}: final "
                      f"coverage {scene.coverages[-1]:.4f}")

        mean_depth = float(np.mean(epoch_losses["depth"])) if epoch_losses["depth"] else 0.0
        all_train_losses.append(
            {k_: float(np.mean(v)) if v else 0.0 for k_, v in epoch_losses.items()})
        depth_losses_per_epoch.append(mean_depth)

        # Validation: frozen-weights exploration on the val scenes
        # (reference validates coverage periodically; coverage_validated_ ckpt)
        val_coverage = None
        val_scenes = params.get("val_scenes")
        if (val_scenes and params.get("validate_every_n_epochs", 0) > 0
                and (epoch + 1) % params["validate_every_n_epochs"] == 0):
            covs = []
            for vname in val_scenes:
                if vname not in dataset.scene_names:
                    continue
                item = dataset[dataset.scene_names.index(vname)]
                key, k_scene = jax.random.split(key)
                vscene = setup_scene(params, item, k_scene)
                mem_root = memory_root or data_path
                vmem_path = os.path.join(mem_root, vname,
                                         "macarons_memory_val")
                vmem = Memory([vmem_path], current_epoch=epoch)
                _, _, _, key = run_trajectory(
                    rt, vscene, vmem, vmem_path, variables,
                    {"depth": opt_states["depth"], "scone": opt_states["scone"]},
                    key, rs,
                    n_poses=params.get("n_val_poses", 10),
                    online_learning=False, verbose=False)
                covs.append(vscene.coverages[-1])
            if covs:
                val_coverage = float(np.mean(covs))
                if verbose:
                    print(f"epoch {epoch}: val coverage {val_coverage:.4f}")

        meta = {"epoch": epoch, "depth_losses": depth_losses_per_epoch,
                "train_losses": all_train_losses, "best_loss": best_loss,
                "val_coverage": val_coverage}

        # Per-epoch loss curves JSON (reference losses_data_<model>.json dump,
        # train_macarons.py:1693-1712)
        os.makedirs(weights_dir, exist_ok=True)
        import json as _json

        with open(os.path.join(weights_dir, f"losses_data_{name}.json"),
                  "w") as f:
            _json.dump({"train_losses": all_train_losses,
                        "depth_losses": depth_losses_per_epoch}, f, indent=2)
        save_macarons(os.path.join(weights_dir, f"unvalidated_{name}"),
                      variables, meta)
        if mean_depth < best_loss:
            best_loss = mean_depth
            save_macarons(os.path.join(weights_dir, f"best_unval_{name}"),
                          variables, meta)
        if val_coverage is not None and val_coverage > best_val_coverage:
            best_val_coverage = val_coverage
            save_macarons(
                os.path.join(weights_dir, f"coverage_validated_{name}"),
                variables, meta)
        save_macarons(os.path.join(weights_dir, f"epoch_{epoch}_{name}"),
                      variables, meta)

        # Loss-peak rollback (reference reload_previous_model_if_bad_loss :1652-1688)
        thr = params.get("loss_peak_threshold", 0.015)
        if (len(depth_losses_per_epoch) >= 2
                and depth_losses_per_epoch[-1]
                > depth_losses_per_epoch[-2] + thr):
            prev = os.path.join(weights_dir, f"epoch_{epoch - 1}_{name}")
            from ..utils.checkpoint import checkpoint_exists

            if checkpoint_exists(prev):
                rolled, _ = load_macarons(prev, variables)
                # Keep SCONE weights, restore depth only
                variables = variables._replace(depth=rolled.depth)
                if verbose:
                    print(f"loss peak at epoch {epoch}: depth module rolled back")

        if verbose:
            print(f"epoch {epoch} done in {time.time() - t0:.1f}s: "
                  f"{all_train_losses[-1]}")

    return variables, all_train_losses
