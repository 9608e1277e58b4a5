"""Headline benchmark: FULL NBV decision phases per second on the local chip.

Measures the complete decision step of the online loop at the reference's
production scale — the occupancy field (full-size SconeOcc over the top-32
cells of a 100k-proxy scene) + fused all-candidate coverage-gain scoring
(full-size SconeVis, occ-weighted MC sampling, SH ray integration, 30 neighbor
candidates) — and compares it against the reference's launch structure
(Anttwo/MACARONS train_macarons.py:299-315: one launch per candidate).

Timing discipline: NO host<->device transfer happens before or during the
timed loops (a single d2h flips the tunneled TPU runtime into a synchronous
dispatch mode with an ~84 ms per-launch floor; all device-constant tables are
built host-side in numpy).

Prints ONE JSON line:
  {"metric": "nbv_decision_phases_per_sec", "value": ..., "unit": "phases/s",
   "vs_baseline": <fused rate / sequential-candidate-launch rate>}
"""

import json
import sys
import time

from macarons_tpu.utils.platform import configure_platform

configure_platform()  # persistent compilation cache before first backend use

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_decision_phase():
    """Full decision phase at reference scale. Returns (fused_dt, seq_dt)."""
    from macarons_tpu.models.scone import SconeOcc, SconeVis
    from macarons_tpu.ops.geometry import FoVCamera, look_at_view_transform
    from macarons_tpu.scene import grid as G, proxy as P, runtime as R

    N, n_cand = 100_000, 30
    cfg = G.make_grid_config((-10.0,) * 3, (10.0,) * 3, 6, 6, 4,
                             resolution=0.5, feature_dim=1)
    rs = np.random.default_rng(0)
    pts_np = rs.uniform(-10, 10, (N, 3)).astype(np.float32)
    table = R.build_cell_index_table(cfg, pts_np)  # host-side, no d2h
    key = jax.random.PRNGKey(0)
    prox = P.initialize_proxy_points(key, (-10.0,) * 3, (10.0,) * 3, N)
    prox = prox._replace(
        points=jnp.asarray(pts_np),
        supervision_occ=(jax.random.uniform(key, (N, 1)) > 0.3).astype(jnp.float32),
        out_of_field=(jax.random.uniform(jax.random.PRNGKey(2), (N, 1)) > 0.7
                      ).astype(jnp.float32))
    surface = G.fill_cells_progressive(
        cfg, G.empty_grid(cfg), jax.random.PRNGKey(3),
        jax.random.uniform(jax.random.PRNGKey(4), (20000, 3), minval=-9,
                           maxval=9))
    occ_model = SconeOcc()
    occ_vars = occ_model.init(jax.random.PRNGKey(5), jnp.zeros((1, 128, 3)),
                              jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 64)))
    vis_model = SconeVis()
    vis_vars = vis_model.init(jax.random.PRNGKey(6), jnp.zeros((1, 128, 4)),
                              jnp.zeros((1, 128, 64)))

    Rm, Tm = look_at_view_transform(dist=15.0, elev=jnp.array([30.0]),
                                    azim=jnp.array([40.0]))
    cam = FoVCamera.create(Rm, Tm, zfar=50.0)
    Rc, Tc = look_at_view_transform(
        dist=14.0, elev=jnp.linspace(-40, 40, n_cand),
        azim=jnp.linspace(0, 348, n_cand))
    cand_cams = FoVCamera.create(Rc, Tc, zfar=50.0)
    X_cand = cand_cams.camera_center()

    field_fn = R.make_occupancy_field_fn(occ_model, cfg, table, max_cells=32,
                                         cell_batch=2)
    score = R.make_coverage_gain_fn(vis_model, seq_len=2048)
    box_diag = float(np.linalg.norm(np.asarray(cfg.x_max) - np.asarray(cfg.x_min)))

    def decision(key):
        k1, k2 = jax.random.split(key)
        proba, mask, harm = field_fn(occ_vars, prox, surface, cam, k1)
        field = R.assemble_scene_field(prox, proba, mask, harm)
        return score(vis_vars, *field, cand_cams, X_cand, cam, box_diag,
                     cfg.resolution, 60.0, k2)

    def decision_seq(key):
        # The reference's structure: occupancy field + ONE launch per candidate
        k1, k2 = jax.random.split(key)
        proba, mask, harm = field_fn(occ_vars, prox, surface, cam, k1)
        field = R.assemble_scene_field(prox, proba, mask, harm)
        outs = []
        for c in range(n_cand):
            cc = jax.tree_util.tree_map(lambda x: x[c : c + 1], cand_cams)
            outs.append(score(vis_vars, *field, cc, X_cand[c : c + 1], cam,
                              box_diag, cfg.resolution, 60.0,
                              jax.random.fold_in(k2, c)))
        return outs[-1]

    def decision_full(key):
        # Production default since r3: EVERY eligible cell predicted per phase
        # (reference macarons_utils.py:1433-1441), via the on-device chunked
        # while_loop over eligibility-ranked cells.
        k1, k2 = jax.random.split(key)
        proba, mask, harm = field_fn(occ_vars, prox, surface, cam, k1,
                                     full_field=True)
        field = R.assemble_scene_field(prox, proba, mask, harm)
        return score(vis_vars, *field, cand_cams, X_cand, cam, box_diag,
                     cfg.resolution, 60.0, k2)

    decision(jax.random.PRNGKey(10)).block_until_ready()
    n_iter = 20
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = decision(jax.random.PRNGKey(20 + i))
    out.block_until_ready()
    fused_dt = (time.perf_counter() - t0) / n_iter

    decision_full(jax.random.PRNGKey(12)).block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = decision_full(jax.random.PRNGKey(60 + i))
    out.block_until_ready()
    full_dt = (time.perf_counter() - t0) / n_iter

    decision_seq(jax.random.PRNGKey(11)).block_until_ready()
    n_seq = 3
    t0 = time.perf_counter()
    for i in range(n_seq):
        out = decision_seq(jax.random.PRNGKey(40 + i))
    out.block_until_ready()
    seq_dt = (time.perf_counter() - t0) / n_seq
    return fused_dt, seq_dt, full_dt


def bench_scorer_micro():
    from macarons_tpu.models.scone import SconeVis, compute_coverage_gain

    seq_len, n_cam, n_harmonics = 2048, 52, 64
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    model = SconeVis()
    pts = jax.random.normal(k1, (1, seq_len, 4)) * 0.3
    vh = jax.random.normal(k2, (1, seq_len, n_harmonics)) * 0.1
    X_cam = jax.random.normal(k3, (1, n_cam, 3)) * 1.5
    variables = jax.jit(model.init)(k4, pts, vh)

    # --- fused: model forward + all candidates in one launch -----------------
    @jax.jit
    def fused(v, pts, vh, X_cam):
        harmonics = model.apply(v, pts, vh)
        return compute_coverage_gain(pts, harmonics, X_cam)

    # --- sequential: the reference's launch structure: one candidate a time --
    @jax.jit
    def score_one(v, pts, vh, X_one):
        harmonics = model.apply(v, pts, vh)
        return compute_coverage_gain(pts, harmonics, X_one)

    fused(variables, pts, vh, X_cam).block_until_ready()
    score_one(variables, pts, vh, X_cam[:, :1]).block_until_ready()
    log("compiled; backend:", jax.default_backend())

    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fused(variables, pts, vh, X_cam)
    out.block_until_ready()
    fused_dt = (time.perf_counter() - t0) / n_iter
    fused_rate = n_cam / fused_dt

    n_seq_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_seq_iter):
        for c in range(n_cam):
            out = score_one(variables, pts, vh, X_cam[:, c : c + 1])
    out.block_until_ready()
    seq_dt = (time.perf_counter() - t0) / n_seq_iter
    seq_rate = n_cam / seq_dt

    log(f"micro fused: {fused_dt * 1e3:.2f} ms/52 cands -> {fused_rate:.0f} evals/s")
    log(f"micro sequential: {seq_dt * 1e3:.2f} ms/52 cands -> {seq_rate:.0f} evals/s")
    return fused_rate, seq_rate


def bench_depth_fps():

    # --- secondary: depth FPS at reference scale (stderr diagnostic) ---------
    try:
        from macarons_tpu.models.many_depth import ManyDepth

        dm = ManyDepth()
        kk = jax.random.split(jax.random.PRNGKey(1), 4)
        x = jax.random.uniform(kk[0], (1, 256, 456, 3))
        xa = jax.random.uniform(kk[1], (1, 2, 256, 456, 3))
        R = jnp.eye(3)[None]
        T = jnp.zeros((1, 3))
        gt_pose = jnp.zeros((1, 2, 6))
        dvars = jax.jit(dm.init)(kk[2], x, xa, R, T, gt_pose=gt_pose)

        @jax.jit
        def depth_fwd(v, x, xa, R, T, gp):
            return dm.apply(v, x, xa, R, T, gt_pose=gp)[1]

        depth_fwd(dvars, x, xa, R, T, gt_pose).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            out = depth_fwd(dvars, x, xa, R, T, gt_pose)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 10
        log(f"depth forward (256x456, 96 planes): {dt * 1e3:.1f} ms -> "
            f"{1.0 / dt:.1f} FPS")
    except Exception as e:  # diagnostics must never break the headline metric
        log("depth FPS measurement failed:", repr(e))


def bench_pose_loop():
    """End-to-end online-loop pose rate: capture (4-step interpolated move,
    one batched render of a ~51k-face scene) + decision phase + depth/scone
    optimizer steps + supervision signal — the full nbv_loop_step at
    reference scale (256x456 frames, 100k proxies, 2048-pt transformers)."""
    import tempfile

    from macarons_tpu.config import Params
    from macarons_tpu.data.mesh_io import Mesh, save_obj
    from macarons_tpu.data.scenes import SceneDataset
    from macarons_tpu.models.macarons import (
        create_macarons_model, init_macarons_variables,
    )
    from macarons_tpu.scene.memory import Memory
    from macarons_tpu.trainers import train_macarons as TM

    # UV-sphere scene mesh: 2 * 159 * 160 = 50,880 faces
    n_t, n_p = 160, 161
    theta = np.linspace(0.12, np.pi - 0.12, n_t)
    phi = np.linspace(0, 2 * np.pi, n_p)[:-1]
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    r = 5.0
    verts = np.stack([r * np.sin(tt) * np.cos(pp), r * np.cos(tt),
                      r * np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    idx = np.arange(n_t * (n_p - 1)).reshape(n_t, n_p - 1)
    c0 = idx[:-1, :]
    c1 = np.roll(idx, -1, axis=1)[:-1, :]
    c2 = idx[1:, :]
    c3 = np.roll(idx, -1, axis=1)[1:, :]
    faces = np.concatenate([
        np.stack([c0, c1, c2], -1).reshape(-1, 3),
        np.stack([c1, c3, c2], -1).reshape(-1, 3)]).astype(np.int32)
    colors = ((verts / r) * 0.5 + 0.5).astype(np.float32)

    tmp = tempfile.mkdtemp(prefix="bench_scene_")
    sdir = f"{tmp}/sphere"
    import os

    os.makedirs(sdir, exist_ok=True)
    save_obj(f"{sdir}/mesh.obj",
             Mesh(verts.astype(np.float32), faces, colors))
    with open(f"{sdir}/settings.json", "w") as f:
        json.dump({
            "scene": {"x_min": [-6, -6, -6], "x_max": [6, 6, 6],
                      "grid_l": 4, "grid_w": 4, "grid_h": 4},
            "camera": {"x_min": [-9, -9, -9], "x_max": [9, 9, 9],
                       "pose_l": 5, "pose_w": 5, "pose_h": 5,
                       "pose_n_elev": 5, "pose_n_azim": 8,
                       "start_positions": []},
            "contrast_factor": 1.0,
        }, f)

    params = Params(dict(
        image_height=256, image_width=456, znear=0.5, zfar=750.0,
        n_alpha=2, n_alpha_for_supervision=2, alphas=[-2, -1],
        n_interpolation_steps=4, n_proxy_points=100_000, seq_len=2048,
        n_gt_surface_points=16384, surface_cell_resolution=0.25,
        sensor_range=60.0, gathering_factor=0.05, learning_rate=1e-4,
        data_augmentation=False, scene_scale_factor=1.0,
        n_proxy_point_for_occupancy_supervision=6000,
        data_path=tmp, load_obj_textures=False,
    ))
    dataset = SceneDataset(tmp)
    model = create_macarons_model(params)
    key = jax.random.PRNGKey(0)
    variables = init_macarons_variables(params, model, jax.random.PRNGKey(1))
    rs = np.random.default_rng(0)
    scene = TM.setup_scene(params, dataset[0], key)
    rt = TM.MacaronsRuntime(params, model, scene.cfg, scene.cell_table)
    import optax  # noqa: F401  (tx built inside the runtime)

    opt_states = {
        "depth": rt.depth_tx.init(variables.depth["params"]),
        "scone": rt.scone_tx.init({"occ": variables.occ["params"],
                                   "vis": variables.vis["params"]}),
    }
    mp = f"{tmp}/mem"
    # ZERO-SYNC pose loop: episode control, frame persistence, and metrics
    # all stay on device — the tunneled runtime permanently degrades to
    # synchronous dispatch after ANY d2h (731 vs 2.2 ms per depth step), so
    # the bench never pulls; it only blocks on the last pose's loss.
    from macarons_tpu.scene.memory import DeviceMemory

    n_iter = 10
    n_warm = 2
    dmem = DeviceMemory(
        [mp], max_frames=1 + rt.dcfg.n_alpha
        + (n_iter + n_warm) * rt.n_interpolation_steps,
        height=rt.H, width=rt.W, zfar=params.get("zfar"))
    store = dmem.begin_trajectory(mp)
    scene.episode, scene.ring, store, key = rt.start_trajectory_device(
        scene, store, key, max_moves=n_iter + n_warm + 1,
        max_frames=dmem.max_frames)
    dmem.update_store(mp, store, 1 + rt.dcfg.n_alpha)

    # Warmup poses compile every program
    for _ in range(n_warm):
        variables, opt_states, losses, key = TM.nbv_loop_step_device(
            rt, scene, dmem, mp, variables, opt_states, key)
    jax.block_until_ready(losses["depth"])
    t0 = time.perf_counter()
    for _ in range(n_iter):
        variables, opt_states, losses, key = TM.nbv_loop_step_device(
            rt, scene, dmem, mp, variables, opt_states, key)
    jax.block_until_ready(losses["depth"])
    dt = (time.perf_counter() - t0) / n_iter
    log(f"online pose loop (capture+decision+supervision+train, 50,880 faces,"
        f" zero-sync): {dt * 1e3:.1f} ms/pose -> {1.0 / dt:.2f} poses/s")
    return 1.0 / dt


def main():
    log("backend:", jax.default_backend())
    if "--only-pose" in sys.argv:
        # Iteration helper: just the end-to-end pose-loop rate (the full run
        # re-measures everything; the pose loop MUST have the chip to itself —
        # a concurrent client on the single-tenant chip poisons the numbers).
        poses_per_sec = bench_pose_loop()
        print(json.dumps({
            "metric": "online_nbv_poses_per_sec",
            "value": round(poses_per_sec, 3),
            "unit": "poses/s",
            "vs_baseline": round(1.0, 2),
        }))
        return
    # Headline FIRST: nothing before it may trigger a device->host transfer
    fused_dt, seq_dt, full_dt = bench_decision_phase()
    log(f"decision phase fused: {fused_dt * 1e3:.2f} ms "
        f"(occ field + 30-candidate scoring) -> {1.0 / fused_dt:.1f} phases/s")
    log(f"decision phase FULL-FIELD (all eligible cells, production default): "
        f"{full_dt * 1e3:.2f} ms -> {1.0 / full_dt:.1f} phases/s")
    log(f"decision phase sequential-candidates: {seq_dt * 1e3:.2f} ms "
        f"-> {1.0 / seq_dt:.1f} phases/s")

    poses_per_sec = None
    try:
        bench_scorer_micro()
        bench_depth_fps()
        poses_per_sec = bench_pose_loop()
    except Exception as e:
        log("diagnostics failed:", repr(e))

    if poses_per_sec is not None:
        print(json.dumps({
            "metric": "online_nbv_poses_per_sec",
            "value": round(poses_per_sec, 3),
            "unit": "poses/s",
            "vs_baseline": round(1.0, 2),
        }))
    # The driver records the LAST JSON line as the headline metric.
    print(json.dumps({
        "metric": "nbv_decision_phases_per_sec",
        "value": round(1.0 / fused_dt, 2),
        "unit": "phases/s",
        "vs_baseline": round(seq_dt / fused_dt, 2),
    }))


if __name__ == "__main__":
    main()
