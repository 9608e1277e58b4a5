"""Headline benchmark: FULL NBV decision phases per second on the local chip.

Measures the complete decision step of the online loop at the reference's
production scale — the occupancy field (full-size SconeOcc over the top-32
cells of a 100k-proxy scene) + fused all-candidate coverage-gain scoring
(full-size SconeVis, occ-weighted MC sampling, SH ray integration, 30 neighbor
candidates) — and compares it against the reference's launch structure
(Anttwo/MACARONS train_macarons.py:299-315: one launch per candidate).

Timing discipline (measured on the tunneled v5e runtime, round 3):
- `jax.block_until_ready` DOES NOT WAIT on this runtime (0.04 ms observed
  against a 5.3 s computation) — it only confirms enqueue. Every timed region
  therefore ends with ONE device->host scalar pull, which is the only
  operation that actually waits for the device; the pull's own RTT is
  measured by re-pulling the ready buffer and subtracted.
- That single pull permanently flips the process into synchronous dispatch,
  so EACH measurement runs in its own subprocess (`bench.py --stage X`); the
  parent orchestrates and never touches a device.
- No d2h happens before or during a timed region, device-constant tables are
  host numpy, and all device data is passed as jit arguments (closing over a
  committed device array also degrades dispatch).

Headline JSON line (printed IMMEDIATELY after the decision bracket, and
re-printed as the last line so the driver's last-JSON-line convention holds):
  {"metric": "nbv_decision_phases_per_sec", "value": ..., "unit": "phases/s",
   "vs_baseline": <sequential-candidate-launch time / fused full-field time>,
   "calib_tflops": <same-session f32 matmul probe>}

Driver-proofing (round 5): a global wall-clock budget (MACARONS_BENCH_BUDGET_S,
default 1200 s) bounds the whole run; the calib probe scales every stage's
iteration count, flips sick sessions to exact pull-drain (sync) timing, and
falls back to a reduced-scale decision program when even minimal production-
scale iterations would blow the budget. The micro/pose tail is optional and
budget-gated — a degraded session costs tail stages, never the headline.
"""

import json
import os
import subprocess
import sys
import time

_IS_STAGE = "--stage" in sys.argv

if _IS_STAGE or "--only-pose" in sys.argv:
    from macarons_tpu.utils.platform import configure_platform

    configure_platform()  # persistent compilation cache before first backend use

    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _iter_scale():
    """Session-health iteration multiplier set by the orchestrator (from the
    calib stage): 1.0 on a healthy chip, <1 on a degraded shared-pool window
    so stages still finish inside the global wall-clock budget."""
    v = os.environ.get("MACARONS_BENCH_ITER_SCALE")
    return float(v) if v else 1.0


def _n(default, floor=2):
    return max(floor, int(round(default * _iter_scale())))


_SYNC_MODE = bool(os.environ.get("MACARONS_BENCH_SYNC"))


def _measure(step, n_iter, drain_s=4.0, label=""):
    """Time n_iter enqueues of `step(i)` against an end-of-run scalar pull.

    step(i) must enqueue iteration i (inputs varied by i — the tunnel elides
    nothing, but sync-free loops need fresh inputs to be realistic) and return
    a device array. Protocol: warm (compile) -> sleep-drain (no d2h; block_
    until_ready would not actually wait) -> enqueue n_iter -> pull ONE scalar
    (waits for the whole serial stream) -> subtract the pull RTT measured on
    the now-ready buffer.

    MACARONS_BENCH_SYNC=1 (set by the orchestrator on degraded sessions where
    per-iter device time dwarfs the per-launch RTT): the warmup output is
    PULLED instead of sleep-drained — an exact drain that flips the process
    into synchronous dispatch, so the timed loop measures true device time
    plus one RTT per launch. Used when absolute precision no longer matters
    (only the same-session structural ratio does) and guessed sleep drains
    would either waste budget or under-drain the warmup tail."""
    out = step(0)
    if _SYNC_MODE:
        np.asarray(jnp.sum(out))  # exact drain; process goes sync-dispatch
        del out
    else:
        del out
        time.sleep(drain_s)  # warmup tail; block_until_ready would lie
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(i)
    s = jnp.sum(out)
    t_enq = time.perf_counter() - t0
    np.asarray(s)  # THE wait (first d2h: process is sync-dispatch after this)
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(s)  # ready buffer: pull RTT alone
    rtt = time.perf_counter() - t0
    dt = max(total - rtt, 1e-9) / n_iter
    log(f"{label}: {dt * 1e3:.2f} ms/iter (n={n_iter}, enqueue "
        f"{t_enq * 1e3:.1f} ms, total {total * 1e3:.1f} ms, rtt "
        f"{rtt * 1e3:.1f} ms)")
    if not _SYNC_MODE and t_enq > 0.5 * (total - rtt):
        log(f"{label}: WARNING enqueue-bound measurement (host dispatch "
            f"dominates); treat as an upper bound on throughput")
    return dt


# --------------------------------------------------------------------------
# Decision-phase stages
# --------------------------------------------------------------------------

def setup_decision():
    """Production-scale decision-phase closures (fused / full-field / the
    reference's sequential launch structure).

    MACARONS_BENCH_SCALE=reduced (set by the orchestrator when the calib
    probe says the session is too degraded to finish the production-scale
    bracket inside the budget): a ~8x-smaller program with the SAME launch
    structure — the headline vs_baseline is a structural launch-count ratio,
    so it stays meaningful at reduced scale (and the JSON says so)."""
    from macarons_tpu.models.scone import SconeOcc, SconeVis
    from macarons_tpu.ops.geometry import FoVCamera, look_at_view_transform
    from macarons_tpu.scene import grid as G, proxy as P, runtime as R

    reduced = os.environ.get("MACARONS_BENCH_SCALE") == "reduced"
    if reduced:
        N, n_cand, n_surf, seq_len = 20_000, 10, 6000, 1024
        grid_dims, max_cells = (4, 4, 3), 16
    else:
        N, n_cand, n_surf, seq_len = 100_000, 30, 20000, 2048
        grid_dims, max_cells = (6, 6, 4), 32
    cfg = G.make_grid_config((-10.0,) * 3, (10.0,) * 3, *grid_dims,
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
        jax.random.uniform(jax.random.PRNGKey(4), (n_surf, 3), minval=-9,
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

    # Full-field while_loop chunk (A/B hook: MACARONS_BENCH_FF_CHUNK sweeps
    # it same-session; 0/unset keeps max_cells). cell_batch >= chunk keeps
    # every chunk a single batched SconeOcc forward.
    ff_chunk = int(os.environ.get("MACARONS_BENCH_FF_CHUNK", "0")) or None
    field_fn = R.make_occupancy_field_fn(occ_model, cfg, table,
                                         max_cells=max_cells,
                                         cell_batch=max(max_cells,
                                                        ff_chunk or 0),
                                         full_field_chunk=ff_chunk)
    score = R.make_coverage_gain_fn(vis_model, seq_len=seq_len)
    box_diag = float(np.linalg.norm(np.asarray(cfg.x_max) - np.asarray(cfg.x_min)))

    def decision(key):
        k1, k2 = jax.random.split(key)
        proba, mask, harm = field_fn(occ_vars, prox, surface, cam, k1)
        field = R.assemble_scene_field(prox, proba, mask, harm)
        return score(vis_vars, *field, cand_cams, X_cand, cam, box_diag,
                     cfg.resolution, 60.0, k2)

    def decision_seq(key):
        # The reference's structure: occupancy field (same production
        # full-field coverage) + ONE launch per candidate
        k1, k2 = jax.random.split(key)
        proba, mask, harm = field_fn(occ_vars, prox, surface, cam, k1,
                                     full_field=True)
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

    return decision, decision_seq, decision_full


def stage_decision():
    decision, _, _ = setup_decision()
    dt = _measure(lambda i: decision(jax.random.PRNGKey(20 + i)), _n(30),
                  drain_s=20.0,
                  label="decision phase fused (occ field + 30-cand scoring)")
    return {"decision_ms": dt * 1e3}


def stage_decision_full():
    _, _, decision_full = setup_decision()
    dt = _measure(lambda i: decision_full(jax.random.PRNGKey(60 + i)), _n(20),
                  drain_s=60.0,
                  label="decision phase FULL-FIELD (all eligible cells)")
    return {"decision_full_ms": dt * 1e3}


def stage_decision_seq():
    _, decision_seq, _ = setup_decision()
    dt = _measure(lambda i: decision_seq(jax.random.PRNGKey(40 + i)),
                  _n(3, floor=1), drain_s=90.0,
                  label="decision phase sequential-candidates (reference "
                  "launch structure)")
    return {"decision_seq_ms": dt * 1e3}


def stage_calib():
    """Session-health probe: known-FLOPs f32 matmul. The shared-pool tunnel's
    throughput varies by >100x between sessions (0.59 vs 72.7 TFLOP/s
    measured a day apart), so absolute stage timings are only comparable
    WITHIN a session; the headline's vs_baseline is a same-session structural
    ratio and stays meaningful regardless."""
    n = 8192
    # Generated ON DEVICE: a 256 MB device_put hangs indefinitely when the
    # tunnel itself is sick (observed r5: the h2d blocked >20 min while a
    # 16 MB transfer went through), and the calib must never be the stage
    # that wedges the whole bench.
    a = jax.jit(lambda k: jax.random.normal(k, (n, n), jnp.float32))(
        jax.random.PRNGKey(0))
    f = jax.jit(lambda x, i: x @ (x + i))
    dt = _measure(lambda i: f(a, float(i)), _n(20, floor=3), drain_s=10.0,
                  label="calibration f32 8192^3 matmul")
    return {"calib_matmul_ms": dt * 1e3, "calib_tflops": 2 * n**3 / dt / 1e12}


# --------------------------------------------------------------------------
# Micro diagnostics
# --------------------------------------------------------------------------

def stage_scorer():
    from macarons_tpu.models.scone import SconeVis, compute_coverage_gain

    seq_len, n_cam = 2048, 52
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    model = SconeVis()
    pts = jax.random.normal(k1, (1, seq_len, 4)) * 0.3
    vh = jax.random.normal(k2, (1, seq_len, 64)) * 0.1
    X_cam = jax.random.normal(k3, (1, n_cam, 3)) * 1.5
    variables = jax.jit(model.init)(k4, pts, vh)

    @jax.jit
    def fused(v, pts, vh, X_cam, key):
        harmonics = model.apply(v, pts + 0.0 * jax.random.uniform(key, (1,)),
                                vh)
        return compute_coverage_gain(pts, harmonics, X_cam)

    dt = _measure(
        lambda i: fused(variables, pts, vh, X_cam, jax.random.PRNGKey(i)),
        _n(30), label=f"scorer micro fused ({n_cam} cands/launch)")
    return {"scorer_fused_ms": dt * 1e3, "n_cam": n_cam}


def stage_depth():
    from macarons_tpu.models.many_depth import ManyDepth

    # f32 arrays (the production default): TPU matmuls already run bf16
    # passes internally at default precision; explicit bf16 storage hits a
    # ~465x fallback on the axon runtime (see create_macarons_model).
    dm = ManyDepth()
    kk = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.uniform(kk[0], (1, 256, 456, 3))
    xa = jax.random.uniform(kk[1], (1, 2, 256, 456, 3))
    R = jnp.eye(3)[None]
    T = jnp.zeros((1, 3))
    gt_pose = jnp.zeros((1, 2, 6))
    dvars = jax.jit(dm.init)(kk[2], x, xa, R, T, gt_pose=gt_pose)

    @jax.jit
    def depth_fwd(v, x, xa, R, T, gp, key):
        return dm.apply(v, x + 0.0 * jax.random.uniform(key, (1,)), xa, R, T,
                        gt_pose=gp)[1]

    dt = _measure(
        lambda i: depth_fwd(dvars, x, xa, R, T, gt_pose,
                            jax.random.PRNGKey(i)),
        _n(20), label="depth forward (256x456, 96 planes)")
    return {"depth_fwd_ms": dt * 1e3}


# --------------------------------------------------------------------------
# End-to-end online pose loop
# --------------------------------------------------------------------------

def setup_pose(n_iter=None, n_warm=2):
    """Shared production-scale online-loop context (scene, runtime, device
    memory, primed trajectory) for the pose stage and the per-phase budget
    stages."""
    import tempfile

    if n_iter is None:
        n_iter = _n(20)

    from macarons_tpu.config import Params
    from macarons_tpu.data.mesh_io import Mesh, save_obj
    from macarons_tpu.data.scenes import SceneDataset
    from macarons_tpu.models.macarons import (
        create_macarons_model, init_macarons_variables,
    )
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
    # A/B hook: stage children inherit the orchestrator's env, so a sweep can
    # override any trainer param (e.g. occ_supervision_cell_batch) without
    # touching this file. Same-session adjacent-window runs only — absolute
    # timings are meaningless across sessions (see CRITICAL facts, ROADMAP).
    for k, v in json.loads(
            os.environ.get("MACARONS_BENCH_PARAMS", "{}")).items():
        params[k] = v
    dataset = SceneDataset(tmp)
    model = create_macarons_model(params)
    key = jax.random.PRNGKey(0)
    variables = init_macarons_variables(params, model, jax.random.PRNGKey(1))
    scene = TM.setup_scene(params, dataset[0], key)
    rt = TM.MacaronsRuntime(params, model, scene.cfg, scene.cell_table)

    opt_states = {
        "depth": rt.depth_tx.init(variables.depth["params"]),
        "scone": rt.scone_tx.init({"occ": variables.occ["params"],
                                   "vis": variables.vis["params"]}),
    }
    mp = f"{tmp}/mem"
    # ZERO-SYNC pose loop: episode control, frame persistence, and metrics
    # all stay on device; the ONE d2h pull happens after the timed region.
    from macarons_tpu.scene.memory import DeviceMemory

    dmem = DeviceMemory(
        [mp], max_frames=1 + rt.dcfg.n_alpha
        + (n_iter + n_warm) * rt.n_interpolation_steps,
        height=rt.H, width=rt.W, zfar=params.get("zfar"))
    store = dmem.begin_trajectory(mp)
    scene.episode, scene.ring, store, key = rt.start_trajectory_device(
        scene, store, key, max_moves=n_iter + n_warm + 1,
        max_frames=dmem.max_frames)
    dmem.update_store(mp, store, 1 + rt.dcfg.n_alpha)
    return rt, scene, dmem, mp, variables, opt_states, key, n_iter, n_warm


def stage_pose():
    """End-to-end online-loop pose rate: capture (4-step interpolated move,
    one batched render of a ~51k-face scene) + decision phase + depth/scone
    optimizer steps + supervision signal — the full nbv_loop_step at
    reference scale (256x456 frames, 100k proxies, 2048-pt transformers)."""
    from macarons_tpu.trainers import train_macarons as TM

    rt, scene, dmem, mp, variables, opt_states, key, n_iter, n_warm = \
        setup_pose()
    # Warmup poses compile every program; the sleep drains the device queue
    # (block_until_ready does NOT wait on the tunneled runtime)
    for _ in range(n_warm):
        variables, opt_states, losses, key = TM.nbv_loop_step_device(
            rt, scene, dmem, mp, variables, opt_states, key)
    time.sleep(45.0)  # must exceed the warm poses' device time (~6 s each)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        variables, opt_states, losses, key = TM.nbv_loop_step_device(
            rt, scene, dmem, mp, variables, opt_states, key)
    t_enq = time.perf_counter() - t0
    np.asarray(losses["depth"])  # THE wait
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(losses["depth"])
    rtt = time.perf_counter() - t0
    dt = max(total - rtt, 1e-9) / n_iter
    log(f"online pose loop (capture+decision+supervision+train, 50,880 faces,"
        f" zero-sync): {dt * 1e3:.1f} ms/pose -> {1.0 / dt:.2f} poses/s "
        f"(n={n_iter}, enqueue {t_enq * 1e3:.1f} ms, rtt {rtt * 1e3:.1f} ms)")
    return {"pose_ms": dt * 1e3, "poses_per_sec": 1.0 / dt}


def _pose_phase_stage(phase):
    """Device-time budget for ONE phase of the online pose loop
    (VERDICT r3: attribute the 4 s/pose across decision+capture / depth
    step / scone supervision). Each phase gets its own subprocess; one full
    warm pose primes every compiled program and provides realistic inputs."""
    import jax  # noqa: F811
    from macarons_tpu.trainers import train_macarons as TM

    rt, scene, dmem, mp, variables, opt_states, key, n_iter, n_warm = \
        setup_pose()
    params = rt.params
    box_diag = float(np.linalg.norm(
        np.asarray(scene.cfg.x_max) - np.asarray(scene.cfg.x_min)))
    surface_distance = 3.0 * scene.proxy_distance
    R0, T0 = scene.episode.R, scene.episode.T

    # One warm pose compiles all three programs and yields phase inputs
    for _ in range(n_warm):
        variables, opt_states, losses, key = TM.nbv_loop_step_device(
            rt, scene, dmem, mp, variables, opt_states, key)

    if phase == "dmc":
        def step(i):
            nonlocal key
            (scene.episode, scene.ring, store, scene.surface_scene,
             scene.proxy, field, key) = rt.decide_move_capture(
                variables, scene, dmem.store(mp), key, box_diag,
                vs_distance=3.0 * scene.proxy_distance)
            dmem.update_store(mp, store, rt.n_interpolation_steps)
            return field[2]
    elif phase == "depth":
        def step(i):
            nonlocal key, variables, opt_states
            key, k = jax.random.split(key)
            (vd, opt_states["depth"], depth_loss, *_ ) = \
                rt.depth_train_step_ring(
                    variables.depth, opt_states["depth"], scene.ring, k,
                    online=True)
            variables = variables._replace(depth=vd)
            return depth_loss
    elif phase == "scone":
        # Fixed realistic inputs from one decision+depth pass
        (scene.episode, scene.ring, store, scene.surface_scene, scene.proxy,
         field, key) = rt.decide_move_capture(
            variables, scene, dmem.store(mp), key, box_diag,
            vs_distance=3.0 * scene.proxy_distance)
        dmem.update_store(mp, store, rt.n_interpolation_steps)
        key, k = jax.random.split(key)
        (_, _, _, depth, mask, err_mask, batch_R, batch_T) = \
            rt.depth_train_step_ring(variables.depth, opt_states["depth"],
                                     scene.ring, k, online=True)

        def step(i):
            nonlocal key, variables, opt_states
            (occ_vars, vis_vars, opt_states["scone"], _, occ_loss, cov_loss,
             scene.surface_scene, scene.proxy, key) = rt.scone_supervise_step(
                variables.occ, variables.vis, opt_states["scone"],
                scene.proxy, scene.surface_scene, scene.cfg, R0, T0, depth,
                mask, err_mask, batch_R, batch_T, field, key,
                box_diag=box_diag, cell_resolution=scene.cfg.resolution,
                surface_distance=surface_distance,
                vs_distance=3.0 * scene.proxy_distance, train=True)
            variables = variables._replace(occ=occ_vars, vis=vis_vars)
            return occ_loss
    else:
        raise ValueError(phase)

    dt = _measure(step, n_iter, drain_s=45.0,
                  label=f"pose phase [{phase}]")
    return {f"{phase}_ms": dt * 1e3}


def stage_phase_dmc():
    return _pose_phase_stage("dmc")


def stage_phase_depth():
    return _pose_phase_stage("depth")


def stage_phase_scone():
    return _pose_phase_stage("scone")


STAGES = {
    "calib": stage_calib,
    "decision": stage_decision,
    "decision_full": stage_decision_full,
    "decision_seq": stage_decision_seq,
    "scorer": stage_scorer,
    "depth": stage_depth,
    "pose": stage_pose,
    "phase_dmc": stage_phase_dmc,
    "phase_depth": stage_phase_depth,
    "phase_scone": stage_phase_scone,
}


_DEADLINE = None  # set by the orchestrator: absolute perf_counter deadline


def _remaining():
    return 1e9 if _DEADLINE is None else _DEADLINE - time.perf_counter()


def _run_stage_subprocess(name, calib_tflops=None):
    """Run one measurement in a fresh process (the end-of-region d2h pull
    flips a process into synchronous dispatch permanently — results from a
    second measurement in the same process would be garbage). The subprocess
    is killed at the orchestrator's global deadline; the parsed stage dict is
    logged as a JSON line (stderr) with the session calibration attached so
    every recorded number carries its health context."""
    budget = _remaining()
    if budget < 30:
        log(f"stage {name}: SKIPPED (global budget exhausted)")
        return None
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--stage", name],
                           capture_output=True, text=True,
                           timeout=min(budget, 3600))
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
        log(f"stage {name}: KILLED at the global deadline "
            f"({budget:.0f} s budget)")
        return None
    if r.stderr:
        sys.stderr.write(r.stderr)
        sys.stderr.flush()
    if r.returncode != 0:
        log(f"stage {name} failed (rc {r.returncode})")
        return None
    try:
        out = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:
        log(f"stage {name}: unparseable output {e!r}")
        return None
    rec = dict(out)
    rec["stage"] = name
    if calib_tflops is not None:
        rec["calib_tflops"] = round(calib_tflops, 4)
    if os.environ.get("MACARONS_BENCH_SCALE") == "reduced":
        rec["scale"] = "reduced"
    log(json.dumps(rec))
    return out


# Healthy-session reference points for budget planning (v5e-1, round 3/4):
# the f32 8192^3 calib matmul measures ~70 TFLOP/s and one full-field
# decision phase takes ~1-8 s. Planning uses the conservative end.
_HEALTHY_TFLOPS = 70.0
_T_FULL_HEALTHY_S = 4.0


def main():
    global _DEADLINE
    if _IS_STAGE:
        name = sys.argv[sys.argv.index("--stage") + 1]
        log("backend:", jax.default_backend())
        out = STAGES[name]()
        print(json.dumps(out), flush=True)
        return

    if "--only-pose" in sys.argv:
        # Iteration helper: just the end-to-end pose-loop rate. Safe to run
        # in-process: the stage's single d2h pull comes after its timed
        # region and the process exits right away. No A100 reference
        # measurement exists for this loop in this environment, so
        # vs_baseline is null, not a fabricated 1.0.
        log("backend:", jax.default_backend())
        out = stage_pose()
        print(json.dumps({
            "metric": "online_nbv_poses_per_sec",
            "value": round(out["poses_per_sec"], 3),
            "unit": "poses/s",
            "vs_baseline": None,
        }))
        return

    # Orchestrator: one subprocess per measurement; this process never
    # touches a device (the chip is single-tenant). Global wall-clock budget
    # (driver-proofing, round 5): the headline bracket runs FIRST, its JSON
    # is printed the moment it completes, and every later stage is optional —
    # a degraded shared-pool session degrades the tail, never the headline.
    budget_s = float(os.environ.get("MACARONS_BENCH_BUDGET_S", "1200"))
    _DEADLINE = time.perf_counter() + budget_s
    # Calibration stays cheap even when the session is sick (r4's mistake:
    # 20 fixed iters = 357 s of calibration in a 700x-degraded window).
    os.environ["MACARONS_BENCH_ITER_SCALE"] = "0.15"  # -> 3 calib iters
    calib = _run_stage_subprocess("calib")
    tflops = calib["calib_tflops"] if calib else _HEALTHY_TFLOPS
    degradation = _HEALTHY_TFLOPS / max(tflops, 1e-6)
    if calib is not None:
        log(f"session calibration: {tflops:.2f} TFLOP/s f32 matmul "
            f"(healthy v5e ~{_HEALTHY_TFLOPS:.0f}; degradation x"
            f"{degradation:.1f} — absolute timings are session-relative, the "
            f"headline vs_baseline ratio is same-session)")
    else:
        log("calibration failed; assuming a healthy session")

    # The matmul probe is a HEALTH DATUM, not the planner: shared-pool
    # degradation is size-dependent (measured r5: the 8192^3 matmul ran
    # 7000x degraded while the full-field decision program — many small
    # kernels — ran within ~1.5x of its healthy-session time in the SAME
    # window). Planning therefore trusts a measurement of the workload
    # itself: a floor-iteration decision_full PROBE runs first, and every
    # later decision comes from its measured per-iter time.
    if degradation > 3.0:
        # Per-launch RTT is negligible against degraded compute; exact
        # pull-drains beat guessed sleep drains for budget and correctness.
        os.environ["MACARONS_BENCH_SYNC"] = "1"
    reduced = os.environ.get("MACARONS_BENCH_SCALE") == "reduced"
    os.environ["MACARONS_BENCH_ITER_SCALE"] = "0.1"  # probe floor: 2 iters
    log(f"probe plan: sync={bool(os.environ.get('MACARONS_BENCH_SYNC'))} "
        f"budget_left={_remaining():.0f}s")

    def emit_headline(dec_full, dec_seq):
        full_ms = dec_full["decision_full_ms"]
        vs = (round(dec_seq["decision_seq_ms"] / full_ms, 2)
              if dec_seq is not None else None)
        out = {
            "metric": "nbv_decision_phases_per_sec",
            "value": round(1000.0 / full_ms, 4),
            "unit": "phases/s",
            "vs_baseline": vs,
            "calib_tflops": round(tflops, 4),
        }
        if reduced:
            out["scale"] = "reduced"
        print(json.dumps(out), flush=True)
        return out

    # The headline pair runs FIRST and adjacently: pool throughput declines
    # with cumulative use, so the fused/sequential ratio must come from
    # neighboring time windows. A second full-field run brackets the
    # sequential stage; the mean of the brackets is the ratio denominator.
    # HEADLINE: the production-default FULL-FIELD decision phase (every
    # eligible cell predicted, train_macarons.py full_occupancy_field)
    # vs the reference's launch structure running the same full-field
    # program — a measured same-chip structural ratio. A provisional line
    # is printed the MOMENT each bracket stage lands (the driver keeps the
    # last JSON line), so even a kill mid-sequential leaves a parsed value.
    headline = None
    dec_full = _run_stage_subprocess("decision_full", tflops)
    if dec_full is None and not reduced:
        # Even the 2-iter probe died inside the budget window: the one
        # fallback that can still land a ratio is the ~8x-smaller program
        # with the same launch structure.
        reduced = True
        os.environ["MACARONS_BENCH_SCALE"] = "reduced"
        log("production-scale probe failed; retrying at REDUCED scale")
        dec_full = _run_stage_subprocess("decision_full", tflops)
    if dec_full is not None:
        headline = emit_headline(dec_full, None)  # provisional, vs null

    # Plan the rest from the MEASURED per-iter time. The sequential stage
    # costs ~n_cand x t_full per iter plus one warmup run and a compile
    # (~120 s on this runtime); the second bracket is cheap by comparison.
    t_full = (dec_full["decision_full_ms"] / 1e3 if dec_full else
              _T_FULL_HEALTHY_S * degradation)
    seq_cost = (1 + 1) * 30 * t_full + 150.0
    if dec_full is not None and seq_cost > 0.7 * _remaining() and not reduced:
        reduced = True
        os.environ["MACARONS_BENCH_SCALE"] = "reduced"
        log(f"measured t_full={t_full:.1f}s makes the sequential stage "
            f"(~{seq_cost:.0f}s) blow the budget; re-probing the bracket at "
            f"REDUCED scale")
        dec_full = _run_stage_subprocess("decision_full", tflops)
        if dec_full is not None:
            headline = emit_headline(dec_full, None)
            t_full = dec_full["decision_full_ms"] / 1e3
    # More full-field iters for the second bracket when the session affords
    # them (cap at the healthy-session default of 20).
    n_full2 = max(2, min(20, int(0.15 * _remaining() / max(t_full, 1e-3))))
    dec_seq = _run_stage_subprocess("decision_seq", tflops)
    if dec_full is not None and dec_seq is not None:
        headline = emit_headline(dec_full, dec_seq)  # measured ratio lands
    os.environ["MACARONS_BENCH_ITER_SCALE"] = f"{n_full2 / 20:.4f}"
    dec_full2 = _run_stage_subprocess("decision_full", tflops)
    if dec_full is not None and dec_full2 is not None:
        drift = dec_full2["decision_full_ms"] / dec_full["decision_full_ms"]
        log(f"full-field bracket drift: x{drift:.2f} "
            f"({dec_full['decision_full_ms']:.0f} -> "
            f"{dec_full2['decision_full_ms']:.0f} ms)")
        dec_full = {"decision_full_ms": 0.5 * (
            dec_full["decision_full_ms"] + dec_full2["decision_full_ms"])}
        headline = emit_headline(dec_full, dec_seq)  # bracket-refined

    # Optional tail: micro diagnostics + the end-to-end pose loop. Each stage
    # checks the remaining budget; RESERVE seconds stay untouched so the
    # final headline re-print always happens.
    RESERVE = 10.0
    tail = ["decision", "scorer", "depth", "pose"]
    if t_full > 20.0 * _T_FULL_HEALTHY_S:
        tail = ["pose"]  # micros are meaningless and slow when this sick
    results = {}
    for name in tail:
        # pose needs the most room; leave it out if under 4 healthy-iters
        if _remaining() - RESERVE < 60:
            log(f"stage {name}: SKIPPED (budget)")
            continue
        results[name] = _run_stage_subprocess(name, tflops)
    dec = results.get("decision")
    if dec is not None and dec_full is not None:
        log(f"decision capped top-{32 if not reduced else 16}: "
            f"{dec['decision_ms']:.2f} ms")
    budget = {}
    # The per-phase budget triples the bench wall-clock (each phase compiles
    # the full pose program); it is opt-in — the measured split lives in
    # ROADMAP ("Pose-loop device-time budget").
    if os.environ.get("MACARONS_BENCH_BUDGET"):
        for ph in ("phase_dmc", "phase_depth", "phase_scone"):
            r = _run_stage_subprocess(ph, tflops)
            if r:
                budget.update(r)
    pose = results.get("pose")
    if budget and pose is not None:
        tracked = sum(budget.values())
        log("pose device-time budget: "
            + ", ".join(f"{k} {v:.0f} ms" for k, v in budget.items())
            + f"; sum {tracked:.0f} ms vs end-to-end "
            f"{pose['pose_ms']:.0f} ms")

    if pose is not None:
        # No reference measurement of this loop is runnable here (the A100
        # torch reference is not in this environment): vs_baseline is null.
        print(json.dumps({
            "metric": "online_nbv_poses_per_sec",
            "value": round(pose["poses_per_sec"], 3),
            "unit": "poses/s",
            "vs_baseline": None,
            "calib_tflops": round(tflops, 4),
        }), flush=True)
    if headline is not None:
        # Re-print so the LAST JSON line (what the driver records) is the
        # headline even when the optional tail ran.
        print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
