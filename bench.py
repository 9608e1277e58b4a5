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

import jax
import jax.numpy as jnp
import numpy as np


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

    decision(jax.random.PRNGKey(10)).block_until_ready()
    n_iter = 20
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = decision(jax.random.PRNGKey(20 + i))
    out.block_until_ready()
    fused_dt = (time.perf_counter() - t0) / n_iter

    decision_seq(jax.random.PRNGKey(11)).block_until_ready()
    n_seq = 3
    t0 = time.perf_counter()
    for i in range(n_seq):
        out = decision_seq(jax.random.PRNGKey(40 + i))
    out.block_until_ready()
    seq_dt = (time.perf_counter() - t0) / n_seq
    return fused_dt, seq_dt


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


def main():
    log("backend:", jax.default_backend())
    # Headline FIRST: nothing before it may trigger a device->host transfer
    fused_dt, seq_dt = bench_decision_phase()
    log(f"decision phase fused: {fused_dt * 1e3:.2f} ms "
        f"(occ field + 30-candidate scoring) -> {1.0 / fused_dt:.1f} phases/s")
    log(f"decision phase sequential-candidates: {seq_dt * 1e3:.2f} ms "
        f"-> {1.0 / seq_dt:.1f} phases/s")

    try:
        bench_scorer_micro()
        bench_depth_fps()
    except Exception as e:
        log("diagnostics failed:", repr(e))

    print(json.dumps({
        "metric": "nbv_decision_phases_per_sec",
        "value": round(1.0 / fused_dt, 2),
        "unit": "phases/s",
        "vs_baseline": round(seq_dt / fused_dt, 2),
    }))


if __name__ == "__main__":
    main()
