"""Bisect the NBV decision phase into per-piece device timings.

Round-4 finding: the SAME decision program measures 205 ms (r3 driver run)
or ~2.6 s (this session) depending on runtime session, while a raw f32
matmul runs at full speed both times — so some non-GEMM op class is slow on
this runtime. These stages isolate each candidate piece. One subprocess per
stage (the end-of-region d2h pull flips the process into sync dispatch).

Usage: python data_tools/bench_decide_diag.py [stage ...]
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_IS_CHILD = "--one" in sys.argv


def _measure(step, n_iter, drain_s=5.0):
    import jax.numpy as jnp
    import numpy as np

    out = step(0)
    del out
    time.sleep(drain_s)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(i)
    s = jnp.sum(out)
    t_enq = time.perf_counter() - t0
    np.asarray(s)
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(s)
    rtt = time.perf_counter() - t0
    dt = max(total - rtt, 1e-9) / n_iter
    return dt, t_enq / n_iter, rtt


def child(stage):
    from macarons_tpu.utils.platform import configure_platform

    configure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from macarons_tpu.models.scone import SconeOcc, SconeVis
    from macarons_tpu.ops.geometry import FoVCamera, look_at_view_transform
    from macarons_tpu.scene import grid as G, proxy as P, runtime as R

    N, n_cand = 100_000, 30
    cfg = G.make_grid_config((-10.0,) * 3, (10.0,) * 3, 6, 6, 4,
                             resolution=0.5, feature_dim=1)
    rs = np.random.default_rng(0)
    pts_np = rs.uniform(-10, 10, (N, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    def build_field_fn(cell_batch):
        table = R.build_cell_index_table(cfg, pts_np)
        return R.make_occupancy_field_fn(SconeOcc(), cfg, table, max_cells=32,
                                         cell_batch=cell_batch)

    def build_state():
        prox = P.initialize_proxy_points(key, (-10.0,) * 3, (10.0,) * 3, N)
        prox = prox._replace(
            points=jnp.asarray(pts_np),
            supervision_occ=(jax.random.uniform(key, (N, 1)) > 0.3
                             ).astype(jnp.float32),
            out_of_field=(jax.random.uniform(jax.random.PRNGKey(2), (N, 1))
                          > 0.7).astype(jnp.float32))
        surface = G.fill_cells_progressive(
            cfg, G.empty_grid(cfg), jax.random.PRNGKey(3),
            jax.random.uniform(jax.random.PRNGKey(4), (20000, 3), minval=-9,
                               maxval=9))
        return prox, surface

    Rm, Tm = look_at_view_transform(dist=15.0, elev=jnp.array([30.0]),
                                    azim=jnp.array([40.0]))
    cam = FoVCamera.create(Rm, Tm, zfar=50.0)
    Rc, Tc = look_at_view_transform(
        dist=14.0, elev=jnp.linspace(-40, 40, n_cand),
        azim=jnp.linspace(0, 348, n_cand))
    cand_cams = FoVCamera.create(Rc, Tc, zfar=50.0)
    X_cand = cand_cams.camera_center()
    box_diag = float(np.linalg.norm(np.asarray(cfg.x_max)
                                    - np.asarray(cfg.x_min)))

    n_iter = 20
    if ":" in stage:
        stage, n_s = stage.rsplit(":", 1)
        n_iter = int(n_s)

    if stage in ("field_cb2", "field_cb32"):
        field_fn = build_field_fn(2 if stage == "field_cb2" else 32)
        prox, surface = build_state()
        occ_vars = SconeOcc().init(jax.random.PRNGKey(5),
                                   jnp.zeros((1, 128, 3)),
                                   jnp.zeros((1, 8, 3)),
                                   jnp.zeros((1, 8, 64)))

        def step(i):
            p, m, h = field_fn(occ_vars, prox, surface, cam,
                               jax.random.PRNGKey(100 + i))
            return p

    elif stage in ("scorer30", "scorer_shared"):
        prox, surface = build_state()
        vm = SconeVis()
        vis_vars = vm.init(jax.random.PRNGKey(6), jnp.zeros((1, 128, 4)),
                           jnp.zeros((1, 128, 64)))
        score = R.make_coverage_gain_fn(
            vm, seq_len=2048, shared_sample=(stage == "scorer_shared"))
        # A plausible field: supervision occ + zero harmonics
        field = (prox.points, jnp.zeros((N, 64)), prox.supervision_occ,
                 prox.out_of_field[:, 0] < 1.0)

        def step(i):
            return score(vis_vars, *field, cand_cams, X_cand, cam, box_diag,
                         cfg.resolution, 60.0, jax.random.PRNGKey(i))

    elif stage == "sconeocc_raw":
        # The decision program's model work alone: 16 sequential batch-2
        # forwards at the production cell shapes (cb=2 equivalent)
        om = SconeOcc()
        L_pc, K_cell = 2754, 704
        pc = jax.random.normal(jax.random.PRNGKey(1), (2, L_pc, 3))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, K_cell, 3))
        vh = jax.random.normal(jax.random.PRNGKey(3), (2, K_cell, 64)) * 0.1
        mask = jnp.ones((2, L_pc), bool)
        occ_vars = om.init(jax.random.PRNGKey(5), jnp.zeros((1, 128, 3)),
                           jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 64)))

        @jax.jit
        def fwd16(v, pc, x, vh, mask, key):
            pc = pc + 0.0 * jax.random.uniform(key, (1,))

            def body(c, _):
                return c + jnp.sum(om.apply(v, pc, x, vh, pc_mask=mask)), None

            out, _ = jax.lax.scan(body, 0.0, None, length=16)
            return out

        def step(i):
            return fwd16(occ_vars, pc, x, vh, mask, jax.random.PRNGKey(i))

    elif stage == "sconeocc_b32":
        # One batch-32 forward at the same shapes
        om = SconeOcc()
        L_pc, K_cell = 2754, 704
        pc = jax.random.normal(jax.random.PRNGKey(1), (32, L_pc, 3))
        x = jax.random.normal(jax.random.PRNGKey(2), (32, K_cell, 3))
        vh = jax.random.normal(jax.random.PRNGKey(3), (32, K_cell, 64)) * 0.1
        mask = jnp.ones((32, L_pc), bool)
        occ_vars = om.init(jax.random.PRNGKey(5), jnp.zeros((1, 128, 3)),
                           jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 64)))

        @jax.jit
        def fwd(v, pc, x, vh, mask, key):
            pc = pc + 0.0 * jax.random.uniform(key, (1,))
            return jnp.sum(om.apply(v, pc, x, vh, pc_mask=mask))

        def step(i):
            return fwd(occ_vars, pc, x, vh, mask, jax.random.PRNGKey(i))

    elif stage == "svis_fwd":
        vm = SconeVis()
        pts = jax.random.normal(jax.random.PRNGKey(1), (1, 2048, 4)) * 0.3
        vh = jax.random.normal(jax.random.PRNGKey(2), (1, 2048, 64)) * 0.1
        vis_vars = vm.init(jax.random.PRNGKey(6), pts, vh)

        @jax.jit
        def fwd(v, pts, vh, key):
            return jnp.sum(vm.apply(v, pts + 0.0 * jax.random.uniform(
                key, (1,)), vh))

        def step(i):
            return fwd(vis_vars, pts, vh, jax.random.PRNGKey(i))

    elif stage == "sh_integration":
        from macarons_tpu.models.scone import compute_visibilities

        pts = jax.random.normal(jax.random.PRNGKey(1), (1, 2048, 4)) * 0.3
        harm = jax.random.normal(jax.random.PRNGKey(2), (1, 2048, 64)) * 0.1
        Xc = jax.random.normal(jax.random.PRNGKey(3), (1, n_cand, 3)) * 1.5

        @jax.jit
        def f(pts, harm, Xc, key):
            return jnp.sum(compute_visibilities(
                pts + 0.0 * jax.random.uniform(key, (1,)), harm, Xc))

        def step(i):
            return f(pts, harm, Xc, jax.random.PRNGKey(i))

    elif stage == "sh_integration_acc":
        # Fused term-by-term accumulation (ops.harmonics.sh_weighted_sum):
        # no (C, L, 64) basis tensor, no batched-matvec dot_general
        from macarons_tpu.ops.harmonics import sh_weighted_sum

        pts = jax.random.normal(jax.random.PRNGKey(1), (1, 2048, 4)) * 0.3
        harm = jax.random.normal(jax.random.PRNGKey(2), (1, 2048, 64)) * 0.1
        Xc = jax.random.normal(jax.random.PRNGKey(3), (1, n_cand, 3)) * 1.5

        @jax.jit
        def f(pts, harm, Xc, key):
            rays = Xc[:, :, None, :] - (
                pts[..., :3] + 0.0 * jax.random.uniform(key, (1,))
            )[:, None, :, :]  # (B, C, L, 3)
            z = sh_weighted_sum(rays, harm[:, None])
            return jnp.sum(jax.nn.sigmoid(z))

        def step(i):
            return f(pts, harm, Xc, jax.random.PRNGKey(i))

    elif stage == "sh_integration_pallas":
        from macarons_tpu.ops.pallas.sh_visibility import (
            pallas_compute_visibilities,
        )

        pts = jax.random.normal(jax.random.PRNGKey(1), (2048, 4)) * 0.3
        harm = jax.random.normal(jax.random.PRNGKey(2), (2048, 64)) * 0.1
        Xc = jax.random.normal(jax.random.PRNGKey(3), (n_cand, 3)) * 1.5

        @jax.jit
        def f(pts, harm, Xc, key):
            return jnp.sum(pallas_compute_visibilities(
                pts + 0.0 * jax.random.uniform(key, (1,)), harm, Xc))

        def step(i):
            return f(pts, harm, Xc, jax.random.PRNGKey(i))

    elif stage == "sh_basis":
        # harmonics_from_directions alone (no einsum): isolates the
        # closed-form SH evaluation + arctan2 spherical coords
        from macarons_tpu.ops.harmonics import harmonics_from_directions

        rays = jax.random.normal(jax.random.PRNGKey(1), (1, n_cand, 2048, 3))

        @jax.jit
        def f(rays, key):
            return jnp.sum(harmonics_from_directions(
                rays + 0.0 * jax.random.uniform(key, (1,))))

        def step(i):
            return f(rays, jax.random.PRNGKey(i))

    elif stage == "fov_mask":
        from macarons_tpu.ops.projection import points_in_fov_mask

        prox, _ = build_state()

        @jax.jit
        def f(X, key):
            X = X + 0.0 * jax.random.uniform(key, (1,))
            m = points_in_fov_mask(
                jnp.broadcast_to(X[None], (n_cand, N, 3)), cand_cams,
                256, 456, fov_range=60.0)
            return jnp.sum(m)

        def step(i):
            return f(prox.points, jax.random.PRNGKey(i))

    elif stage == "mc_sample":
        from macarons_tpu.ops.view_state import sample_proxy_points

        prox, _ = build_state()
        vh = jnp.zeros((N, 64))

        @jax.jit
        def f(X, occ, vh, key):
            ks = jax.random.split(key, n_cand)

            def one(k):
                pts4, h, idx, m = sample_proxy_points(
                    k, X, occ, vh, 2048, 0.1, use_occ_to_sample=True)
                return jnp.sum(pts4) + jnp.sum(m)

            return jnp.sum(jax.vmap(one)(ks))

        def step(i):
            return f(prox.points, prox.supervision_occ, vh,
                     jax.random.PRNGKey(i))

    elif stage == "topk_subsample":
        # The SconeOcc valid-first subsample: top_k(2048) over 2754, batch 32
        @jax.jit
        def f(scores, key):
            scores = scores + 0.0 * jax.random.uniform(key, (1,))
            _, idx = jax.lax.top_k(scores, 2048)
            return jnp.sum(idx)

        scores = jax.random.normal(jax.random.PRNGKey(1), (32, 2754))

        def step(i):
            return f(scores, jax.random.PRNGKey(i))

    elif stage == "knn":
        from macarons_tpu.ops.knn import knn_points_masked

        pc = jax.random.normal(jax.random.PRNGKey(1), (2, 2754, 3))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 704, 3))
        mask = jnp.ones((2, 2754), bool)

        @jax.jit
        def f(x, pc, mask, key):
            pc = pc + 0.0 * jax.random.uniform(key, (1,))
            out = 0.0
            for _ in range(3):  # 3 scales x 16 chunks -> just 3 here
                p, _, _, _ = knn_points_masked(x, pc, 16, pc_mask=mask,
                                               approx=True)
                out = out + jnp.sum(p)
            return out

        def step(i):
            return f(x, pc, mask, jax.random.PRNGKey(i))

    else:
        raise SystemExit(f"unknown stage {stage}")

    # Optional iteration-count override ("stage:N") for linearity checks —
    # if ms/iter is n-independent the timing is real device time; if total
    # is n-independent something fixed (undrained warmup, compile) leaked in.
    dt, enq, rtt = _measure(step, n_iter)
    print(json.dumps({"stage": stage, "n": n_iter, "ms": dt * 1e3,
                      "enq_ms": enq * 1e3, "rtt_ms": rtt * 1e3}), flush=True)


ALL = ["field_cb2", "field_cb32", "scorer30", "scorer_shared",
       "sconeocc_raw", "sconeocc_b32", "svis_fwd", "sh_integration",
       "sh_integration_pallas", "sh_basis", "fov_mask", "mc_sample",
       "topk_subsample", "knn"]


def main():
    if _IS_CHILD:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    for stage in (sys.argv[1:] or ALL):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", stage],
            capture_output=True, text=True, timeout=3600)
        print((r.stdout.strip().splitlines() or ["<no output>"])[-1],
              flush=True)
        if r.returncode != 0:
            print(f"  FAILED rc={r.returncode}: {r.stderr[-1500:]}",
                  flush=True)


if __name__ == "__main__":
    main()
