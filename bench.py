"""Headline benchmark: NBV candidate evaluations per second on the local chip.

Measures the fused batched NBV scoring path (SconeVis forward + spherical-
harmonics ray integration + coverage gain for ALL candidates in one launch) at
the reference's production scale (seq_len=2048 points, 52 candidate cameras,
full-size SconeVis), and compares it against a sequential per-candidate
evaluation of the SAME model on the SAME hardware — i.e. the launch structure
of the reference's NBV loop (Anttwo/MACARONS train_macarons.py:299-315,
testers/shapenet.py:146-169), which scores candidates one launch at a time.

Prints ONE JSON line:
  {"metric": "nbv_candidate_evals_per_sec", "value": ..., "unit": "evals/s",
   "vs_baseline": <fused rate / sequential-launch rate>}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
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

    log(f"fused: {fused_dt * 1e3:.2f} ms/52 cands -> {fused_rate:.0f} evals/s")
    log(f"sequential: {seq_dt * 1e3:.2f} ms/52 cands -> {seq_rate:.0f} evals/s")

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

    print(json.dumps({
        "metric": "nbv_candidate_evals_per_sec",
        "value": round(fused_rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(fused_rate / seq_rate, 2),
    }))


if __name__ == "__main__":
    main()
