"""Quantify shared-sample vs per-candidate NBV scoring (VERDICT r3 item 5).

The per-candidate scorer reproduces the reference scene loop exactly
(macarons_utils.py:1580-1738): a fresh occupancy-weighted MC sample and a
full SconeVis forward per candidate (30x per decision). The shared-sample
mode draws ONE sample from the union of candidate FoVs and runs ONE SconeVis
forward (the factoring the reference itself uses in SconeVis.py:210-252 and
the one-launch ShapeNet tester). This harness measures the semantic delta:
argmax agreement, top-3 overlap, and rank correlation over many random
decision states.

Usage:
  python data_tools/shared_sample_agreement.py [--trials N] [--seq-len L]
      [--n-pts N] [--n-cand C] [--platform cpu|tpu] [--bench]
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=100)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--n-pts", type=int, default=20000)
    ap.add_argument("--n-cand", type=int, default=30)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--bench", action="store_true",
                    help="also time both paths (use on the real chip)")
    ap.add_argument("--weights", default=None,
                    help="macarons checkpoint (save_macarons layout, path "
                    "without .msgpack); loads its SconeVis params so the "
                    "agreement is measured at TRAINED weights instead of "
                    "model.init noise (VERDICT r4 weak #4)")
    args = ap.parse_args()

    os.environ.setdefault("MACARONS_PLATFORM", args.platform)
    from macarons_tpu.utils.platform import configure_platform

    configure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from macarons_tpu.models.scone import SconeVis
    from macarons_tpu.ops.geometry import FoVCamera, look_at_view_transform
    from macarons_tpu.scene import runtime as R

    N, C, L = args.n_pts, args.n_cand, args.seq_len
    vis_model = SconeVis()
    key = jax.random.PRNGKey(0)
    vis_vars = vis_model.init(key, jnp.zeros((1, 128, 4)),
                              jnp.zeros((1, 128, 64)))
    weights_kind = "random_init"
    if args.weights:
        from flax import serialization

        with open(args.weights + ".msgpack", "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        vis_vars = serialization.from_state_dict(vis_vars, raw["vis"])
        weights_kind = args.weights

    per_fn = R.make_coverage_gain_fn(vis_model, seq_len=L)
    sh_fn = R.make_coverage_gain_fn(vis_model, seq_len=L, shared_sample=True)

    def make_state(seed):
        """Structured random decision state: gaussian point clusters with
        distance-decaying occupancy, partial validity."""
        rs = np.random.default_rng(seed)
        n_clusters = rs.integers(3, 8)
        centers = rs.uniform(-8, 8, (n_clusters, 3))
        assign = rs.integers(0, n_clusters, N)
        pts = (centers[assign]
               + rs.normal(0, 1.2, (N, 3))).astype(np.float32)
        d = np.linalg.norm(pts - centers[assign], axis=-1)
        occ = np.clip(np.exp(-d) + rs.uniform(0, 0.3, N), 0, 1)
        occ = occ.astype(np.float32)[:, None]
        vh = (rs.normal(0, 0.15, (N, 64))).astype(np.float32)
        valid = rs.uniform(0, 1, N) > 0.2
        elev = rs.uniform(-50, 50, C).astype(np.float32)
        azim = rs.uniform(0, 360, C).astype(np.float32)
        dist = rs.uniform(10, 18, C).astype(np.float32)
        Rc, Tc = look_at_view_transform(dist=jnp.asarray(dist),
                                        elev=jnp.asarray(elev),
                                        azim=jnp.asarray(azim))
        cams = FoVCamera.create(Rc, Tc, zfar=60.0)
        Rp, Tp = look_at_view_transform(dist=15.0, elev=jnp.array([25.0]),
                                        azim=jnp.array([60.0]))
        pcam = FoVCamera.create(Rp, Tp, zfar=60.0)
        return (jnp.asarray(pts), jnp.asarray(vh), jnp.asarray(occ),
                jnp.asarray(valid), cams, cams.camera_center(), pcam)

    agree = 0
    top3 = 0
    rank_corrs = []
    for t in range(args.trials):
        state = make_state(1000 + t)
        k = jax.random.PRNGKey(t)
        g_per = np.asarray(per_fn(vis_vars, *state, 24.0, 0.2, 60.0, k))
        g_sh = np.asarray(sh_fn(vis_vars, *state, 24.0, 0.2, 60.0, k))
        a_per, a_sh = int(np.argmax(g_per)), int(np.argmax(g_sh))
        agree += a_per == a_sh
        top3 += a_per in np.argsort(-g_sh)[:3]
        # Spearman rank correlation
        rp = np.argsort(np.argsort(g_per))
        rsh = np.argsort(np.argsort(g_sh))
        denom = np.std(rp) * np.std(rsh)
        rank_corrs.append(float(np.mean((rp - rp.mean()) * (rsh - rsh.mean()))
                                / denom) if denom > 0 else 1.0)
        if (t + 1) % 20 == 0:
            print(f"  {t + 1}/{args.trials}: argmax agreement "
                  f"{agree / (t + 1):.3f}", flush=True)

    out = {
        "trials": args.trials, "seq_len": L, "n_pts": N, "n_cand": C,
        "weights": weights_kind,
        "argmax_agreement": agree / args.trials,
        "top3_agreement": top3 / args.trials,
        "mean_rank_corr": float(np.mean(rank_corrs)),
    }

    if args.bench:
        state = make_state(7)

        def timed(fn, n=20):
            o = fn(vis_vars, *state, 24.0, 0.2, 60.0, jax.random.PRNGKey(0))
            del o
            time.sleep(4.0)
            t0 = time.perf_counter()
            for i in range(n):
                o = fn(vis_vars, *state, 24.0, 0.2, 60.0,
                       jax.random.PRNGKey(i))
            s = jnp.sum(o)
            np.asarray(s)
            total = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(s)
            rtt = time.perf_counter() - t0
            return max(total - rtt, 1e-9) / n * 1e3

        out["per_candidate_ms"] = timed(per_fn)
        out["shared_ms"] = timed(sh_fn)
        out["speedup"] = out["per_candidate_ms"] / out["shared_ms"]

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
