"""Root-cause the SconeVis scorer micro-bench: split model forward vs
coverage-gain SH integration, each in its own subprocess (see bench.py's
timing discipline — one d2h pull poisons a process into sync dispatch).

Usage: python data_tools/bench_scorer_diag.py [--one <part>]
parts: fused | model | gain | gain_auto
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


def child(part):
    from macarons_tpu.utils.platform import configure_platform

    configure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from macarons_tpu.models.scone import (
        SconeVis, compute_coverage_gain,
    )

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

    @jax.jit
    def model_only(v, pts, vh, key):
        return model.apply(v, pts + 0.0 * jax.random.uniform(key, (1,)), vh)

    harm0 = model_only(variables, pts, vh, jax.random.PRNGKey(9))

    @jax.jit
    def gain_only(pts, harm, X_cam, key):
        return compute_coverage_gain(
            pts + 0.0 * jax.random.uniform(key, (1,)), harm, X_cam)

    steps = {
        "fused": lambda i: fused(variables, pts, vh, X_cam,
                                 jax.random.PRNGKey(i)),
        "model": lambda i: model_only(variables, pts, vh,
                                      jax.random.PRNGKey(i)),
        "gain": lambda i: gain_only(pts, harm0, X_cam, jax.random.PRNGKey(i)),
    }
    step = steps[part]
    n_iter = 30
    out = step(0)
    del out
    time.sleep(5.0)
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
    print(json.dumps({"part": part, "ms": dt * 1e3,
                      "enq_ms_per_iter": t_enq * 1e3 / n_iter,
                      "rtt_ms": rtt * 1e3}), flush=True)


def main():
    if _IS_CHILD:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    for part in sys.argv[1:] or ["fused", "model", "gain"]:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", part],
            capture_output=True, text=True, timeout=1800)
        print((r.stdout.strip().splitlines() or ["<no output>"])[-1],
              flush=True)
        if r.returncode != 0:
            print(f"  FAILED rc={r.returncode}: {r.stderr[-2000:]}",
                  flush=True)


if __name__ == "__main__":
    main()
