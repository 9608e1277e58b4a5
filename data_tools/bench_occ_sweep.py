"""Sweep occupancy-program batching knobs on the live chip.

Each configuration must run in its own subprocess (the end-of-region d2h pull
permanently flips the tunneled runtime into synchronous dispatch — see
bench.py's timing discipline). Parent orchestrates, children measure.

Usage:
  python data_tools/bench_occ_sweep.py            # orchestrate full sweep
  python data_tools/bench_occ_sweep.py --one cell_batch=32,dtype=bfloat16,full=1
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


def child(spec):
    from macarons_tpu.utils.platform import configure_platform

    configure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    kv = dict(item.split("=") for item in spec.split(","))
    cell_batch = int(kv.get("cell_batch", 2))
    dtype = kv.get("dtype") or None
    if dtype == "none":
        dtype = None
    full = kv.get("full", "0") == "1"
    ffc = int(kv.get("ffc", 0)) or None  # full-field while_loop chunk size
    n_iter = int(kv.get("n", 20))
    # Drain sleep after the warmup enqueue: must exceed ONE iteration's device
    # time or the warmup execution leaks into the measured region (the honest
    # protocol never pulls before the region — a pull flips the process to
    # sync dispatch).
    drain_s = float(kv.get("drain", 30))

    if kv.get("calib") == "1":
        # Session-health probe: known-FLOPs f32 matmul, own child process.
        import jax
        import jax.numpy as jnp
        import numpy as np

        n = 8192
        # On-device generation: a 256 MB device_put wedges when the tunnel
        # is sick (r5 observation) — never transfer the calib matrix.
        a = jax.jit(lambda k: jax.random.normal(k, (n, n), jnp.float32))(
            jax.random.PRNGKey(0))
        f = jax.jit(lambda x, i: x @ (x + i))
        out = f(a, 0.0)
        del out
        time.sleep(drain_s)
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = f(a, float(i))
        s = jnp.sum(out)
        np.asarray(s)
        total = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(s)
        rtt = time.perf_counter() - t0
        dt = max(total - rtt, 1e-9) / n_iter
        print(json.dumps({"spec": spec, "ms": dt * 1e3,
                          "tflops": 2 * n**3 / dt / 1e12,
                          "rtt_ms": rtt * 1e3}), flush=True)
        return

    from macarons_tpu.models.scone import SconeOcc
    from macarons_tpu.ops.geometry import FoVCamera, look_at_view_transform
    from macarons_tpu.scene import grid as G, proxy as P, runtime as R

    N = 100_000
    cfg = G.make_grid_config((-10.0,) * 3, (10.0,) * 3, 6, 6, 4,
                             resolution=0.5, feature_dim=1)
    rs = np.random.default_rng(0)
    pts_np = rs.uniform(-10, 10, (N, 3)).astype(np.float32)
    table = R.build_cell_index_table(cfg, pts_np)
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
    Rm, Tm = look_at_view_transform(dist=15.0, elev=jnp.array([30.0]),
                                    azim=jnp.array([40.0]))
    cam = FoVCamera.create(Rm, Tm, zfar=50.0)
    field_fn = R.make_occupancy_field_fn(occ_model, cfg, table, max_cells=32,
                                         cell_batch=cell_batch,
                                         compute_dtype=dtype,
                                         full_field_chunk=ffc)

    def step(i):
        proba, mask, harm = field_fn(occ_vars, prox, surface, cam,
                                     jax.random.PRNGKey(100 + i),
                                     full_field=full)
        return proba

    out = step(0)
    if kv.get("sync") == "1":
        # Exact drain: pull the warmup output (flips the process into
        # synchronous dispatch — each timed iter then includes one launch
        # RTT, negligible against device time on the degraded sessions
        # where this mode is used; see bench.py MACARONS_BENCH_SYNC).
        np.asarray(jnp.sum(out))
        del out
    else:
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
    print(json.dumps({"spec": spec, "ms": dt * 1e3, "enq_ms": t_enq * 1e3,
                      "rtt_ms": rtt * 1e3}), flush=True)


def main():
    if _IS_CHILD:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    specs = sys.argv[1:] or [
        "cell_batch=2,dtype=none,full=0",
        "cell_batch=8,dtype=none,full=0",
        "cell_batch=32,dtype=none,full=0",
        "cell_batch=32,dtype=bfloat16,full=0",
        "cell_batch=32,dtype=none,full=1",
        "cell_batch=32,dtype=bfloat16,full=1",
        "cell_batch=2,dtype=none,full=1",
    ]
    for spec in specs:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", spec],
            capture_output=True, text=True, timeout=1800)
        line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
        print(line, flush=True)
        if r.returncode != 0:
            print(f"  FAILED rc={r.returncode}: {r.stderr[-2000:]}",
                  flush=True)


if __name__ == "__main__":
    main()
