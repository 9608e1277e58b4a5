"""Per-block ManyDepth forward profile on the live chip (VERDICT r4 task 4).

Splits the production-shape forward (B=1, 256x456, A=2 alpha frames, 96
depth planes — reference ManyDepth.py:387-531) into its structural blocks and
times each in its own subprocess (end-of-region-pull protocol, see bench.py):

  stem_split    FeatureExtractor exactly as the production forward runs it
                (one call on the target frame + one call on the A alpha frames)
  stem_batched  the SAME work as ONE batch-(1+A) call (the candidate lever:
                identical math in eval mode — BN uses running stats — but a
                single conv launch sequence at 3x the batch)
  cost_volume   CostVolumeBuilder (plane-sweep warp + L1 + conv_reduce)
  layer234      ResNet layers 2-4 (the contraction half)
  expansions    the 5 expansion layers + 4 disparity heads (decoder half)
  full          the whole ManyDepth.apply (eval)
  full_bstem    the whole forward with the batched-stem variant
                (ManyDepth(batched_stem=True))

Each child prints ONE JSON line; the parent orchestrates and re-prints them.
Absolute ms is session-relative (shared pool, see ROADMAP) — the SPLIT and
same-session A/B ratios are the decision signal.

Usage:
  python data_tools/bench_depth_blocks.py                    # full sweep
  python data_tools/bench_depth_blocks.py calib stem_split stem_batched
  python data_tools/bench_depth_blocks.py --one block=full,n=10,drain=30
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

B, H, W, A, D = 1, 256, 456, 2, 96


def _measure_and_print(step, n_iter, drain_s, spec):
    import jax.numpy as jnp
    import numpy as np

    out = step(0)
    # Exact drain: pull the warmup output (flips the process to sync
    # dispatch — fine, each child is ONE measurement and the degraded pool
    # makes per-launch RTT negligible against device time).
    np.asarray(jnp.sum(out))
    del out
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


def child(spec):
    from macarons_tpu.utils.platform import configure_platform

    configure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    kv = dict(item.split("=") for item in spec.split(","))
    block = kv.get("block", "full")
    n_iter = int(kv.get("n", 10))
    drain_s = float(kv.get("drain", 30))
    dtype = kv.get("dtype") or None
    if dtype == "none":
        dtype = None

    if block == "calib":
        n = 8192
        a = jax.device_put(np.random.default_rng(0).standard_normal(
            (n, n), dtype=np.float32))
        f = jax.jit(lambda x, i: x @ (x + i))
        np.asarray(jnp.sum(f(a, 0.0)))
        t0 = time.perf_counter()
        for i in range(n_iter):
            out = f(a, float(i))
        s = jnp.sum(out)
        np.asarray(s)
        total = time.perf_counter() - t0
        dt = total / n_iter
        print(json.dumps({"spec": spec, "ms": dt * 1e3,
                          "tflops": 2 * n**3 / dt / 1e12}), flush=True)
        return

    from macarons_tpu.models import many_depth as MD
    from macarons_tpu.models.resnet import FeatureExtractor, ResNetLayer

    rs = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    fh, fw = H // 4, W // 4 + (W % 4 > 0)  # 64 x 114

    def dev(shape):
        return jax.device_put(rs.standard_normal(shape).astype(np.float32))

    if block in ("stem_split", "stem_batched"):
        fe = FeatureExtractor(dtype=dtype)
        x = dev((B, H, W, 3))
        xa = dev((B * A, H, W, 3))
        fv = fe.init(key, jnp.zeros((1, H, W, 3)))

        if block == "stem_split":
            fwd = jax.jit(lambda v, x, xa: (
                fe.apply(v, x, return_conv1=True)[0], fe.apply(v, xa)))

            def step(i):
                return fwd(fv, x + i * 1e-6, xa)[0]
        else:
            both = jnp.concatenate((x, xa), axis=0)

            fwd = jax.jit(lambda v, b: fe.apply(v, b, return_conv1=True))

            def step(i):
                return fwd(fv, both + i * 1e-6)[0]

    elif block == "cost_volume":
        cvb = MD.CostVolumeBuilder(height=H, width=W, dtype=dtype)
        feat = dev((B, fh, fw, 64))
        feat_a = dev((B, A, fh, fw, 64))
        Rm = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        Tm = jnp.zeros((B, 3))
        Ra = jnp.broadcast_to(jnp.eye(3), (B, A, 3, 3))
        Ta = jnp.ones((B, A, 3)) * 0.1
        cv = cvb.init(key, feat, Rm, Tm, feat_a, Ra, Ta)
        fwd = jax.jit(lambda v, f, fa: cvb.apply(v, f, Rm, Tm, fa, Ra, Ta))

        def step(i):
            return fwd(cv, feat + i * 1e-6, feat_a)

    elif block == "layer234":
        l2 = ResNetLayer(128, strides=2, dtype=dtype)
        l3 = ResNetLayer(256, strides=2, dtype=dtype)
        l4 = ResNetLayer(512, strides=2, dtype=dtype)
        x0 = dev((B, fh, fw, 64))
        v2 = l2.init(key, x0)
        y2 = l2.apply(v2, x0)
        v3 = l3.init(key, y2)
        y3 = l3.apply(v3, y2)
        v4 = l4.init(key, y3)
        fwd = jax.jit(lambda v2, v3, v4, x: l4.apply(
            v4, l3.apply(v3, l2.apply(v2, x))))

        def step(i):
            return fwd(v2, v3, v4, x0 + i * 1e-6)

    elif block == "expansions":
        def size(div):
            return (H // div, W // div + (W % div > 0))

        exps = [MD.ExpansionLayer(256, 256, size(16), dtype=dtype),
                MD.ExpansionLayer(128, 128, size(8), dtype=dtype),
                MD.ExpansionLayer(64, 64, size(4), dtype=dtype),
                MD.ExpansionLayer(32, 32, size(2), dtype=dtype),
                MD.ExpansionLayer(16, 16, (H, W), dtype=dtype)]
        disps = [MD.DisparityLayer() for _ in range(4)]
        l4 = dev((B, *size(32), 512))
        skips = [dev((B, *size(16), 256)), dev((B, *size(8), 128)),
                 dev((B, *size(4), 64)), dev((B, *size(2), 64)),
                 dev((B, H, W, 3))]
        evs, x_probe = [], l4
        for e, s in zip(exps, skips):
            v = e.init(key, x_probe, s)
            evs.append(v)
            x_probe = e.apply(v, x_probe, s)
        dvs = []
        x_probe = l4
        outs = []
        for e, v, s in zip(exps, evs, skips):
            x_probe = e.apply(v, x_probe, s)
            outs.append(x_probe)
        for dmod, o in zip(disps, outs[1:]):
            dvs.append(dmod.init(key, o))

        def run(evs, dvs, l4, skips):
            y = l4
            res = []
            for e, v, s in zip(exps, evs, skips):
                y = e.apply(v, y, s)
                res.append(y)
            d = [dmod.apply(v, o)
                 for dmod, v, o in zip(disps, dvs, res[1:])]
            return sum(jnp.sum(t) for t in d)

        fwd = jax.jit(run)

        def step(i):
            return fwd(evs, dvs, l4 + i * 1e-6, skips)

    elif block in ("full", "full_bstem"):
        kwargs = {}
        if block == "full_bstem":
            kwargs["batched_stem"] = True
        model = MD.ManyDepth(dtype=dtype, **kwargs)
        x = dev((B, H, W, 3))
        xa = dev((B, A, H, W, 3))
        Rm = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        Tm = jnp.zeros((B, 3))
        gt_pose = jnp.full((B, A, 6), 1e-3)
        mv = model.init(key, jnp.zeros((B, H, W, 3)),
                        jnp.zeros((B, A, H, W, 3)), Rm, Tm, gt_pose=gt_pose)
        fwd = jax.jit(lambda v, x, xa: model.apply(v, x, xa, Rm, Tm,
                                                   gt_pose=gt_pose))

        def step(i):
            return fwd(mv, x + i * 1e-6, xa)[1]

    else:
        raise SystemExit(f"unknown block {block}")

    _measure_and_print(step, n_iter, drain_s, spec)


def main():
    if _IS_CHILD:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    names = sys.argv[1:] or ["calib", "full", "stem_split", "stem_batched",
                             "cost_volume", "layer234", "expansions",
                             "full_bstem", "calib"]
    for name in names:
        spec = name if "=" in name else f"block={name}"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", spec],
            capture_output=True, text=True, timeout=3600)
        line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
        print(line, flush=True)
        if r.returncode != 0:
            print(f"  FAILED rc={r.returncode}: {r.stderr[-2000:]}",
                  flush=True)


if __name__ == "__main__":
    main()
