"""Bisect the ManyDepth forward into isolated stages on the live chip.

The 256x456x96 forward measures ~131 ms on v5e-1 (BENCH_r03) while its
roofline is ~2 ms (HBM) / ~0.2 ms (FLOPs) — the cost is in fusion/layout, not
arithmetic. Each stage runs in its own subprocess (one d2h pull flips the
tunneled runtime into sync dispatch; see bench.py's timing discipline) and the
sweep brackets with a matmul calibration probe so session health is visible.

Usage:
  python data_tools/bench_depth_diag.py                 # all stages
  python data_tools/bench_depth_diag.py fe_target costvol
parts: calib | fe_target | fe_alpha | costvol | contraction | decoder | full
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

H, W = 256, 456
FH, FW = H // 4, W // 4  # 64, 114
N_ITER = 20
DRAIN = 30.0


def _measure(step, n_iter, label):
    import jax.numpy as jnp
    import numpy as np

    out = step(0)
    del out
    time.sleep(DRAIN)
    t0 = time.perf_counter()
    for i in range(n_iter):
        out = step(i)
    s = jnp.sum(out if not isinstance(out, tuple) else out[0])
    t_enq = time.perf_counter() - t0
    np.asarray(s)
    total = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(s)
    rtt = time.perf_counter() - t0
    dt = max(total - rtt, 1e-9) / n_iter
    print(json.dumps({"part": label, "ms": dt * 1e3,
                      "enq_ms": t_enq * 1e3 / n_iter, "rtt_ms": rtt * 1e3}),
          flush=True)


def child(part):
    from macarons_tpu.utils.platform import configure_platform

    configure_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if part == "calib":
        n = 8192
        a = jax.device_put(np.random.default_rng(0).standard_normal(
            (n, n)).astype(np.float32))
        f = jax.jit(lambda x, i: x @ (x + i))
        _measure(lambda i: f(a, float(i)), N_ITER, "calib 8192^3 f32 matmul")
        return

    from macarons_tpu.models.many_depth import (
        CostVolumeBuilder, DepthDecoder, ManyDepth,
    )
    from macarons_tpu.models.resnet import FeatureExtractor, ResNetLayer

    kk = jax.random.split(jax.random.PRNGKey(1), 8)
    x = jax.random.uniform(kk[0], (1, H, W, 3))
    xa = jax.random.uniform(kk[1], (1, 2, H, W, 3))
    R = jnp.eye(3)[None]
    T = jnp.zeros((1, 3))
    gt_pose = jnp.zeros((1, 2, 6))

    if part == "full":
        dm = ManyDepth()
        dvars = jax.jit(dm.init)(kk[2], x, xa, R, T, gt_pose=gt_pose)

        @jax.jit
        def f(v, x, key):
            return dm.apply(v, x + 0.0 * jax.random.uniform(key, (1,)), xa,
                            R, T, gt_pose=gt_pose)[1]

        _measure(lambda i: f(dvars, x, jax.random.PRNGKey(i)), N_ITER,
                 "full ManyDepth forward")
        return

    if part in ("fe_target", "fe_alpha"):
        fe = FeatureExtractor()
        fvars = jax.jit(fe.init)(kk[2], x)
        inp = x if part == "fe_target" else xa.reshape(2, H, W, 3)

        @jax.jit
        def f(v, inp, key):
            return fe.apply(v, inp + 0.0 * jax.random.uniform(key, (1,)))

        _measure(lambda i: f(fvars, inp, jax.random.PRNGKey(i)), N_ITER,
                 f"{part} ({inp.shape[0]}x{H}x{W} -> layer1)")
        return

    feat = jax.random.uniform(kk[3], (1, FH, FW, 64))
    feat_a = jax.random.uniform(kk[4], (1, 2, FH, FW, 64))
    Ra = jnp.broadcast_to(jnp.eye(3)[None, None], (1, 2, 3, 3))
    Ta = jnp.zeros((1, 2, 3)) + jnp.array([0.1, 0.0, 0.0])

    if part == "costvol":
        cv = CostVolumeBuilder(height=H, width=W)
        cvars = jax.jit(cv.init)(kk[5], feat, R, T, feat_a, Ra, Ta)

        @jax.jit
        def f(v, feat, key):
            return cv.apply(v, feat + 0.0 * jax.random.uniform(key, (1,)),
                            R, T, feat_a, Ra, Ta)

        _measure(lambda i: f(cvars, feat, jax.random.PRNGKey(i)), N_ITER,
                 "cost volume (geometry + 96-plane warp + reduce)")
        return

    if part == "contraction":
        reduced = jax.random.uniform(kk[5], (1, FH, FW, 64))

        import flax.linen as nn

        class C(nn.Module):
            @nn.compact
            def __call__(self, y):
                y = ResNetLayer(128, strides=2, name="l2")(y, False)
                y = ResNetLayer(256, strides=2, name="l3")(y, False)
                y = ResNetLayer(512, strides=2, name="l4")(y, False)
                return y

        m = C()
        mv = jax.jit(m.init)(kk[6], reduced)

        @jax.jit
        def f(v, y, key):
            return m.apply(v, y + 0.0 * jax.random.uniform(key, (1,)))

        _measure(lambda i: f(mv, reduced, jax.random.PRNGKey(i)), N_ITER,
                 "contraction layers 2-4")
        return

    if part in ("dec_tail", "dec_tail32"):
        # The decoder TAIL: expansion2 (32ch @ H/2) + disp2 + expansion1
        # (16ch @ full 256x456) + disp1. Hypothesis: tiny channel counts at
        # full resolution dominate the forward (lane padding / layout).
        # dec_tail32 stops after disp2 to split the two scales.
        import flax.linen as nn

        from macarons_tpu.models.many_depth import (
            DisparityLayer, ExpansionLayer,
        )

        iconv3 = jax.random.uniform(kk[5], (1, FH, FW, 64))
        conv1 = jax.random.uniform(kk[6], (1, H // 2, W // 2, 64))
        tail32 = part == "dec_tail32"

        class Tail(nn.Module):
            @nn.compact
            def __call__(self, y, conv1, x):
                y = ExpansionLayer(32, 32, (H // 2, W // 2),
                                   name="expansion2")(y, conv1)
                d2 = DisparityLayer(name="disp2")(y)
                if tail32:
                    return d2
                y = ExpansionLayer(16, 16, (H, W), name="expansion1")(y, x)
                return DisparityLayer(name="disp1")(y), d2

        m = Tail()
        mv = jax.jit(m.init)(kk[7], iconv3, conv1, x)

        @jax.jit
        def f(v, y, key):
            return m.apply(v, y + 0.0 * jax.random.uniform(key, (1,)),
                           conv1, x)

        _measure(lambda i: f(mv, iconv3, jax.random.PRNGKey(i)), N_ITER,
                 "decoder tail (32ch@H/2 + 16ch@full)" if not tail32
                 else "decoder tail32 (32ch@H/2 only)")
        return

    if part == "decoder":
        dd = DepthDecoder(input_height=H, input_width=W)
        dvars = jax.jit(dd.init)(kk[6], x, R, T, xa, Ra, Ta)

        @jax.jit
        def f(v, x, key):
            return dd.apply(v, x + 0.0 * jax.random.uniform(key, (1,)),
                            R, T, xa, Ra, Ta)[0]

        _measure(lambda i: f(dvars, x, jax.random.PRNGKey(i)), N_ITER,
                 "DepthDecoder (everything except pose)")
        return

    raise SystemExit(f"unknown part {part}")


def main():
    if _IS_CHILD:
        child(sys.argv[sys.argv.index("--one") + 1])
        return
    parts = sys.argv[1:] or [
        "calib", "fe_target", "fe_alpha", "costvol", "contraction",
        "decoder", "full", "calib",
    ]
    for part in parts:
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
