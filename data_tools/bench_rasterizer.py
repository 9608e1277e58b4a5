"""Rasterizer micro-benchmark: binning strategies + camera batching on TPU.

Decides ops.rasterizer.PALLAS_BINNING. Run on the real chip:
  python data_tools/bench_rasterizer.py [n_faces] [n_cams]

Timing discipline (ROADMAP 'CRITICAL runtime facts'): every device array is
passed as a jit ARGUMENT — closing a jitted function over a committed device
array flips the tunneled runtime into synchronous dispatch and inflates every
launch (this harness originally closed over the camera and measured
14.3 ms/frame where the clean number was 12.4).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from macarons_tpu.ops import geometry as geo  # noqa: E402
from macarons_tpu.ops import rasterizer as ras  # noqa: E402


def sphere_mesh(n_t=160, n_p=161, r=5.0):
    theta = np.linspace(0.12, np.pi - 0.12, n_t)
    phi = np.linspace(0, 2 * np.pi, n_p)[:-1]
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    verts = np.stack([r * np.sin(tt) * np.cos(pp), r * np.cos(tt),
                      r * np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    idx = np.arange(n_t * (n_p - 1)).reshape(n_t, n_p - 1)
    c0, c2 = idx[:-1, :], idx[1:, :]
    c1 = np.roll(idx, -1, axis=1)[:-1, :]
    c3 = np.roll(idx, -1, axis=1)[1:, :]
    faces = np.concatenate([np.stack([c0, c1, c2], -1).reshape(-1, 3),
                            np.stack([c1, c3, c2], -1).reshape(-1, 3)])
    return verts.astype(np.float32), faces.astype(np.int32)


def main():
    n_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    n_cams = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    verts_np, faces_np = sphere_mesh(n_scale, n_scale + 1)
    print(f"backend={jax.default_backend()} faces={faces_np.shape[0]} "
          f"cams={n_cams}", file=sys.stderr)
    H, W = 256, 456

    R_np, T_np = jax.device_get(geo.look_at_view_transform(
        dist=12.0, elev=jnp.linspace(10, 40, n_cams),
        azim=jnp.linspace(0, 120, n_cams)))

    @partial(jax.jit, static_argnames=("method", "binning"))
    def raster(verts, faces, R, T, method="pallas", binning="pairlist"):
        cam = geo.FoVCamera.create(R, T, zfar=50.0)
        fr = ras.rasterize(verts, faces, cam, (H, W), method=method,
                           binning=binning)
        return fr.pix_to_face, fr.zbuf

    verts = jnp.asarray(verts_np)
    faces = jnp.asarray(faces_np)
    R = jnp.asarray(R_np)
    T = jnp.asarray(T_np)

    def run(tag, n=10, **kw):
        out = raster(verts, faces, R, T, **kw)
        out[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            out = raster(verts, faces, R, T, **kw)
        out[0].block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(f"{tag}: {dt * 1e3:.2f} ms total -> "
              f"{dt / n_cams * 1e3:.2f} ms/frame", file=sys.stderr)
        return out, dt

    o1, t_topk = run("pallas+topk", method="pallas", binning="topk")
    o2, t_pair = run("pallas+pairlist", method="pallas", binning="pairlist")
    same = np.mean(np.asarray(o1[0]) == np.asarray(o2[0]))
    print(f"pairlist vs topk pix match: {same:.6f}", file=sys.stderr)
    run("xla binned", n=3, method="binned")
    print(f"speedup pairlist/topk: {t_topk / t_pair:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
