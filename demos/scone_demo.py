"""SCONE object demo — depth-sensor NBV on a single mesh with visual output.

Rebuilds the reference Gradio SCONE demo (demos/scone_demo.py:226-400) as a
headless CLI: given a mesh with precomputed GT artifacts (or generating them on
the fly for a raw .obj), runs the greedy NBV trajectory with SconeOcc/SconeVis
and plots the accumulated partial cloud + coverage per view.

Usage:
  python demos/scone_demo.py --mesh model.obj [--occ ckpt --vis ckpt]
      [--n_views 6] [--out scone_demo_out]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from macarons_tpu.utils.platform import configure_platform

configure_platform()

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from macarons_tpu.config import Params
from macarons_tpu.data import shapenet as sng
from macarons_tpu.data.mesh_io import load_obj
from macarons_tpu.testers.shapenet import make_nbv_trajectory_fn
from macarons_tpu.trainers.pretrain_occ import build_model as build_occ
from macarons_tpu.trainers.pretrain_vis import build_vis_model
from macarons_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint

SMALL = dict(
    seq_len=512, n_proxy_points=4096, n_view_min=1, n_view_max=6, pc_size=512,
    view_state_n_elev=7, view_state_n_azim=14, harmonic_degree=8,
    camera_dist=1.5, pole_cameras=True, n_camera_elev=5, n_camera_azim=10,
    n_camera=52, gt_max_diagonal=1.0, min_occ_for_proxy_points=0.05,
    use_occ_to_sample_proxy_points=True, use_sigmoid=True, filter_tol=0.01,
    no_view_harmonics=False, occ_no_view_harmonics=False,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh", required=True)
    parser.add_argument("--occ", default=None)
    parser.add_argument("--vis", default=None)
    parser.add_argument("--n_views", type=int, default=6)
    parser.add_argument("--out", default="scone_demo_out")
    parser.add_argument("--gt_image_size", type=int, default=128)
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    params = Params(dict(SMALL, n_view_max=args.n_views))

    mesh = load_obj(args.mesh)
    verts = sng.adjust_mesh_diagonally(jnp.asarray(mesh.verts), 1.0)
    tensors = os.path.join(os.path.dirname(args.mesh), "tensors")
    if not os.path.exists(os.path.join(tensors, "partial_point_clouds.npz")):
        print("generating GT artifacts ...")
        cfg = sng.ShapeNetGTConfig(
            n_points_surface=2048, part_pc_length=1024,
            n_samples_for_occupancy=4000, n_max_samples=8000,
            image_size=args.gt_image_size,
        )
        gt = sng.generate_mesh_gt(jax.random.PRNGKey(0), verts,
                                  jnp.asarray(mesh.faces), cfg)
        sng.save_mesh_gt(gt, tensors)

    from macarons_tpu.data import datasets as D

    part_pc, part_mask, coverage = D.get_gt_partial_point_clouds(args.mesh)

    occ_model = build_occ(params)
    vis_model = build_vis_model(params)
    key = jax.random.PRNGKey(1)
    k1, k2, key = jax.random.split(key, 3)
    L = params.n_view_max * params.pc_size
    occ_vars = occ_model.init(k1, jnp.zeros((1, L, 3)), jnp.zeros((1, 8, 3)),
                              jnp.zeros((1, 8, 64)))
    vis_vars = vis_model.init(k2, jnp.zeros((1, params.seq_len, 4)),
                              jnp.zeros((1, params.seq_len, 64)))
    if args.occ and checkpoint_exists(args.occ):
        occ_vars, _ = load_checkpoint(args.occ, occ_vars)
    if args.vis and checkpoint_exists(args.vis):
        vis_vars, _ = load_checkpoint(args.vis, vis_vars)

    run = make_nbv_trajectory_fn(params, occ_model, vis_model)
    coverages, view_idx = run(occ_vars, vis_vars, jnp.asarray(part_pc),
                              jnp.asarray(part_mask), jnp.asarray(coverage),
                              0, key)
    coverages = np.asarray(coverages)
    view_idx = np.asarray(view_idx)
    print("view sequence:", view_idx.tolist())
    print("coverage evolution:", np.round(coverages, 4).tolist())

    fig = plt.figure(figsize=(10, 4))
    ax = fig.add_subplot(121, projection="3d")
    for n, v in enumerate(view_idx):
        pc = part_pc[v][part_mask[v]]
        ax.scatter(pc[:, 0], pc[:, 2], pc[:, 1], s=0.6, label=f"view {n}")
    ax.set_title("accumulated partial clouds")
    ax.legend(markerscale=8, fontsize=7)
    ax2 = fig.add_subplot(122)
    ax2.plot(coverages, "o-")
    ax2.set_xlabel("views")
    ax2.set_ylabel("GT surface coverage")
    ax2.set_ylim(0, 1)
    fig.tight_layout()
    out = os.path.join(args.out, "nbv_trajectory.png")
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
