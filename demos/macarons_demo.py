"""MACARONS exploration demo — interactive NBV walkthrough with visual output.

Rebuilds the reference Gradio demo (demos/macarons_demo.py:139-595) as a
headless CLI (gradio is not in this image; matplotlib renders the dashboards):
loads a scene + model, iterates NBV steps, and writes per-step figures —
captured RGB, predicted depth, the growing surface point cloud, the camera
trajectory and the coverage curve — into an output directory.

Usage:
  python demos/macarons_demo.py --scene_dir <scene> [--config cfg.json]
      [--weights ckpt] [--n_steps 10] [--out demo_out]
"""

import argparse
import json
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

from macarons_tpu.config import Params, load_params
from macarons_tpu.data.scenes import SceneDataset
from macarons_tpu.models.macarons import (
    create_macarons_model, init_macarons_variables, load_macarons,
)
from macarons_tpu.scene import grid as G
from macarons_tpu.scene.memory import Memory
from macarons_tpu.testers.scene import compute_trajectory
from macarons_tpu.trainers.train_macarons import MacaronsRuntime, setup_scene
from macarons_tpu.utils.checkpoint import checkpoint_exists

DEFAULTS = dict(
    image_height=128, image_width=168, znear=0.5, zfar=30.0, n_depth=16,
    n_alpha=2, n_alpha_for_supervision=2, alphas=[-2, -1],
    n_interpolation_steps=2, n_proxy_points=20000, seq_len=512,
    n_gt_surface_points=8192, surface_cell_resolution=0.05,
    view_state_n_elev=7, view_state_n_azim=14, harmonic_degree=8,
    k_for_knn=16, n_cell_per_occ_forward_pass=8, occ_cell_batch=2,
    min_occ_for_proxy_points=0.1, use_occ_to_sample_proxy_points=True,
    use_sigmoid=True, sensor_range=40.0, gathering_factor=0.1,
    data_augmentation=False, random_seed=42, torch_seed=5,
    scene_scale_factor=1.0, test_resolution=0.05,
)


def plot_step(out_dir, step, scene, coverages):
    pts, valid = G.all_points(scene.surface_scene)
    p = np.asarray(pts)[np.asarray(valid)]
    fig = plt.figure(figsize=(12, 4))
    ax = fig.add_subplot(131, projection="3d")
    if len(p):
        ax.scatter(p[:, 0], p[:, 2], p[:, 1], s=0.5, c=p[:, 1], cmap="viridis")
    ax.set_title(f"surface map ({len(p)} pts)")
    ax2 = fig.add_subplot(132, projection="3d")
    X = np.concatenate(scene.camera.X_cam_history, 0)
    ax2.plot(X[:, 0], X[:, 2], X[:, 1], "o-", ms=3)
    ax2.set_title("camera trajectory")
    ax3 = fig.add_subplot(133)
    ax3.plot(coverages, "o-")
    ax3.set_xlabel("pose")
    ax3.set_ylabel("true coverage")
    ax3.set_ylim(0, 1)
    ax3.set_title("coverage evolution")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"step_{step:03d}.png"), dpi=110)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene_dir", required=True,
                        help="Directory containing the scene folders.")
    parser.add_argument("--scene", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--n_steps", type=int, default=10)
    parser.add_argument("--out", default="demo_out")
    args = parser.parse_args()

    params = Params(DEFAULTS)
    if args.config:
        params.update(load_params(args.config).to_dict())
    params["data_path"] = args.scene_dir

    dataset = SceneDataset(args.scene_dir)
    name = args.scene or dataset.scene_names[0]
    item = dataset[dataset.scene_names.index(name)]

    key = jax.random.PRNGKey(params.get("torch_seed", 5))
    rs = np.random.default_rng(params.get("random_seed", 42))
    model = create_macarons_model(params)
    key, k = jax.random.split(key)
    variables = init_macarons_variables(params, model, k)
    if args.weights and checkpoint_exists(args.weights):
        variables, _ = load_macarons(args.weights, variables)
        print("loaded weights from", args.weights)

    os.makedirs(args.out, exist_ok=True)
    key, k_scene = jax.random.split(key)
    scene = setup_scene(params, item, k_scene)
    rt = MacaronsRuntime(params, model, scene.cfg, scene.cell_table)
    memory = Memory([os.path.join(args.out, "memory")])

    traj, key = compute_trajectory(
        rt, scene, memory, os.path.join(args.out, "memory"), variables, key,
        rs, n_poses=args.n_steps,
        surface_epsilon=2 * params.get("test_resolution", 0.05)
        * params.get("scene_scale_factor", 1.0),
        verbose=True,
    )
    for step in range(len(traj["coverage"])):
        plot_step(args.out, step, scene, traj["coverage"][: step + 1])
    with open(os.path.join(args.out, "trajectory.json"), "w") as f:
        json.dump(traj, f)
    print(f"demo complete: final coverage {traj['coverage'][-1]:.4f}; "
          f"figures in {args.out}/")


if __name__ == "__main__":
    main()
