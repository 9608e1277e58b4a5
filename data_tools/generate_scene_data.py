"""CLI: generate per-scene settings.json + occupied_pose.npz
(reference data/scenes/generate_scene_data.py:15-285).

Usage: python data_tools/generate_scene_data.py --data_path data/scenes [--scene NAME]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from macarons_tpu.utils.platform import configure_platform

configure_platform()

import numpy as np

from macarons_tpu.data.mesh_io import load_obj
from macarons_tpu.data.scenes import compute_occupied_poses, compute_scene_settings
from macarons_tpu.scene.camera import PoseSpace

root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", default=os.path.join(root, "data/scenes"))
    parser.add_argument("--scene", default=None)
    parser.add_argument("--cell_size", type=float, default=1.0)
    parser.add_argument("--pose_step", type=float, default=1.0)
    parser.add_argument("--recompute", action="store_true")
    args = parser.parse_args()

    names = ([args.scene] if args.scene else
             sorted(d for d in os.listdir(args.data_path)
                    if os.path.isdir(os.path.join(args.data_path, d))))
    for name in names:
        d = os.path.join(args.data_path, name)
        objs = [f for f in os.listdir(d) if f.endswith(".obj")]
        if not objs:
            continue
        settings_path = os.path.join(d, "settings.json")
        if not os.path.exists(settings_path) or args.recompute:
            mesh = load_obj(os.path.join(d, objs[0]))
            settings = compute_scene_settings(
                mesh.verts, cell_size=args.cell_size, pose_step=args.pose_step)
            with open(settings_path, "w") as f:
                json.dump(settings, f, indent=2)
            print(f"{name}: wrote settings.json")
        occupied_path = os.path.join(d, "occupied_pose.npz")
        if not os.path.exists(occupied_path) or args.recompute:
            mesh = load_obj(os.path.join(d, objs[0]))
            with open(settings_path) as f:
                s = json.load(f)["camera"]
            ps = PoseSpace(np.asarray(s["x_min"]), np.asarray(s["x_max"]),
                           s["pose_l"], s["pose_w"], s["pose_h"],
                           s["pose_n_elev"], s["pose_n_azim"])
            occ = compute_occupied_poses(mesh, ps)
            np.savez(occupied_path, **occ)
            print(f"{name}: wrote occupied_pose.npz "
                  f"({occ['occupied'].sum()} occupied)")


if __name__ == "__main__":
    main()
