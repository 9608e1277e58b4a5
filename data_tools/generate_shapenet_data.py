"""CLI: precompute ShapeNet GT artifacts per mesh
(reference data/ShapeNetCore.v1/generate_shapenet_data.py:26-255).

Walks the split JSONs under --data_path, loads each model.obj (diag-1
normalized like the dataset), and writes surface/partial-pc/occupancy artifacts
into `<model_dir>/tensors/`.

Usage: python data_tools/generate_shapenet_data.py -c <config.json>
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from macarons_tpu.utils.platform import configure_platform

configure_platform()

import jax
import jax.numpy as jnp
import numpy as np

from macarons_tpu.config import load_params
from macarons_tpu.data import shapenet as sng
from macarons_tpu.data.mesh_io import load_obj

root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("--data_path",
                        default=os.path.join(root, "data/ShapeNetCore.v1"))
    parser.add_argument("--recompute", action="store_true")
    parser.add_argument("--image_size", type=int, default=None)
    args = parser.parse_args()

    cfg = sng.ShapeNetGTConfig()
    data_path = args.data_path
    recompute = args.recompute
    if args.config:
        p = load_params(args.config)
        data_path = p.get("data_path", data_path)
        recompute = p.get("recompute", recompute)
        cfg = sng.ShapeNetGTConfig(
            **{k: p[k] for k in sng.ShapeNetGTConfig._fields if k in p}
        )
    if args.image_size:
        cfg = cfg._replace(image_size=args.image_size)

    splits = ["train_list.json", "val_list.json", "all_test_list.json",
              "all_test_novel_list.json"]
    models = []
    for s in splits:
        path = os.path.join(data_path, s)
        if os.path.exists(path):
            with open(path) as f:
                models += json.load(f)["models"]
    models = list(dict.fromkeys(models))
    print(f"{len(models)} meshes to process")

    key = jax.random.PRNGKey(42)
    t0 = time.time()
    for i, m in enumerate(models):
        obj_path = os.path.join(data_path, m)
        out_dir = os.path.join(os.path.dirname(obj_path), "tensors")
        done = all(
            os.path.exists(os.path.join(out_dir, f + ".npz"))
            for f in ("surface_points", "partial_point_clouds",
                      "occupancy_field"))
        if done and not recompute:
            continue
        mesh = load_obj(obj_path)
        verts = sng.adjust_mesh_diagonally(jnp.asarray(mesh.verts), 1.0)
        key, k = jax.random.split(key)
        gt = sng.generate_mesh_gt(k, verts, jnp.asarray(mesh.faces), cfg)
        sng.save_mesh_gt(gt, out_dir)
        if i % 20 == 0:
            print(f"{i + 1}/{len(models)} done "
                  f"({(time.time() - t0) / 60:.1f} min)")


if __name__ == "__main__":
    main()
