"""CLI: evaluate SCONE NBV trajectories on ShapeNet (reference test_shapenet.py).

Usage: python test_shapenet.py -c configs/test/test_on_shapenet_seen_categories_config.json
"""

import argparse
import os

from macarons_tpu.utils.platform import configure_platform

configure_platform()

from macarons_tpu.config import load_params, normalize_test_config
from macarons_tpu.testers.shapenet import run_test

dir_path = os.path.abspath(os.path.dirname(__file__))


def main():
    parser = argparse.ArgumentParser(description="SCONE NBV evaluation on ShapeNet.")
    parser.add_argument(
        "-c", "--config",
        default=os.path.join(
            dir_path, "configs/test/test_on_shapenet_seen_categories_config.json"
        ),
        help="Path to the JSON test config (tpu-native or reference schema).",
    )
    args = parser.parse_args()
    params = normalize_test_config(load_params(args.config), dir_path)
    # Test configs may point at a training config to inherit hyperparameters
    if params.get("training_config") is not None:
        train_params = load_params(os.path.join(dir_path, params.training_config))
        train_params.update(params.to_dict())
        params = train_params
    run_test(
        params,
        occ_weights_path=params.get("occ_weights_path"),
        vis_weights_path=params.get("vis_weights_path"),
        test_novel=params.get("test_novel", False),
        results_dir=os.path.join(dir_path, "results/shapenet_reconstruction"),
        max_meshes=params.get("max_meshes"),
        results_name=params.get("results_name"),
    )


if __name__ == "__main__":
    main()
