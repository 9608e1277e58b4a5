"""CLI: evaluate SCONE NBV trajectories on ShapeNet (reference test_shapenet.py).

Usage: python test_shapenet.py -c configs/test/test_on_shapenet_seen_categories_config.json
"""

import argparse
import os

from macarons_tpu.utils.platform import configure_platform

configure_platform()

from macarons_tpu.config import load_params
from macarons_tpu.testers.shapenet import run_test

dir_path = os.path.abspath(os.path.dirname(__file__))


def main():
    parser = argparse.ArgumentParser(description="SCONE NBV evaluation on ShapeNet.")
    parser.add_argument(
        "-c", "--config",
        default=os.path.join(
            dir_path, "configs/test/test_on_shapenet_seen_categories_config.json"
        ),
        help="Path to the JSON test config.",
    )
    args = parser.parse_args()
    params = load_params(args.config)
    # Test configs may point at a training config to inherit hyperparameters
    if "training_config" in params:
        train_params = load_params(os.path.join(dir_path, params.training_config))
        train_params.update(params.to_dict())
        params = train_params
    run_test(
        params,
        occ_weights_path=params.get("occ_weights_path"),
        vis_weights_path=params.get("vis_weights_path"),
        test_novel=params.get("test_novel", False),
        results_dir=os.path.join(dir_path, "results/shapenet_reconstruction"),
    )


if __name__ == "__main__":
    main()
