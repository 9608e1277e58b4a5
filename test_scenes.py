"""CLI: scene exploration evaluation (reference test_scenes.py).

Usage: python test_scenes.py -c configs/test/test_in_default_scenes_config.json
"""

import argparse
import os

from macarons_tpu.utils.platform import configure_platform

configure_platform()

from macarons_tpu.config import load_params, normalize_test_config
from macarons_tpu.testers.scene import run_test

dir_path = os.path.abspath(os.path.dirname(__file__))


def main():
    parser = argparse.ArgumentParser(description="Evaluate scene exploration.")
    parser.add_argument(
        "-c", "--config",
        default=os.path.join(
            dir_path, "configs/test/test_in_default_scenes_config.json"),
        help="Path to the JSON test config (tpu-native or reference schema).",
    )
    args = parser.parse_args()
    params = normalize_test_config(load_params(args.config), dir_path)
    if params.get("training_config") is not None:
        train_params = load_params(os.path.join(dir_path, params.training_config))
        train_params.update(params.to_dict())
        params = train_params
    run_test(
        params,
        weights_path=params.get("weights_path"),
        results_dir=os.path.join(dir_path, "results/scene_exploration"),
        results_name=params.get("results_name", "test_results.json"),
        n_start_poses=params.get("n_start_poses", 5),
        load_json=bool(params.get("load_json", False)),
    )


if __name__ == "__main__":
    main()
