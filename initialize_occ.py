"""CLI: pretrain SCONE's occupancy module (reference initialize_occ.py).

Usage: python initialize_occ.py -c configs/scone/occupancy/occupancy_pretraining_config.json
"""

import argparse
import os

from macarons_tpu.utils.platform import configure_platform

configure_platform()

from macarons_tpu.config import load_params
from macarons_tpu.trainers.pretrain_occ import run_training

dir_path = os.path.abspath(os.path.dirname(__file__))


def main():
    parser = argparse.ArgumentParser(
        description="Pretrain the SconeOcc occupancy-probability module."
    )
    parser.add_argument(
        "-c", "--config",
        default=os.path.join(
            dir_path, "configs/scone/occupancy/occupancy_pretraining_config.json"
        ),
        help="Path to the JSON config.",
    )
    args = parser.parse_args()
    params = load_params(args.config)
    run_training(params, weights_dir=os.path.join(dir_path, "weights/scone/occupancy"))


if __name__ == "__main__":
    main()
