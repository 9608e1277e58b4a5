"""CLI: MACARONS online self-supervised training (reference train.py).

Usage: python train.py -c configs/macarons/macarons_default_training_config.json
"""

import argparse
import os

from macarons_tpu.utils.platform import configure_platform

configure_platform()

from macarons_tpu.config import load_params
from macarons_tpu.trainers.train_macarons import run_training

dir_path = os.path.abspath(os.path.dirname(__file__))


def main():
    parser = argparse.ArgumentParser(description="Train MACARONS online.")
    parser.add_argument(
        "-c", "--config",
        default=os.path.join(
            dir_path, "configs/macarons/macarons_default_training_config.json"),
        help="Path to the JSON config.",
    )
    args = parser.parse_args()
    params = load_params(args.config)
    run_training(params, weights_dir=os.path.join(dir_path, "weights/macarons"))


if __name__ == "__main__":
    main()
