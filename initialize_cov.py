"""CLI: pretrain SCONE's coverage-gain module (reference initialize_cov.py).

Usage: python initialize_cov.py -c configs/scone/coverage_gain/coverage_gain_pretraining_config.json
"""

import argparse
import os

from macarons_tpu.utils.platform import configure_platform

configure_platform()

from macarons_tpu.config import load_params
from macarons_tpu.trainers.pretrain_vis import run_training

dir_path = os.path.abspath(os.path.dirname(__file__))


def main():
    parser = argparse.ArgumentParser(
        description="Pretrain the SconeVis coverage-gain module."
    )
    parser.add_argument(
        "-c", "--config",
        default=os.path.join(
            dir_path,
            "configs/scone/coverage_gain/coverage_gain_pretraining_config.json",
        ),
        help="Path to the JSON config.",
    )
    args = parser.parse_args()
    params = load_params(args.config)
    occ_name = params.get("scone_occ_model_name", "best_unval_pretrained_scone_occ")
    occ_path = os.path.join(dir_path, "weights/scone/occupancy",
                            occ_name.replace(".pth", ""))
    run_training(
        params,
        weights_dir=os.path.join(dir_path, "weights/scone/coverage_gain"),
        occ_weights_path=occ_path,
    )


if __name__ == "__main__":
    main()
