"""Assemble a full MACARONS checkpoint from module checkpoints
(reference weights/generate_macarons_model.py:96-160).

Usage:
  python weights_tools/generate_macarons_model.py \
      [-o weights/scone/occupancy/best_unval_pretrained_scone_occ] \
      [-c weights/scone/coverage_gain/best_unval_pretrained_scone_vis] \
      [-d weights/macarons/initial_depth] \
      [--out weights/macarons/initialized_macarons] \
      [--config configs/macarons/macarons_default_training_config.json]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from macarons_tpu.utils.platform import configure_platform

configure_platform()

import jax

from macarons_tpu.config import load_params
from macarons_tpu.models.macarons import (
    create_macarons_model,
    init_macarons_variables,
    load_pretrained_module_weights,
    save_macarons,
)
from macarons_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint

root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--occupancy", default=os.path.join(
        root, "weights/scone/occupancy/best_unval_pretrained_scone_occ"))
    parser.add_argument("-c", "--coverage_gain", default=os.path.join(
        root, "weights/scone/coverage_gain/best_unval_pretrained_scone_vis"))
    parser.add_argument("-d", "--depth", default=None,
                        help="Optional depth-model checkpoint to graft.")
    parser.add_argument("--out", default=os.path.join(
        root, "weights/macarons/initialized_macarons"))
    parser.add_argument("--config", default=os.path.join(
        root, "configs/macarons/macarons_default_training_config.json"))
    args = parser.parse_args()

    params = load_params(args.config)
    model = create_macarons_model(params)
    variables = init_macarons_variables(params, model, jax.random.PRNGKey(0))
    variables = load_pretrained_module_weights(
        variables, occ_ckpt=args.occupancy, vis_ckpt=args.coverage_gain)
    if args.depth and checkpoint_exists(args.depth):
        loaded, _ = load_checkpoint(args.depth, variables.depth)
        variables = variables._replace(depth=loaded)
        print("grafted depth checkpoint", args.depth)
    save_macarons(args.out, variables, {
        "occ_ckpt": args.occupancy, "vis_ckpt": args.coverage_gain,
        "depth_ckpt": args.depth,
    })
    print("saved assembled MACARONS model to", args.out)


if __name__ == "__main__":
    main()
