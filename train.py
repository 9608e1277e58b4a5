"""CLI: MACARONS online self-supervised training (reference train.py).

Usage: python train.py -c configs/macarons/macarons_default_training_config.json

``--restart-per-epoch`` runs every epoch in a fresh child process. The epoch
boundary is the run's one intentional device->host region (memory flush +
metric pull), and on the tunneled TPU runtime ANY d2h permanently degrades the
process to synchronous dispatch (ROADMAP "CRITICAL runtime facts"); restarting
per epoch makes every epoch train on async dispatch. Per-epoch RNG derivation
in run_training makes the restarted run draw the same streams as a
single-process run, so the losses are exactly equivalent.
"""

import argparse
import json
import os
import subprocess
import sys

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
    parser.add_argument(
        "--restart-per-epoch", action="store_true",
        help="Run each epoch in a fresh process (same losses; keeps every "
        "epoch on async dispatch through the tunneled TPU runtime).")
    parser.add_argument("--weights-dir", default=None,
                        help="Checkpoint directory (default weights/macarons).")
    parser.add_argument("--memory-root", default=None,
                        help="Memory root (default: the dataset path).")
    parser.add_argument("--epoch-child", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--fresh", action="store_true",
                        help=argparse.SUPPRESS)
    args = parser.parse_args()
    params = load_params(args.config)
    weights_dir = args.weights_dir or os.path.join(dir_path,
                                                   "weights/macarons")
    name = params.get("macarons_model_name", "macarons")
    resume = os.path.join(weights_dir, f"unvalidated_{name}")

    if args.epoch_child:
        params.update({"max_epochs_per_process": 1})
        if not args.fresh and os.path.exists(resume + ".msgpack"):
            params.update({"start_from_scratch": False})
        run_training(params, weights_dir=weights_dir,
                     memory_root=args.memory_root)
        return

    if args.restart_per_epoch and params.get("epochs", 1) > 1:
        # Parent: never touches a device (the chip is single-tenant); each
        # child trains ONE epoch, flushes, checkpoints, and exits.
        total = int(params.get("epochs", 1))
        fresh = params.get("start_from_scratch", True)
        while True:
            done = 0
            if not fresh and os.path.exists(resume + ".json"):
                with open(resume + ".json") as f:
                    done = int(json.load(f).get("epoch", 0))
            if done >= total:
                break
            cmd = [sys.executable, os.path.abspath(__file__),
                   "-c", args.config, "--epoch-child"]
            if args.weights_dir:
                cmd += ["--weights-dir", args.weights_dir]
            if args.memory_root:
                cmd += ["--memory-root", args.memory_root]
            if fresh:
                cmd.append("--fresh")
            ret = subprocess.run(cmd).returncode
            if ret != 0:
                raise SystemExit(ret)
            fresh = False
        return

    run_training(params, weights_dir=weights_dir,
                 memory_root=args.memory_root)


if __name__ == "__main__":
    main()
