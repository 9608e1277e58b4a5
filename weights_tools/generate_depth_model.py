"""Build and save an initial depth model, optionally grafting torch ResNet18
ImageNet weights (reference weights/generate_depth_model.py:17-41).

Usage:
  python weights_tools/generate_depth_model.py [-r resnet18_state_dict.pth]
                                               [-o weights/macarons/initial_depth]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from macarons_tpu.utils.platform import configure_platform

configure_platform()

import jax
import jax.numpy as jnp

from macarons_tpu.models.many_depth import ManyDepth
from macarons_tpu.models.resnet import convert_torch_resnet18
from macarons_tpu.utils.checkpoint import save_checkpoint


def graft_resnet(variables, converted):
    """Insert converted torchvision weights into the depth variable tree:
    feature extractor stem+layer1 and the contraction layers 2-4."""
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])

    def set_tree(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                set_tree(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = v

    dd_p = params["depth_decoder"]
    dd_s = stats["depth_decoder"]
    fe_p = dd_p["feature_extractor"]
    fe_s = dd_s["feature_extractor"]
    set_tree(fe_p["stem"], converted["stem"][0])
    set_tree(fe_s["stem"], converted["stem"][1])
    set_tree(fe_p["layer1"], converted["layer1"][0])
    set_tree(fe_s["layer1"], converted["layer1"][1])
    # Contraction layers 2-4: shapes match only for same channel plan; the cost
    # volume changes layer2's input channels, so only graft when shapes agree.
    for name, src in (("resnet_layer_2", "layer2"), ("resnet_layer_3", "layer3"),
                      ("resnet_layer_4", "layer4")):
        try:
            set_tree(dd_p[name], converted[src][0])
            set_tree(dd_s[name], converted[src][1])
        except AssertionError:
            print(f"skipping {name}: channel mismatch with torchvision {src}")
    return {"params": params, "batch_stats": stats}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--resnet", default=None,
                        help="Path to a torch resnet18 state dict (.pth).")
    parser.add_argument("-o", "--output",
                        default=os.path.join(os.path.dirname(__file__), "..",
                                             "weights", "macarons",
                                             "initial_depth"))
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=456)
    args = parser.parse_args()

    model = ManyDepth(input_height=args.height, input_width=args.width)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.height, args.width, 3)),
        jnp.zeros((1, 2, args.height, args.width, 3)),
        jnp.eye(3)[None], jnp.zeros((1, 3)), gt_pose=jnp.zeros((1, 2, 6)),
    )
    if args.resnet:
        import torch

        sd = torch.load(args.resnet, map_location="cpu")
        variables = graft_resnet(variables, convert_torch_resnet18(sd))
        print("grafted torchvision resnet18 weights")
    save_checkpoint(args.output, variables, {"source": args.resnet or "random"})
    print("saved depth model to", args.output)


if __name__ == "__main__":
    main()
