"""ResNet-18 in flax (NHWC, TPU-native layout) + torch weight conversion.

The depth module's backbone (reference ManyDepth.py:33-50 uses torchvision
resnet18). torchvision is not available in this image; weights can be converted
from any torch resnet18 state dict via `convert_torch_resnet18` (torch CPU is
available for deserialization).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    # Computation dtype for the convs (params stay f32; BatchNorm stays f32
    # for stable statistics). bfloat16 = MXU-native mixed precision.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetLayer(nn.Module):
    """A torchvision `layerN`: two BasicBlocks, first may downsample."""

    features: int
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicBlock(self.features, strides=self.strides, dtype=self.dtype,
                       name="block0")(x, train)
        x = BasicBlock(self.features, dtype=self.dtype, name="block1")(x, train)
        return x


class ResNet18Stem(nn.Module):
    """conv1 + bn1 + relu (pre-maxpool), torchvision layout."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        return nn.relu(x)


def maxpool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1), NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class FeatureExtractor(nn.Module):
    """conv1..layer1 of ResNet18 (reference ManyDepth.py:33-50): image -> 64ch @ 1/4."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_conv1: bool = False):
        conv1 = ResNet18Stem(dtype=self.dtype, name="stem")(x, train)
        y = maxpool_3x3_s2(conv1)
        y = ResNetLayer(64, dtype=self.dtype, name="layer1")(y, train)
        if return_conv1:
            return y, conv1
        return y


# ---------------------------------------------------------------------------
# Torch weight conversion
# ---------------------------------------------------------------------------


def _t2j_conv(w):
    import numpy as np

    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _bn(sd, prefix):
    import numpy as np

    return (
        {"scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
         "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"]))},
        {"mean": jnp.asarray(np.asarray(sd[prefix + ".running_mean"])),
         "var": jnp.asarray(np.asarray(sd[prefix + ".running_var"]))},
    )


def convert_torch_resnet18(state_dict: Dict[str, Any]):
    """Convert a torchvision resnet18 state dict (tensors or numpy) to the
    flax params/batch_stats trees for Stem + layer1..4 as used here.

    Returns {"stem": ..., "layer1": ..., ..., "layer4": ...} with each entry a
    (params, batch_stats) pair ready to graft into module variable trees.
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in state_dict.items()}

    def block(prefix, has_down):
        p = {
            "conv1": {"kernel": _t2j_conv(sd[prefix + ".conv1.weight"])},
            "conv2": {"kernel": _t2j_conv(sd[prefix + ".conv2.weight"])},
        }
        b = {}
        p["bn1"], b["bn1"] = _bn(sd, prefix + ".bn1")
        p["bn2"], b["bn2"] = _bn(sd, prefix + ".bn2")
        if has_down:
            p["downsample_conv"] = {
                "kernel": _t2j_conv(sd[prefix + ".downsample.0.weight"])
            }
            p["downsample_bn"], b["downsample_bn"] = _bn(
                sd, prefix + ".downsample.1")
        return p, b

    out = {}
    stem_p = {"conv1": {"kernel": _t2j_conv(sd["conv1.weight"])}}
    stem_b = {}
    stem_p["bn1"], stem_b["bn1"] = _bn(sd, "bn1")
    out["stem"] = (stem_p, stem_b)
    for i, layer in enumerate(["layer1", "layer2", "layer3", "layer4"]):
        p0, b0 = block(f"{layer}.0", has_down=(i > 0))
        p1, b1 = block(f"{layer}.1", has_down=False)
        out[layer] = ({"block0": p0, "block1": p1}, {"block0": b0, "block1": b1})
    return out
