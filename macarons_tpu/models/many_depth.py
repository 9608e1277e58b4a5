"""ManyDepth — multi-frame self-supervised monocular depth (flax, NHWC).

TPU rebuild of reference macarons/networks/ManyDepth.py:33-842: ResNet18 stem
feature extractor, a 96-plane cost volume built by warping previous-frame
features into the reference view, ResNet18 layer2-4 contraction, 5 expansion
layers with skip connections, and 4-scale sigmoid disparity heads; optional
ResNet18 PoseDecoder (6-DoF axis-angle, unused by default: learn_pose=False,
reference :29).

TPU-first deltas (fresh weights — the reference ships no depth checkpoint):
- NHWC layout everywhere; images are (B, H, W, 3).
- The cost-volume warp grid is computed directly at feature resolution instead
  of computing full-resolution projections and bicubic-downsampling the
  coordinate field (reference :185-189) — same geometry, one less resample.
- The warp over (depth-planes x alpha-frames) is a single batched projection +
  gather instead of the reference's expand/reshape camera replication
  (:232-254); XLA fuses the plane loop.
- ConvTranspose(k=3, s=1, p=1) in expansion layers is realized as Conv (for
  stride 1 they span the same function class).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.geometry import (
    compose_pose,
    matrix_from_axis_angle,
    ndc_pixel_grid,
)
from ..ops.grid_sample import grid_sample
from .resnet import FeatureExtractor, ResNetLayer, maxpool_3x3_s2

# Model constants (reference ManyDepth.py:18-29)
INPUT_HEIGHT = 256
INPUT_WIDTH = 456
D_MIN = 0.5
D_MAX = 750.0
N_ALPHA = 2
N_DEPTH = 96
POSE_FACTOR = 100.0


def _reflect_conv(x, features, name, dtype=None):
    """3x3 conv with reflect padding (torch padding_mode='reflect')."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return nn.Conv(features, (3, 3), padding="VALID", dtype=dtype,
                   name=name)(x)


class CostVolumeBuilder(nn.Module):
    """Plane-sweep cost volume (reference ManyDepth.py:80-305).

    Inputs are NHWC feature maps at 1/4 resolution; cameras follow the
    row-vector convention with fov=60deg, aspect=1 (PT3D defaults used by the
    reference's FoVPerspectiveCameras(R, T, zfar)).
    """

    height: int = INPUT_HEIGHT
    width: int = INPUT_WIDTH
    d_min: float = D_MIN
    d_max: float = D_MAX
    n_depth: int = N_DEPTH
    output_channels: int = 64
    fov: float = 60.0
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, R, T, feat_alpha, R_alpha, T_alpha,
                 return_cost_volume: bool = False):
        """feat (B, fh, fw, C); R (B, 3, 3); T (B, 3);
        feat_alpha (B, A, fh, fw, C); R_alpha (B, A, 3, 3); T_alpha (B, A, 3)."""
        B, fh, fw, C = feat.shape
        A = feat_alpha.shape[1]
        D = self.n_depth

        tan_half = float(np.tan(np.deg2rad(self.fov) / 2.0))
        # Geometry stays f32 even under bf16 compute (depth planes up to 750
        # have a bf16 ulp of ~4; warp coordinates must not quantize)
        ndc_x, ndc_y = ndc_pixel_grid(fh, fw, dtype=jnp.float32)
        px = ndc_x.reshape(-1)  # (P,)
        py = ndc_y.reshape(-1)
        depths = jnp.linspace(self.d_min, self.d_max, D, dtype=jnp.float32)

        # View-space points of each depth plane at each feature pixel: (D, P, 3)
        pv = jnp.stack(
            (
                px[None, :] * depths[:, None] * tan_half,
                py[None, :] * depths[:, None] * tan_half,
                jnp.broadcast_to(depths[:, None], (D, px.shape[0])),
            ),
            axis=-1,
        )
        # World points per batch: (B, D, P, 3) = (pv - T) @ R^T
        R32 = R.astype(jnp.float32)
        T32 = T.astype(jnp.float32)
        world = jnp.einsum("dpj,bij->bdpi", pv, R32) - jnp.einsum(
            "bj,bij->bi", T32, R32
        )[:, None, None, :]

        # Project into each alpha camera: view_a = world @ R_a + T_a
        view_a = jnp.einsum(
            "bdpj,baji->badpi", world, R_alpha.astype(jnp.float32)
        ) + T_alpha.astype(jnp.float32)[:, :, None, None, :]
        z = view_a[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        x_ndc = view_a[..., 0] / (safe_z * tan_half)
        y_ndc = view_a[..., 1] / (safe_z * tan_half)
        s = min(fh, fw)
        gx = -(s / fw) * x_ndc
        gy = -(s / fh) * y_ndc
        grid = jnp.stack((gx, gy), axis=-1)  # (B, A, D, P, 2)

        # Gather source features (zeros padding, reference :282)
        src = feat_alpha.reshape(B * A, fh, fw, C)
        g = grid.reshape(B * A, D * px.shape[0], 1, 2)
        warped = grid_sample(src, g, padding_mode="zeros")
        warped = warped.reshape(B, A, D, fh * fw, C)

        # Mean over alpha frames, then L1 feature distance (reference :288-297)
        warped = jnp.mean(warped, axis=1)  # (B, D, P, C)
        target = feat.reshape(B, 1, fh * fw, C)
        cost = jnp.mean(jnp.abs(warped - target), axis=-1)  # (B, D, P)
        cost_volume = jnp.moveaxis(cost.reshape(B, D, fh, fw), 1, -1)  # NHWC

        res = jnp.concatenate(
            (feat, cost_volume.astype(feat.dtype)), axis=-1)
        res = nn.relu(nn.Conv(self.output_channels, (3, 3), padding=1,
                              dtype=self.dtype, name="conv_reduce")(res))
        if return_cost_volume:
            return res, cost_volume
        return res


class ExpansionLayer(nn.Module):
    """Upconv + nearest resize + skip concat + reflect conv (reference :308-363)."""

    inner_channels: int
    output_channels: int
    output_size: Tuple[int, int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_add=None):
        y = nn.elu(nn.Conv(self.inner_channels, (3, 3), padding=1,
                           dtype=self.dtype, name="upconv")(x))
        y = jax.image.resize(
            y, (y.shape[0], *self.output_size, y.shape[-1]), method="nearest"
        )
        if x_add is not None:
            y = jnp.concatenate((y, x_add.astype(y.dtype)), axis=-1)
        return nn.elu(_reflect_conv(y, self.output_channels, "iconv",
                                    dtype=self.dtype))


class DisparityLayer(nn.Module):
    """Reflect conv -> sigmoid disparity in (0,1) (reference :366-384).

    Always f32: the disparity head feeds disp->depth conversion where bf16
    quantization would alias depth bins."""

    @nn.compact
    def __call__(self, x):
        return nn.sigmoid(_reflect_conv(x.astype(jnp.float32), 1, "conv"))


class DepthDecoder(nn.Module):
    """Full depth network (reference :387-531). Returns 4 disparity scales."""

    input_height: int = INPUT_HEIGHT
    input_width: int = INPUT_WIDTH
    d_min: float = D_MIN
    d_max: float = D_MAX
    n_depth: int = N_DEPTH
    use_input_image_in_skip_connection: bool = True
    # Run the target + alpha frames through the feature extractor as ONE
    # batch-(1+A) call instead of two separate calls. Eval-mode only (BN uses
    # running stats, so the math is identical); in train mode the split calls
    # are kept so BatchNorm batch statistics match the reference's
    # per-call structure. Same param tree either way.
    batched_stem: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, R, T, x_alpha, R_alpha, T_alpha, train: bool = False):
        """x (B, H, W, 3); x_alpha (B, A, H, W, 3). Returns disp1..disp4 (NHWC)."""
        B, H, W, _ = x.shape
        A = x_alpha.shape[1]

        fe = FeatureExtractor(dtype=self.dtype, name="feature_extractor")
        if self.batched_stem and not train:
            both = jnp.concatenate((x, x_alpha.reshape(B * A, H, W, 3)),
                                   axis=0)
            feats, convs1 = fe(both, train=train, return_conv1=True)
            layer1, conv1 = feats[:B], convs1[:B]
            layer1_alpha = feats[B:].reshape(
                B, A, H // 4, W // 4 + (W % 4 > 0), 64)
        else:
            layer1, conv1 = fe(x, train=train, return_conv1=True)
            layer1_alpha = fe(
                x_alpha.reshape(B * A, H, W, 3), train=train
            ).reshape(B, A, H // 4, W // 4 + (W % 4 > 0), 64)

        conv_reduce = CostVolumeBuilder(
            height=H, width=W, d_min=self.d_min, d_max=self.d_max,
            n_depth=self.n_depth, dtype=self.dtype,
            name="cost_volume_builder",
        )(layer1, R, T, layer1_alpha, R_alpha, T_alpha)

        layer2 = ResNetLayer(128, strides=2, dtype=self.dtype,
                             name="resnet_layer_2")(conv_reduce, train)
        layer3 = ResNetLayer(256, strides=2, dtype=self.dtype,
                             name="resnet_layer_3")(layer2, train)
        layer4 = ResNetLayer(512, strides=2, dtype=self.dtype,
                             name="resnet_layer_4")(layer3, train)

        def size(div):
            return (H // div, W // div + (W % div > 0))

        iconv5 = ExpansionLayer(256, 256, size(16), dtype=self.dtype,
                                name="expansion5")(layer4, layer3)
        iconv4 = ExpansionLayer(128, 128, size(8), dtype=self.dtype,
                                name="expansion4")(iconv5, layer2)
        disp4 = DisparityLayer(name="disp4")(iconv4)
        iconv3 = ExpansionLayer(64, 64, size(4), dtype=self.dtype,
                                name="expansion3")(iconv4, layer1)
        disp3 = DisparityLayer(name="disp3")(iconv3)
        iconv2 = ExpansionLayer(32, 32, size(2), dtype=self.dtype,
                                name="expansion2")(iconv3, conv1)
        disp2 = DisparityLayer(name="disp2")(iconv2)
        x_add = x if self.use_input_image_in_skip_connection else None
        iconv1 = ExpansionLayer(16, 16, (H, W), dtype=self.dtype,
                                name="expansion1")(iconv2, x_add)
        disp1 = DisparityLayer(name="disp1")(iconv1)
        return disp1, disp2, disp3, disp4


class PoseDecoder(nn.Module):
    """6-DoF relative pose from frame pairs (reference :554-677)."""

    input_height: int = INPUT_HEIGHT
    input_width: int = INPUT_WIDTH
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_alpha, train: bool = False):
        B, H, W, _ = x.shape
        A = x_alpha.shape[1]
        pair = jnp.concatenate(
            (jnp.broadcast_to(x[:, None], (B, A, H, W, 3)), x_alpha), axis=-1
        ).reshape(B * A, H, W, 6)

        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="biconv1")(pair)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = maxpool_3x3_s2(y)
        y = ResNetLayer(64, dtype=self.dtype, name="resnet_layer_1")(y, train)
        y = ResNetLayer(128, strides=2, dtype=self.dtype,
                        name="resnet_layer_2")(y, train)
        y = ResNetLayer(256, strides=2, dtype=self.dtype,
                        name="resnet_layer_3")(y, train)
        y = ResNetLayer(512, strides=2, dtype=self.dtype,
                        name="resnet_layer_4")(y, train)

        y = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="pconv0")(y))
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="pconv1")(y))
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="pconv2")(y))
        y = nn.Conv(6, (1, 1), name="pconv3")(y)
        y = y.reshape(B, A, -1).astype(jnp.float32)
        return nn.Dense(6, name="fc")(y)


class ManyDepth(nn.Module):
    """Composition wrapper (reference :698-758): pose -> alpha cameras -> decoder."""

    input_height: int = INPUT_HEIGHT
    input_width: int = INPUT_WIDTH
    d_min: float = D_MIN
    d_max: float = D_MAX
    n_depth: int = N_DEPTH
    pose_factor: float = POSE_FACTOR
    learn_pose: bool = False
    # One batch-(1+A) feature-extractor call in eval mode (see DepthDecoder).
    batched_stem: bool = False
    # bfloat16 runs every conv on the MXU at half the HBM traffic; geometry
    # (poses, warp grids, disparity heads) stays f32 (see CostVolumeBuilder /
    # DisparityLayer). None = full f32 (the parity/unit-test configuration).
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_alpha, R, T, gt_pose=None, train: bool = False):
        """x (B, H, W, 3); x_alpha (B, A, H, W, 3); R/T target world->view pose;
        gt_pose (B, A, 6) [T*, axis-angle] / pose_factor.
        Returns (pose, disp1, disp2, disp3, disp4)."""
        B, A = x.shape[0], x_alpha.shape[1]

        if self.learn_pose:
            pose = PoseDecoder(self.input_height, self.input_width,
                               dtype=self.dtype,
                               name="pose_decoder")(x, x_alpha, train=train)
        else:
            if gt_pose is None:
                raise ValueError("learn_pose=False requires gt_pose")
            pose = gt_pose

        relative_R = matrix_from_axis_angle(self.pose_factor * pose[..., 3:])
        relative_T = self.pose_factor * pose[..., :3]
        exp_R = jnp.broadcast_to(R[:, None], (B, A, 3, 3))
        exp_T = jnp.broadcast_to(T[:, None], (B, A, 3))
        R_alpha, T_alpha = compose_pose(exp_R, exp_T, relative_R, relative_T)

        disps = DepthDecoder(
            self.input_height, self.input_width, self.d_min, self.d_max,
            self.n_depth, batched_stem=self.batched_stem, dtype=self.dtype,
            name="depth_decoder",
        )(x, R, T, x_alpha, R_alpha, T_alpha, train=train)
        return (pose, *disps)


def ssim(x, y):
    """SSIM distance map (reference ManyDepth.py:809-842): reflect-pad 3x3
    average pools; returns clamp((1 - SSIM)/2, 0, 1). NHWC."""
    C1 = 0.01 ** 2
    C2 = 0.03 ** 2

    def pool(v):
        v = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.avg_pool(v, (3, 3), strides=(1, 1), padding="VALID")

    mu_x = pool(x)
    mu_y = pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)
