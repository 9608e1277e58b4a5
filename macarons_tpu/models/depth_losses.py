"""Depth-module losses: photometric reconstruction, regularity, pose, L1.

Rebuilds reference macarons/utility/depth_model_utils.py:384-673 as pure jax
functions over NHWC images and row-vector-convention cameras.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import (
    FoVCamera,
    axis_angle_from_matrix,
    matrix_from_axis_angle,
    relative_pose,
)
from ..ops.grid_sample import grid_sample
from ..ops.projection import ndc_to_grid_coords, project_depth_back_to_3D
from .many_depth import ssim


def get_relative_pose_matrices(R, T, alpha_R, alpha_T):
    """Relative poses target->alpha (reference depth_model_utils.py:384-394).

    R (B,3,3), T (B,3); alpha_R (B,A,3,3), alpha_T (B,A,3)."""
    B, A = T.shape[0], alpha_T.shape[1]
    exp_R = jnp.broadcast_to(R[:, None], (B, A, 3, 3))
    exp_T = jnp.broadcast_to(T[:, None], (B, A, 3))
    return relative_pose(exp_R, exp_T, alpha_R, alpha_T)


def convert_matrix_to_pose(R, T, alpha_R, alpha_T, pose_factor: float):
    """(B, A, 6) [T*, axis-angle] / pose_factor (reference :858-870)."""
    rel_R, rel_T = get_relative_pose_matrices(R, T, alpha_R, alpha_T)
    angle = axis_angle_from_matrix(rel_R) / pose_factor
    return jnp.concatenate((rel_T / pose_factor, angle), axis=-1)


def pose_loss(pred_pose, truth_pose, pose_factor: float,
              rotation_mode: str = "angle"):
    """MSE pose loss, 'angle' or 'matrix' modes (reference :397-442)."""
    pred_R = pose_factor * pred_pose[..., 3:]
    pred_T = pose_factor * pred_pose[..., :3]
    true_R = pose_factor * truth_pose[..., 3:]
    true_T = pose_factor * truth_pose[..., :3]
    if rotation_mode == "matrix":
        pred_R = matrix_from_axis_angle(pred_R).reshape(*pred_R.shape[:-1], 9)
        true_R = matrix_from_axis_angle(true_R).reshape(*true_R.shape[:-1], 9)
    elif rotation_mode == "angle":
        pred_R = pred_R / np.pi
        true_R = true_R / np.pi
    else:
        raise ValueError(rotation_mode)
    return jnp.mean((pred_R - true_R) ** 2) + jnp.mean((pred_T - true_T) ** 2)


def depth_l1_loss(pred_depth, truth_depth, mask=None, zfar: float = 180.0):
    """Direct-depth L1 (reference :445-465). Depths NHWC (B, H, W, 1)."""
    B, H, W = pred_depth.shape[0], pred_depth.shape[1], pred_depth.shape[2]
    diff = pred_depth - truth_depth
    if mask is not None:
        diff = diff * mask
    loss = jnp.sum(jnp.abs(diff.reshape(B, -1)), axis=-1) / (H * W * zfar)
    return jnp.mean(loss)


def regularity_loss(disp, img):
    """Edge-aware disparity smoothness (reference :522-544). NHWC."""
    gdx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    gdy = jnp.abs(disp[:, :-1] - disp[:, 1:])
    gix = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), -1, keepdims=True)
    giy = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), -1, keepdims=True)
    gdx = gdx * jnp.exp(-gix)
    gdy = gdy * jnp.exp(-giy)
    return jnp.mean(gdx) + jnp.mean(gdy)


def regularity_tab(disp, img):
    """Per-pixel edge-aware smoothness table (reference :547-562). NHWC ->
    (B, H-2, W-2, 1)."""
    H, W = disp.shape[1], disp.shape[2]
    gdx = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    gdy = jnp.abs(disp[:, :-1] - disp[:, 1:])
    gix = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), -1, keepdims=True)
    giy = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), -1, keepdims=True)
    gdx = gdx * jnp.exp(-gix)
    gdy = gdy * jnp.exp(-giy)
    return gdx[:, : H - 2, : W - 2] + gdy[:, : H - 2, : W - 2]


def warp_images_to_target(target_depth, target_camera: FoVCamera,
                          alpha_images, alpha_cameras: FoVCamera,
                          padding_mode: str = "border"):
    """Warp each alpha image into the target view via the predicted depth.

    target_depth (B, H, W, 1); alpha_images (B, A, H, W, 3);
    alpha_cameras batched (B*A,). Returns (B, A, H, W, 3).
    """
    B, H, W, _ = target_depth.shape
    A = alpha_images.shape[1]
    world, _ = project_depth_back_to_3D(target_depth, target_camera)  # (B, HW, 3)
    world = jnp.broadcast_to(world[:, None], (B, A, H * W, 3)).reshape(B * A, H * W, 3)
    ndc = alpha_cameras.transform_points(world)
    grid_xy = ndc_to_grid_coords(ndc[..., :2], H, W).reshape(B * A, H, W, 2)
    warped = grid_sample(alpha_images.reshape(B * A, H, W, 3), grid_xy,
                         padding_mode=padding_mode)
    return warped.reshape(B, A, H, W, 3)


def reconstruction_loss(images, alpha_images, mask,
                        cameras: FoVCamera, alpha_cameras: FoVCamera,
                        predicted_depth, ssim_factor: float = 0.85,
                        use_mask: bool = True, zfar: float = 750.0,
                        padding_mode: str = "border"):
    """Photometric reprojection loss (reference :577-673).

    images (B, H, W, 3); alpha_images (B, A, H, W, 3); mask (B, H, W, 1) bool;
    cameras batched (B,); alpha_cameras batched (B*A,).
    L1+SSIM blend, per-pixel min over alpha frames, masked mean.
    """
    B, H, W, _ = images.shape
    A = alpha_images.shape[1]

    warp_depth = predicted_depth
    if use_mask:
        warp_depth = jnp.where(mask, predicted_depth, zfar)

    warped = warp_images_to_target(warp_depth, cameras, alpha_images,
                                   alpha_cameras, padding_mode=padding_mode)
    expanded = jnp.broadcast_to(images[:, None], (B, A, H, W, 3))

    l1 = jnp.mean(jnp.abs(expanded - warped), axis=-1, keepdims=True)
    if ssim_factor > 0:
        s = ssim(expanded.reshape(B * A, H, W, 3), warped.reshape(B * A, H, W, 3))
        s = jnp.mean(s, axis=-1, keepdims=True).reshape(B, A, H, W, 1)
        loss = ssim_factor * s + (1 - ssim_factor) * l1
    else:
        loss = l1

    loss = jnp.min(loss, axis=1)  # (B, H, W, 1), min over alpha frames

    if use_mask:
        m = mask.astype(loss.dtype)
        denom = jnp.sum(m, axis=(1, 2), keepdims=True) + 1e-7
        return jnp.sum(loss * m / denom)
    return jnp.mean(loss)
