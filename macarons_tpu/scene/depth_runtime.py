"""Depth-module runtime: batch assembly, augmentation, the depth mega-step.

TPU rebuild of reference macarons_utils.py:763-1187 (apply_depth_model and its
batch plumbing): all NHWC, one jit-able step with explicit keys; augmentation
(color jitter, horizontal symmetry with pose conjugation) is branchless inside
jit via lax.cond-style where-selects.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import depth_losses as dl
from ..models.many_depth import ManyDepth
from ..ops.geometry import FoVCamera
from ..ops.projection import depth_to_disparity, disparity_to_depth


class DepthBatchConfig(NamedTuple):
    """Static knobs mirroring the reference params fields."""

    n_alpha: int = 2
    n_alpha_for_supervision: int = 2
    alphas: Tuple[int, ...] = (-2, -1)
    use_future_frame_for_supervision: bool = False
    znear: float = 0.5
    zfar: float = 750.0
    pose_factor: float = 100.0
    rotation_mode: str = "angle"
    ssim_factor: float = 0.85
    regularity_factor: float = 0.01
    regularity_loss: bool = True
    use_depth_mask: bool = True
    padding_mode: str = "border"
    data_augmentation: bool = True
    jitter_probability: float = 0.5
    symmetry_probability: float = 0.5
    brightness_jitter_range: float = 0.2
    contrast_jitter_range: float = 0.2
    saturation_jitter_range: float = 0.2
    hue_jitter_range: float = 0.05


class FrameRing(NamedTuple):
    """Device-resident ring of the most recent captured frames.

    The online pose loop's decision and supervision windows only ever need the
    last `n_interpolation_steps + n_alpha` frames; keeping them on device (the
    reference re-reads every frame from disk, macarons_utils.py:763-803)
    removes all disk reads and host round-trips from the hot loop. Frames are
    still written to the Memory asynchronously for replay."""

    images: jnp.ndarray  # (L, H, W, 3)
    zbuf: jnp.ndarray  # (L, H, W, 1)
    mask: jnp.ndarray  # (L, H, W, 1) bool
    R: jnp.ndarray  # (L, 3, 3)
    T: jnp.ndarray  # (L, 3)
    zfar: jnp.ndarray  # (L,)


def init_frame_ring(length: int, height: int, width: int,
                    zfar: float) -> FrameRing:
    return FrameRing(
        images=jnp.zeros((length, height, width, 3), jnp.float32),
        zbuf=jnp.full((length, height, width, 1), -1.0, jnp.float32),
        mask=jnp.zeros((length, height, width, 1), bool),
        R=jnp.broadcast_to(jnp.eye(3)[None], (length, 3, 3)),
        T=jnp.zeros((length, 3), jnp.float32),
        zfar=jnp.full((length,), zfar, jnp.float32),
    )


def ring_push(ring: FrameRing, images, zbuf, mask, R, T, zfar) -> FrameRing:
    """Append a capture batch, keeping the newest `L` frames. Pure — safe
    inside jit."""
    L = ring.images.shape[0]
    new = FrameRing(images, zbuf, mask, R, T,
                    jnp.broadcast_to(jnp.asarray(zfar, jnp.float32),
                                     (images.shape[0],)))
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0)[-L:], ring, new)


def ring_frames(ring: FrameRing, n: int) -> Dict:
    """The newest n frames as a create_batch_for_depth_model frames dict."""
    return {
        "images": ring.images[-n:], "zbuf": ring.zbuf[-n:],
        "mask": ring.mask[-n:], "R": ring.R[-n:], "T": ring.T[-n:],
        "zfar": ring.zfar[-n:],
    }


class FrameStore(NamedTuple):
    """Device-resident frame store for a whole trajectory (zero-sync
    training): every captured frame accumulates here instead of being written
    to disk per pose (ANY d2h — even async — permanently degrades the
    tunneled runtime to synchronous dispatch). The store IS the trajectory's
    frame memory: replay windows are device slices, and the store is flushed
    to the on-disk Memory once per epoch."""

    images: jnp.ndarray  # (F_max, H, W, 3)
    zbuf: jnp.ndarray  # (F_max, H, W, 1)
    mask: jnp.ndarray  # (F_max, H, W, 1) bool
    R: jnp.ndarray  # (F_max, 3, 3)
    T: jnp.ndarray  # (F_max, 3)
    n: jnp.ndarray  # () int32 frames written


def init_frame_store(max_frames: int, height: int, width: int) -> FrameStore:
    return FrameStore(
        images=jnp.zeros((max_frames, height, width, 3), jnp.float32),
        zbuf=jnp.full((max_frames, height, width, 1), -1.0, jnp.float32),
        mask=jnp.zeros((max_frames, height, width, 1), bool),
        R=jnp.broadcast_to(jnp.eye(3)[None], (max_frames, 3, 3)),
        T=jnp.zeros((max_frames, 3), jnp.float32),
        n=jnp.asarray(0, jnp.int32),
    )


def store_append(store: FrameStore, images, zbuf, mask, R, T) -> FrameStore:
    """Append a capture batch at the write head. Pure — safe inside jit."""
    at = store.n
    return FrameStore(
        images=jax.lax.dynamic_update_slice(store.images, images,
                                            (at, 0, 0, 0)),
        zbuf=jax.lax.dynamic_update_slice(store.zbuf, zbuf, (at, 0, 0, 0)),
        mask=jax.lax.dynamic_update_slice(store.mask, mask, (at, 0, 0, 0)),
        R=jax.lax.dynamic_update_slice(store.R, R, (at, 0, 0)),
        T=jax.lax.dynamic_update_slice(store.T, T, (at, 0)),
        n=at + images.shape[0],
    )


def store_window(store: FrameStore, last, n: int, zfar: float) -> Dict:
    """Frames [last-n+1 .. last] as a create_batch_for_depth_model frames
    dict (device twin of Memory.load_frame_sequence). `last` may be traced."""
    lo = jnp.asarray(last, jnp.int32) - (n - 1)
    return {
        "images": jax.lax.dynamic_slice_in_dim(store.images, lo, n, 0),
        "zbuf": jax.lax.dynamic_slice_in_dim(store.zbuf, lo, n, 0),
        "mask": jax.lax.dynamic_slice_in_dim(store.mask, lo, n, 0),
        "R": jax.lax.dynamic_slice_in_dim(store.R, lo, n, 0),
        "T": jax.lax.dynamic_slice_in_dim(store.T, lo, n, 0),
        "zfar": jnp.full((n,), zfar, jnp.float32),
    }


def create_batch_for_depth_model(cfg: DepthBatchConfig, frames: Dict,
                                 mode: str = "inference"):
    """Slice a loaded frame sequence into (batch, alpha) dicts
    (reference :806-885). frames arrays are (n_total, H, W, C) etc."""
    start = cfg.n_alpha
    end = frames["images"].shape[0]
    if mode == "supervision":
        n_alpha_to_gather = cfg.n_alpha_for_supervision
        if cfg.use_future_frame_for_supervision:
            end -= 1
    else:
        n_alpha_to_gather = cfg.n_alpha

    def sl(a, lo, hi):
        return jnp.asarray(a[lo:hi])

    batch = {
        "images": sl(frames["images"], start, end),
        "mask": sl(frames["mask"], start, end).astype(bool),
        "R": sl(frames["R"], start, end),
        "T": sl(frames["T"], start, end),
        "zfar": sl(frames["zfar"], start, end),
    }
    if "zbuf" in frames:
        batch["zbuf"] = sl(frames["zbuf"], start, end)

    alphas = {k: [] for k in ("images", "mask", "R", "T", "zbuf")}
    for i in range(n_alpha_to_gather):
        a = cfg.alphas[i]
        for k in ("images", "mask", "R", "T") + (("zbuf",) if "zbuf" in frames else ()):
            alphas[k].append(jnp.asarray(frames[k][start + a : end + a]))
    alpha = {
        "images": jnp.stack(alphas["images"], axis=1),
        "mask": jnp.stack(alphas["mask"], axis=1).astype(bool),
        "R": jnp.stack(alphas["R"], axis=1),
        "T": jnp.stack(alphas["T"], axis=1),
        "zfar": jnp.broadcast_to(batch["zfar"][:, None],
                                 (end - start, n_alpha_to_gather)),
    }
    if "zbuf" in frames:
        alpha["zbuf"] = jnp.stack(alphas["zbuf"], axis=1)
    return batch, alpha


# ---------------------------------------------------------------------------
# Augmentation (reference depth_model_utils.py:873-919)
# ---------------------------------------------------------------------------


def _rgb_to_gray(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


def adjust_image(x, brightness, contrast, saturation, hue):
    """Brightness/contrast/saturation/hue jitter (torchvision semantics,
    approximated with a channel-rotation hue shift). x NHWC in [0,1]."""
    x = jnp.clip(x * brightness, 0.0, 1.0)
    gray_mean = jnp.mean(_rgb_to_gray(x), axis=(-3, -2), keepdims=True)
    x = jnp.clip(gray_mean + contrast * (x - gray_mean), 0.0, 1.0)
    gray = _rgb_to_gray(x)
    x = jnp.clip(gray + saturation * (x - gray), 0.0, 1.0)
    # Hue: rotate color components around the gray axis (small-angle approx)
    theta = hue * 2.0 * jnp.pi
    u = x - gray
    rolled = jnp.roll(u, 1, axis=-1)
    x = jnp.clip(gray + u * jnp.cos(theta) + rolled * jnp.sin(theta), 0.0, 1.0)
    return x


def sample_jitter_factors(key, cfg: DepthBatchConfig):
    ks = jax.random.split(key, 4)
    u = [jax.random.uniform(k, ()) for k in ks]
    return (
        jnp.maximum(0.0, 1 + cfg.brightness_jitter_range * (1 - 2 * u[0])),
        jnp.maximum(0.0, 1 + cfg.contrast_jitter_range * (1 - 2 * u[1])),
        jnp.maximum(0.0, 1 + cfg.saturation_jitter_range * (1 - 2 * u[2])),
        cfg.hue_jitter_range * (1 - 2 * u[3]),
    )


_FLIP = jnp.diag(jnp.array([-1.0, 1.0, 1.0]))


def apply_symmetry(x, R, T, mask=None):
    """Horizontal flip with consistent pose conjugation.

    The reference flips euler angles Y,Z and negates T_x
    (depth_model_utils.py:895-919); conjugating by F=diag(-1,1,1) is the same
    map: R' = F R F, T' = T F."""
    flipped = x[..., :, ::-1, :]
    R2 = _FLIP @ R @ _FLIP
    T2 = T * jnp.array([-1.0, 1.0, 1.0])
    m2 = mask[..., :, ::-1, :] if mask is not None else None
    return flipped, R2, T2, m2


# ---------------------------------------------------------------------------
# The depth mega-step
# ---------------------------------------------------------------------------


def make_apply_depth_fn(depth_model: ManyDepth, cfg: DepthBatchConfig,
                        compute_loss: bool, use_perfect_depth: bool = False,
                        train: bool = False, data_augmentation: bool = None):
    """Build the jitted apply_depth_model (reference macarons_utils.py:888-1088).

    Returns fn(variables, batch, alpha, key) ->
      (loss, depth (B,H,W,1), mask, error_mask, pose, gt_pose, new_batch_stats)
    """
    augment = cfg.data_augmentation if data_augmentation is None else data_augmentation

    def run(variables, batch, alpha, key):
        images = batch["images"]
        mask = batch["mask"]
        R, T = batch["R"], batch["T"]
        alpha_images = alpha["images"]
        alpha_mask = alpha["mask"]
        B = images.shape[0]
        H, W = images.shape[1], images.shape[2]

        # Relative poses w.r.t. the reference frame (reference :919-921)
        alpha_R, alpha_T = dl.get_relative_pose_matrices(R, T, alpha["R"],
                                                         alpha["T"])
        R = jnp.broadcast_to(jnp.eye(3)[None], (B, 3, 3))
        T = jnp.zeros_like(T)

        sym_flag = jnp.array(False)
        if augment:
            k_cj, k_cs, k_j, k_key = jax.random.split(key, 4)
            do_jitter = jax.random.uniform(k_cj, ()) < cfg.jitter_probability
            bf, cf, sf, hf = sample_jitter_factors(k_j, cfg)
            jit_images = adjust_image(images, bf, cf, sf, hf)
            jit_alpha = adjust_image(alpha_images, bf, cf, sf, hf)
            images = jnp.where(do_jitter, jit_images, images)
            alpha_images = jnp.where(do_jitter, jit_alpha, alpha_images)

            do_sym = jax.random.uniform(k_cs, ()) < cfg.symmetry_probability
            f_img, f_R, f_T, f_mask = apply_symmetry(images, R, T, mask)
            fa_img, fa_R, fa_T, fa_mask = apply_symmetry(alpha_images, alpha_R,
                                                         alpha_T, alpha_mask)
            images = jnp.where(do_sym, f_img, images)
            mask = jnp.where(do_sym, f_mask, mask)
            R = jnp.where(do_sym, f_R, R)
            T = jnp.where(do_sym, f_T, T)
            alpha_images = jnp.where(do_sym, fa_img, alpha_images)
            alpha_mask = jnp.where(do_sym, fa_mask, alpha_mask)
            alpha_R = jnp.where(do_sym, fa_R, alpha_R)
            alpha_T = jnp.where(do_sym, fa_T, alpha_T)
            sym_flag = do_sym

        gt_pose = dl.convert_matrix_to_pose(R, T, alpha_R, alpha_T,
                                            cfg.pose_factor)

        new_stats = variables.get("batch_stats")
        if use_perfect_depth:
            zbuf = jnp.clip(batch["zbuf"], cfg.znear, cfg.zfar)
            pose = gt_pose[:, : cfg.n_alpha]
            depths = [zbuf] * 4
            disp1 = depth_to_disparity(zbuf, cfg.znear, cfg.zfar)
        else:
            if train:
                (pose, d1, d2, d3, d4), updates = depth_model.apply(
                    variables, images, alpha_images[:, : cfg.n_alpha], R, T,
                    gt_pose=gt_pose[:, : cfg.n_alpha], train=True,
                    mutable=["batch_stats"],
                )
                new_stats = updates["batch_stats"]
            else:
                pose, d1, d2, d3, d4 = depth_model.apply(
                    variables, images, alpha_images[:, : cfg.n_alpha], R, T,
                    gt_pose=gt_pose[:, : cfg.n_alpha],
                )
            disp1 = d1
            depths = [disparity_to_depth(d, cfg.znear, cfg.zfar)
                      for d in (d1, d2, d3, d4)]
            # Upsample coarser scales to full res (reference :969-975, nearest)
            depths = [depths[0]] + [
                jax.image.resize(d, (B, H, W, 1), "nearest") for d in depths[1:]
            ]

        mask1 = mask if cfg.use_depth_mask else None

        # Error mask from regularity statistics (reference :984-993)
        norm_disp1 = jax.lax.stop_gradient(disp1)
        mean_d = jnp.mean(norm_disp1, axis=(1, 2), keepdims=True)
        norm_disp1 = norm_disp1 / (mean_d + 1e-7)
        if mask1 is not None:
            norm_disp1 = norm_disp1 * mask1
        pad_d = jnp.pad(norm_disp1, ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")
        pad_i = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")
        error_tab = dl.regularity_tab(pad_d, pad_i)  # (B, H, W, 1)
        flat = error_tab.reshape(B, -1)
        thr = (jnp.mean(flat, -1) + jnp.std(flat, -1)).reshape(B, 1, 1, 1)
        error_mask = error_tab < thr

        loss = jnp.array(0.0)
        if compute_loss:
            p_loss = dl.pose_loss(pose, gt_pose[:, : cfg.n_alpha],
                                  cfg.pose_factor, cfg.rotation_mode)

            reg_loss = 0.0
            if cfg.regularity_loss and cfg.regularity_factor > 0:
                for w, d in zip((1.0, 0.5, 0.25, 0.125), depths):
                    disp = depth_to_disparity(d, cfg.znear, cfg.zfar)
                    nd = disp / (jnp.mean(disp, axis=(1, 2), keepdims=True) + 1e-7)
                    if mask1 is not None:
                        nd = nd * mask1
                    reg_loss = reg_loss + w * dl.regularity_loss(nd, images)
                reg_loss = cfg.regularity_factor * reg_loss

            cameras = FoVCamera.create(R, T, zfar=cfg.zfar)
            A = alpha_R.shape[1]
            alpha_cams = FoVCamera.create(
                alpha_R.reshape(-1, 3, 3), alpha_T.reshape(-1, 3), zfar=cfg.zfar
            )
            rec_loss = 0.0
            for d in depths:
                rec_loss = rec_loss + dl.reconstruction_loss(
                    images, alpha_images, mask, cameras, alpha_cams, d,
                    ssim_factor=cfg.ssim_factor, use_mask=cfg.use_depth_mask,
                    zfar=cfg.zfar, padding_mode=cfg.padding_mode,
                )
            loss = (p_loss + rec_loss + reg_loss) / 4.0

        depth = jax.lax.stop_gradient(depths[0])
        out_mask = mask1 if mask1 is not None else jnp.ones_like(depth, bool)
        if augment:
            depth = jnp.where(sym_flag, depth[..., :, ::-1, :], depth)
            out_mask = jnp.where(sym_flag, out_mask[..., :, ::-1, :], out_mask)
            error_mask = jnp.where(sym_flag, error_mask[..., :, ::-1, :],
                                   error_mask)
        return loss, depth, out_mask, error_mask, pose, gt_pose, new_stats

    return jax.jit(run)
