"""Standalone self-supervised depth pretraining over saved frame trajectories.

Rebuilds the reference's standalone depth-training plumbing
(depth_model_utils.py:156-381: RGBDataset dataloaders, depth-model init/load,
photometric training loop) as a runnable trainer — the reference keeps these
paths vestigial with no CLI; here `run_training(params)` trains a ManyDepth
model alone on frames captured into a scene memory (the same .npz frame
schema the online trainer writes), with resume and best-loss checkpoints.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Params
from ..data.datasets import RGBDataset
from ..models.many_depth import ManyDepth
from ..scene.depth_runtime import (
    DepthBatchConfig,
    make_apply_depth_fn,
)
from ..utils.checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint


def build_model(params: Params) -> ManyDepth:
    return ManyDepth(
        input_height=params.get("image_height", 256),
        input_width=params.get("image_width", 456),
        d_min=params.get("znear", 0.5),
        d_max=params.get("zfar", 750.0),
        n_depth=params.get("n_depth", 96),
        pose_factor=params.get("pose_factor", 100.0),
        learn_pose=params.get("learn_pose", False),
    )


def depth_cfg(params: Params) -> DepthBatchConfig:
    return DepthBatchConfig(
        n_alpha=params.get("n_alpha", 2),
        n_alpha_for_supervision=params.get("n_alpha", 2),
        alphas=tuple(params.get("alphas", [-2, -1])),
        znear=params.get("znear", 0.5), zfar=params.get("zfar", 750.0),
        pose_factor=params.get("pose_factor", 100.0),
        rotation_mode=params.get("rotation_mode", "angle"),
        ssim_factor=params.get("ssim_factor", 0.85),
        regularity_factor=params.get("regularity_factor", 0.01),
        regularity_loss=params.get("regularity_loss", True),
        use_depth_mask=params.get("use_depth_mask", True),
        padding_mode=params.get("padding_mode", "border"),
        data_augmentation=params.get("data_augmentation", True),
        jitter_probability=params.get("jitter_probability", 0.5),
        symmetry_probability=params.get("symmetry_probability", 0.5),
    )


def load_frame_batch(items: List[dict], n_alpha: int):
    """Stack RGBDataset items into (batch, alpha) dicts for apply_depth_model."""
    imgs, masks, Rs, Ts, zfars = [], [], [], [], []
    a_imgs, a_masks, a_Rs, a_Ts = [], [], [], []
    for it in items:
        f = dict(np.load(it["frame"]))
        imgs.append(f["rgb"][0])
        masks.append(f["mask"][0])
        Rs.append(f["R"][0])
        Ts.append(f["T"][0])
        zfars.append(float(f["zfar"]))
        ai, am, ar, at = [], [], [], []
        for ap in it["alpha_frames"]:
            af = dict(np.load(ap))
            ai.append(af["rgb"][0])
            am.append(af["mask"][0])
            ar.append(af["R"][0])
            at.append(af["T"][0])
        a_imgs.append(ai)
        a_masks.append(am)
        a_Rs.append(ar)
        a_Ts.append(at)
    batch = {
        "images": jnp.asarray(np.stack(imgs)),
        "mask": jnp.asarray(np.stack(masks)).astype(bool),
        "R": jnp.asarray(np.stack(Rs)),
        "T": jnp.asarray(np.stack(Ts)),
        "zfar": jnp.asarray(np.asarray(zfars, np.float32)),
    }
    alpha = {
        "images": jnp.asarray(np.stack(a_imgs)),
        "mask": jnp.asarray(np.stack(a_masks)).astype(bool),
        "R": jnp.asarray(np.stack(a_Rs)),
        "T": jnp.asarray(np.stack(a_Ts)),
        "zfar": jnp.broadcast_to(batch["zfar"][:, None],
                                 (len(items), n_alpha)),
    }
    return batch, alpha


def run_training(params: Params, frames_dirs: Optional[List[str]] = None,
                 weights_dir: str = "weights/depth", verbose: bool = True):
    """Train ManyDepth alone on saved frames (photometric self-supervision).

    frames_dirs: directories of .npz frames (the online trainer's memory
    layout); defaults to params.frames_dirs."""
    frames_dirs = frames_dirs or list(params.get("frames_dirs", []))
    if not frames_dirs:
        raise ValueError("no frames_dirs given")
    rs = np.random.default_rng(params.get("random_seed", 42))
    key = jax.random.PRNGKey(params.get("torch_seed", 5))

    cfg = depth_cfg(params)
    dataset = RGBDataset(frames_dirs, alphas=list(cfg.alphas))
    if len(dataset) == 0:
        raise ValueError("RGBDataset is empty")

    model = build_model(params)
    H = params.get("image_height", 256)
    W = params.get("image_width", 456)
    n_alpha = cfg.n_alpha
    key, k_init = jax.random.split(key)
    variables = model.init(
        k_init, jnp.zeros((1, H, W, 3)), jnp.zeros((1, n_alpha, H, W, 3)),
        jnp.eye(3)[None], jnp.zeros((1, 3)), gt_pose=jnp.zeros((1, n_alpha, 6)))

    lr = params.get("depth_learning_rate", params.get("learning_rate", 1e-4))
    tx = optax.adamw(lr, weight_decay=0.01)
    opt_state = tx.init(variables["params"])

    apply_loss = make_apply_depth_fn(model, cfg, compute_loss=True, train=True)

    @jax.jit
    def step(variables, opt_state, batch, alpha, key):
        def loss_fn(p):
            v = {"params": p, "batch_stats": variables["batch_stats"]}
            loss, *_rest, new_stats = apply_loss(v, batch, alpha, key)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        return ({"params": new_params, "batch_stats": new_stats}, opt_state,
                loss)

    name = params.get("depth_model_name", "pretrained_depth")
    resume = os.path.join(weights_dir, f"unvalidated_{name}")
    start_epoch = 0
    best_loss = float("inf")
    losses_per_epoch: List[float] = []
    if not params.get("start_from_scratch", True) and checkpoint_exists(resume):
        tree = {"variables": variables, "opt_state": opt_state}
        loaded, meta = load_checkpoint(resume, tree)
        variables, opt_state = loaded["variables"], loaded["opt_state"]
        start_epoch = int(meta.get("epoch", 0))
        best_loss = float(meta.get("best_loss", best_loss))
        losses_per_epoch = [float(x) for x in meta.get("losses", [])]

    B = params.get("batch_size", 4)
    for epoch in range(start_epoch, params.get("epochs", 1)):
        order = rs.permutation(len(dataset))
        losses = []
        for b0 in range(0, len(order) - B + 1, B):
            items = [dataset[int(i)] for i in order[b0 : b0 + B]]
            batch, alpha = load_frame_batch(items, n_alpha)
            key, k = jax.random.split(key)
            variables, opt_state, loss = step(variables, opt_state, batch,
                                              alpha, k)
            losses.append(loss)
        mean = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        losses_per_epoch.append(mean)
        meta = {"epoch": epoch + 1, "best_loss": best_loss,
                "losses": losses_per_epoch}
        save_checkpoint(resume, {"variables": variables,
                                 "opt_state": opt_state}, meta)
        if mean < best_loss:
            best_loss = mean
            save_checkpoint(os.path.join(weights_dir, f"best_unval_{name}"),
                            {"variables": variables, "opt_state": opt_state},
                            dict(meta, best_loss=best_loss))
        if verbose:
            print(f"epoch {epoch}: depth loss {mean:.5f}")
    return variables, losses_per_epoch
