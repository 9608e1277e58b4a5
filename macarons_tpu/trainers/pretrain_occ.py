"""SconeOcc pretraining on ShapeNet GT occupancy fields.

TPU rebuild of reference macarons/trainers/pretrain_scone_occ.py: the per-mesh
python loop (load GT -> pick views -> normalize into the prediction camera box ->
view harmonics -> SconeOcc forward -> MSE) becomes host-side fixed-shape batch
assembly (data.datasets.assemble_occ_batch) + ONE jit-compiled train step,
data-parallel over the device mesh (batch axis sharded, params replicated,
gradient psum inserted by XLA — no DDP, no dummy-pass liveness hack).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..config import Params
from ..data import datasets as D
from ..models.scone import SconeOcc
from ..ops.geometry import look_at_view_transform, FoVCamera
from ..ops.view_state import (
    compute_view_harmonics,
    compute_view_state,
    get_all_harmonics_under_degree,
    get_cameras_on_sphere,
    normalize_points_in_prediction_box,
)
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint
from ..utils.schedule import warmup_constant_schedule


class TrainState(train_state.TrainState):
    pass


def build_model(params: Params) -> SconeOcc:
    return SconeOcc(
        seq_len=params.seq_len,
        n_scale=0 if params.get("no_local_features", False) else 3,
    )


def candidate_camera_poses(params: Params):
    """World positions + (R, T) of the candidate cameras (reference :46-49)."""
    X_cam_world, dist, elev, azim = get_cameras_on_sphere(
        params.n_camera_elev, params.n_camera_azim, params.camera_dist,
        pole_cameras=params.pole_cameras,
    )
    R, T = look_at_view_transform(dist=dist, elev=elev, azim=azim)
    return X_cam_world, R, T


def make_train_step(params: Params, model: SconeOcc, train: bool = True):
    """Build the jit-able (state, batch, key) -> (state, loss) step.

    All candidate-camera constants are closed over as device arrays.
    """
    n_elev = params.view_state_n_elev
    n_azim = params.view_state_n_azim
    degree = params.harmonic_degree
    no_vh = params.get("no_view_harmonics", False)
    gt_max_diagonal = params.gt_max_diagonal
    camera_dist = params.camera_dist

    X_cam_world, cand_R, cand_T = candidate_camera_poses(params)
    base_harmonics, h_polar, _ = get_all_harmonics_under_degree(degree, n_elev, n_azim)
    box_center = jnp.array([0.0, 0.0, camera_dist])

    def forward_loss(variables, batch, key):
        B = batch["pc"].shape[0]
        # Prediction-camera world->view transform per item (reference :66-79)
        R = cand_R[batch["pred_cam_idx"]]  # (B, 3, 3)
        T = cand_T[batch["pred_cam_idx"]]  # (B, 3)

        def to_view(pts):
            return jnp.einsum("bnj,bji->bni", pts, R) + T[:, None, :]

        def norm(pts):
            return normalize_points_in_prediction_box(pts, box_center, gt_max_diagonal)

        pc = norm(to_view(batch["pc"]))
        X = norm(to_view(batch["X"]))
        X_cam_all = norm(to_view(jnp.broadcast_to(
            X_cam_world[None], (B, *X_cam_world.shape))))
        X_view = jnp.take_along_axis(
            X_cam_all, batch["view_idx"][..., None].astype(jnp.int32), axis=1
        )  # (B, n_view_max, 3)

        view_state = compute_view_state(
            X, X_view, n_elev, n_azim, view_mask=batch["view_mask"]
        )
        vh = compute_view_harmonics(view_state, base_harmonics, h_polar, n_elev, n_azim)
        if no_vh:
            vh = vh * 0.0

        pred = model.apply(variables, pc, X, vh, key=key, pc_mask=batch["pc_mask"])
        loss = jnp.mean((pred - batch["occs"]) ** 2)
        return loss

    if train:

        @jax.jit
        def step(state, batch, key):
            loss, grads = jax.value_and_grad(
                lambda p: forward_loss({"params": p}, batch, key)
            )(state.params)
            state = state.apply_gradients(grads=grads)
            return state, loss

        return step

    @jax.jit
    def eval_step(state, batch, key):
        return forward_loss({"params": state.params}, batch, key)

    return eval_step


def create_train_state(params: Params, model: SconeOcc, rng,
                       steps_per_epoch: int = 1):
    """Init params + WarmupAdamW optimizer (reference get_optimizer)."""
    B = 1
    L = params.n_view_max * params.seq_len
    dummy_pc = jnp.zeros((B, L, 3))
    dummy_x = jnp.zeros((B, 8, 3))
    dummy_vh = jnp.zeros((B, 8, params.harmonic_degree**2))
    variables = model.init(rng, dummy_pc, dummy_x, dummy_vh)
    schedule = warmup_constant_schedule(
        params.learning_rate, params.warmup,
        lr_epochs=params.get("lr_epochs", []) if params.get("schedule_learning_rate") else [],
        lr_factor=params.get("lr_factor", 1.0),
        steps_per_epoch=steps_per_epoch,
    )
    tx = optax.adamw(schedule)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def run_training(params: Params, data_path: Optional[str] = None,
                 weights_dir: str = "weights/scone/occupancy",
                 max_batches_per_epoch: Optional[int] = None,
                 verbose: bool = True):
    """Full pretraining driver (reference pretrain_scone_occ.py:248-442)."""
    data_path = data_path or params.data_path
    rs = np.random.default_rng(params.get("random_seed", 42))
    rng = jax.random.PRNGKey(params.get("torch_seed", 5))

    train_ds, val_ds, _ = D.get_shapenet_datasets(data_path)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch_size = params.batch_size * n_dev  # global batch

    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    model = build_model(params)
    rng, init_rng = jax.random.split(rng)
    state = create_train_state(params, model, init_rng, steps_per_epoch)
    state = replicate(state, mesh)

    name = params.get("scone_occ_model_name", "scone_occ")
    best_loss = float("inf")
    start_epoch = 0
    train_losses, val_losses = [], []

    resume_path = os.path.join(weights_dir, f"unvalidated_{name}")
    if not params.get("start_from_scratch", True) and checkpoint_exists(resume_path):
        state_tree, meta = load_checkpoint(resume_path, state)
        state = replicate(state_tree, mesh)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_loss = float(meta.get("best_loss", best_loss))
        train_losses = list(meta.get("train_losses", []))
        val_losses = list(meta.get("val_losses", []))

    X_cam_world, _, _ = candidate_camera_poses(params)
    X_cam_world_np = np.asarray(X_cam_world)
    step_fn = make_train_step(params, model, train=True)
    eval_fn = make_train_step(params, model, train=False)

    def make_batch(paths, n_views=None):
        return D.assemble_occ_batch(
            rs, paths, X_cam_world_np,
            params.n_view_min, params.n_view_max,
            params.seq_len, params.n_sample, n_views=n_views,
            prediction_in_random_camera_space=params.get(
                "prediction_in_random_camera_space", False),
        )

    for epoch in range(start_epoch, params.epochs):
        t0 = time.time()
        epoch_loss, n_steps = 0.0, 0
        for paths in D.iterate_batches(train_ds.paths, batch_size, shuffle=True,
                                       seed=params.get("random_seed", 42),
                                       epoch=epoch):
            if max_batches_per_epoch and n_steps >= max_batches_per_epoch:
                break
            batch = shard_batch(make_batch(paths), mesh)
            rng, step_key = jax.random.split(rng)
            state, loss = step_fn(state, batch, step_key)
            epoch_loss += float(loss)
            n_steps += 1
        train_loss = epoch_loss / max(n_steps, 1)
        train_losses.append(train_loss)

        # Validation with deterministic per-sample view counts (reference :204-245)
        val_loss, n_val = 0.0, 0
        n_views_all = D.get_validation_n_views_list(
            len(val_ds), params.n_view_min, params.n_view_max)
        vi = 0
        for paths in D.iterate_batches(val_ds.paths, batch_size, shuffle=False):
            if max_batches_per_epoch and n_val >= max_batches_per_epoch:
                break
            nv = n_views_all[vi : vi + len(paths)]
            vi += len(paths)
            batch = shard_batch(make_batch(paths, n_views=nv), mesh)
            rng, k = jax.random.split(rng)
            val_loss += float(eval_fn(state, batch, k))
            n_val += 1
        val_loss = val_loss / max(n_val, 1)
        val_losses.append(val_loss)

        meta = {
            "epoch": epoch, "loss": train_loss, "best_loss": best_loss,
            "train_losses": train_losses, "val_losses": val_losses,
        }
        save_checkpoint(os.path.join(weights_dir, f"unvalidated_{name}"),
                        state, meta)
        if train_loss < best_loss:
            best_loss = train_loss
            meta["best_loss"] = best_loss
            save_checkpoint(os.path.join(weights_dir, f"best_unval_{name}"),
                            state, meta)
        if verbose:
            print(f"epoch {epoch}: train {train_loss:.6f} val {val_loss:.6f} "
                  f"({time.time() - t0:.1f}s)")
    return state, train_losses, val_losses
