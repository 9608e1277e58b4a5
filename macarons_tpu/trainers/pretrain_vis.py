"""SconeVis (coverage-gain) pretraining on ShapeNet.

TPU rebuild of reference macarons/trainers/pretrain_scone_vis.py: a frozen
pretrained SconeOcc infers occupancy over box-sampled proxy points, occupancy-
weighted MC sampling picks seq_len points, SconeVis predicts visibility-gain
harmonics, and the fused batched coverage-gain evaluation scores ALL candidate
cameras in one launch; loss is the uncentered-L1 between predicted and GT gain
distributions derived from precomputed coverage matrices.

Everything after host batch assembly is ONE jit step, data-parallel over the
mesh. The reference's dynamic filter/unique steps become masks and
sample-with-repeats (see ops.view_state.sample_proxy_points).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..config import Params
from ..data import datasets as D
from ..models import losses as L
from ..models.scone import (
    SconeOcc,
    SconeVis,
    compute_coverage_gain,
    compute_occupancy_probability,
)
from ..ops.geometry import FoVCamera, look_at_view_transform
from ..ops.view_state import (
    compute_view_harmonics,
    compute_view_state,
    filter_proxy_points_mask,
    get_all_harmonics_under_degree,
    normalize_points_in_prediction_box,
    sample_proxy_points,
)
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint
from ..utils.schedule import warmup_constant_schedule
from .pretrain_occ import build_model as build_occ_model, candidate_camera_poses


class TrainState(train_state.TrainState):
    pass


def build_vis_model(params: Params) -> SconeVis:
    return SconeVis(use_sigmoid=params.get("use_sigmoid", True))


def gt_coverage_gain(coverage, view_idx, view_mask):
    """GT gain of every candidate from precomputed coverage matrices.

    coverage (C, S); view_idx (V,), view_mask (V,) -> (C,)
    (reference scone_utils.py:649-668)."""
    prev = jnp.sum(
        coverage[view_idx] * view_mask[:, None].astype(coverage.dtype), axis=0
    )  # (S,)
    prev_cov = jnp.mean((prev > 0).astype(coverage.dtype))
    total = jnp.mean((prev[None, :] + coverage > 0).astype(coverage.dtype), axis=-1)
    return total - prev_cov


def assemble_vis_batch(rs, paths, X_cam_world, params, n_views=None,
                       view_sequences=None):
    """Fixed-shape host batch for the vis pretrainer (reference loop :10-123).

    Reuses the occ assembly for pc/views and adds the coverage matrices."""
    base = D.assemble_occ_batch(
        rs, paths, X_cam_world, params.n_view_min, params.n_view_max,
        params.seq_len, n_sample=1,
        n_views=n_views,
        prediction_in_random_camera_space=params.get(
            "prediction_in_random_camera_space", False),
    )
    covs = []
    for i, p in enumerate(paths):
        _, _, cov = D.get_gt_partial_point_clouds(p)
        covs.append(cov)
        if view_sequences is not None:
            # Deterministic validation: override with the optimal sequence prefix
            n_view = int(base["view_mask"][i].sum())
            seq = view_sequences[i][: n_view]
            base["view_idx"][i, :n_view] = seq
            base["pred_cam_idx"][i] = seq[0]
    base["coverage"] = np.stack(covs).astype(np.float32)
    del base["X"], base["occs"]
    return base


def make_vis_step(params: Params, occ_model: SconeOcc, vis_model: SconeVis,
                  occ_variables, train: bool = True):
    """(vis_state, batch, key) -> (state, loss, cov_pred, cov_truth)."""
    n_elev = params.view_state_n_elev
    n_azim = params.view_state_n_azim
    degree = params.harmonic_degree
    gt_max_diagonal = params.gt_max_diagonal
    camera_dist = params.camera_dist
    n_proxy = params.n_proxy_points
    seq_len = params.seq_len
    min_occ = params.get("min_occ_for_proxy_points", 0.1)
    use_occ_sample = params.get("use_occ_to_sample_proxy_points", True)
    filter_tol = params.get("filter_tol", 0.01)
    occ_no_vh = params.get("occ_no_view_harmonics", False)
    no_vh = params.get("no_view_harmonics", False)

    X_cam_world, cand_R, cand_T = candidate_camera_poses(params)
    base_harmonics, h_polar, _ = get_all_harmonics_under_degree(degree, n_elev, n_azim)
    box_center = jnp.array([0.0, 0.0, camera_dist])

    def per_item(vis_params, pc, pc_mask, view_idx, view_mask, pred_cam_idx,
                 coverage, key):
        k_box, k_occ, k_sample = jax.random.split(key, 3)
        R = cand_R[pred_cam_idx]
        T = cand_T[pred_cam_idx]

        def to_view(pts):
            return jnp.einsum("nj,ji->ni", pts, R) + T[None, :]

        def norm(pts):
            return normalize_points_in_prediction_box(pts, box_center, gt_max_diagonal)

        pc_n = norm(to_view(pc))
        X_cam_n = norm(to_view(X_cam_world))
        X_view = X_cam_n[view_idx]  # (V, 3)

        # Proxy points sampled uniformly in the normalized prediction box
        X = jax.random.uniform(
            k_box, (n_proxy, 3), minval=-0.5, maxval=0.5
        ) * 1.0  # gt_max_diagonal-normalized box

        # Filter: projected-bbox of the observed cloud from the view cameras
        R_v, T_v = look_at_view_transform(eye=X_view, at=jnp.zeros_like(X_view))
        view_cams = FoVCamera.create(R_v, T_v, zfar=1000.0)
        keep = filter_proxy_points_mask(view_cams, X, pc_n, filter_tol=filter_tol,
                                        pc_mask=pc_mask)

        vs = compute_view_state(X[None], X_view[None], n_elev, n_azim,
                                view_mask=view_mask[None])
        vh = compute_view_harmonics(vs, base_harmonics, h_polar, n_elev, n_azim)
        occ_vh = jnp.where(occ_no_vh, 0.0, vh)
        vis_vh = jnp.where(no_vh, 0.0, vh)

        occ = compute_occupancy_probability(
            occ_model, occ_variables, pc_n[None], X[None], occ_vh,
            key=k_occ, pc_mask=pc_mask[None],
            max_points_per_pass=params.get("max_points_per_scone_occ_pass",
                                           300000),
        )[0]
        occ = jax.lax.stop_gradient(occ)

        pts4, harm, idx, smask = sample_proxy_points(
            k_sample, X, occ, vis_vh[0], seq_len, min_occ,
            use_occ_to_sample=use_occ_sample, valid_mask=keep,
        )
        harmonics = vis_model.apply(
            {"params": vis_params}, pts4[None], harm[None], pts_mask=smask[None]
        )
        gains = compute_coverage_gain(pts4[None], harmonics, X_cam_n[None],
                                      pts_mask=smask[None],
                                      use_sigmoid=params.get("use_sigmoid", True))
        gt = gt_coverage_gain(coverage, view_idx, view_mask)
        return gains[0], gt

    def forward(vis_params, batch, key):
        B = batch["pc"].shape[0]
        keys = jax.random.split(key, B)
        pred, truth = jax.vmap(
            lambda pc, m, vi, vm, pi, cov, k: per_item(
                vis_params, pc, m, vi, vm, pi, cov, k)
        )(batch["pc"], batch["pc_mask"], batch["view_idx"], batch["view_mask"],
          batch["pred_cam_idx"], batch["coverage"], keys)
        loss = L.uncentered_l1(pred[..., None], truth[..., None])
        return loss, (pred, truth)

    if train:

        @jax.jit
        def step(state, batch, key):
            (loss, (pred, truth)), grads = jax.value_and_grad(
                lambda p: forward(p, batch, key), has_aux=True
            )(state.params)
            state = state.apply_gradients(grads=grads)
            return state, loss, pred, truth

        return step

    @jax.jit
    def eval_step(state, batch, key):
        loss, (pred, truth) = forward(state.params, batch, key)
        return loss, pred, truth

    return eval_step


def greedy_optimal_sequences(coverage: np.ndarray, max_len: int) -> np.ndarray:
    """Greedy max-gain view sequence from a coverage matrix (C, S).

    Stand-in for the reference's precomputed validation_optimal_trajectories.pt
    (scone_utils.py:699-711) when the file is absent — same greedy construction.
    """
    C = coverage.shape[0]
    seq = []
    covered = np.zeros(coverage.shape[1], bool)
    for _ in range(max_len):
        gains = ((coverage > 0) & ~covered[None, :]).mean(axis=1)
        if seq:
            gains[np.array(seq)] = -1.0
        j = int(np.argmax(gains))
        seq.append(j)
        covered |= coverage[j] > 0
    return np.array(seq, np.int32)


def nbv_metric(pred_gains: np.ndarray, coverage: np.ndarray,
               view_idx: np.ndarray, view_mask: np.ndarray) -> float:
    """True gain of the argmax-predicted camera (reference pretrain_scone_vis.py:303-319)."""
    import numpy as np

    best = int(np.argmax(pred_gains))
    vidx = view_idx[view_mask.astype(bool)]
    prev = coverage[vidx].sum(axis=0)
    prev_cov = (prev > 0).mean()
    new_cov = ((prev + coverage[best]) > 0).mean()
    return float(new_cov - prev_cov)


def run_training(params: Params, data_path: Optional[str] = None,
                 weights_dir: str = "weights/scone/coverage_gain",
                 occ_weights_path: Optional[str] = None,
                 max_batches_per_epoch: Optional[int] = None,
                 verbose: bool = True):
    """Full vis pretraining driver (reference pretrain_scone_vis.py:348-562)."""
    data_path = data_path or params.data_path
    rs = np.random.default_rng(params.get("random_seed", 42))
    rng = jax.random.PRNGKey(params.get("torch_seed", 5))

    train_ds, val_ds, _ = D.get_shapenet_datasets(data_path)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch_size = params.batch_size * n_dev

    # Frozen pretrained SconeOcc
    occ_model = build_occ_model(params)
    rng, k_occ = jax.random.split(rng)
    L_pc = params.n_view_max * params.seq_len
    occ_vars = occ_model.init(
        k_occ, jnp.zeros((1, L_pc, 3)), jnp.zeros((1, 8, 3)),
        jnp.zeros((1, 8, params.harmonic_degree**2)),
    )
    if occ_weights_path and checkpoint_exists(occ_weights_path):
        from .pretrain_occ import create_train_state as occ_state_fn

        occ_state = occ_state_fn(params, occ_model, k_occ)
        occ_state, _ = load_checkpoint(occ_weights_path, occ_state)
        occ_vars = {"params": occ_state.params}
    occ_vars = replicate(occ_vars, mesh)

    vis_model = build_vis_model(params)
    rng, k_vis = jax.random.split(rng)
    vis_variables = vis_model.init(
        k_vis, jnp.zeros((1, params.seq_len, 4)),
        jnp.zeros((1, params.seq_len, params.harmonic_degree**2)),
    )
    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    schedule = warmup_constant_schedule(
        params.learning_rate, params.warmup,
        lr_epochs=params.get("lr_epochs", []) if params.get("schedule_learning_rate") else [],
        lr_factor=params.get("lr_factor", 1.0),
        steps_per_epoch=steps_per_epoch,
    )
    state = TrainState.create(
        apply_fn=vis_model.apply, params=vis_variables["params"],
        tx=optax.adamw(schedule),
    )
    state = replicate(state, mesh)

    name = params.get("scone_vis_model_name", "scone_vis")
    start_epoch, best_loss = 0, float("inf")
    train_losses, val_losses, nbv_metrics = [], [], []
    resume_path = os.path.join(weights_dir, f"unvalidated_{name}")
    if not params.get("start_from_scratch", True) and checkpoint_exists(resume_path):
        state_tree, meta = load_checkpoint(resume_path, state)
        state = replicate(state_tree, mesh)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_loss = float(meta.get("best_loss", best_loss))
        train_losses = list(meta.get("train_losses", []))
        val_losses = list(meta.get("val_losses", []))

    X_cam_world, _, _ = candidate_camera_poses(params)
    X_np = np.asarray(X_cam_world)
    step_fn = make_vis_step(params, occ_model, vis_model, occ_vars, train=True)
    eval_fn = make_vis_step(params, occ_model, vis_model, occ_vars, train=False)

    for epoch in range(start_epoch, params.epochs):
        t0 = time.time()
        ep_loss, n_steps = 0.0, 0
        for paths in D.iterate_batches(train_ds.paths, batch_size, shuffle=True,
                                       seed=params.get("random_seed", 42),
                                       epoch=epoch):
            if max_batches_per_epoch and n_steps >= max_batches_per_epoch:
                break
            batch = shard_batch(assemble_vis_batch(rs, paths, X_np, params), mesh)
            rng, k = jax.random.split(rng)
            state, loss, _, _ = step_fn(state, batch, k)
            ep_loss += float(loss)
            n_steps += 1
        train_loss = ep_loss / max(n_steps, 1)
        train_losses.append(train_loss)

        # Validation: deterministic view counts + greedy-optimal sequences + NBV metric
        val_loss, n_val = 0.0, 0
        nbv_vals = []
        n_views_all = D.get_validation_n_views_list(
            len(val_ds), params.n_view_min, params.n_view_max)
        vi = 0
        for paths in D.iterate_batches(val_ds.paths, batch_size, shuffle=False):
            if max_batches_per_epoch and n_val >= max_batches_per_epoch:
                break
            nv = n_views_all[vi : vi + len(paths)]
            vi += len(paths)
            seqs = []
            for p in paths:
                _, _, cov = D.get_gt_partial_point_clouds(p)
                seqs.append(greedy_optimal_sequences(cov, params.n_view_max))
            hb = assemble_vis_batch(rs, paths, X_np, params, n_views=nv,
                                    view_sequences=seqs)
            batch = shard_batch(hb, mesh)
            rng, k = jax.random.split(rng)
            loss, pred, truth = eval_fn(state, batch, k)
            val_loss += float(loss)
            for i in range(len(paths)):
                nbv_vals.append(nbv_metric(np.asarray(pred[i]), hb["coverage"][i],
                                           hb["view_idx"][i], hb["view_mask"][i]))
            n_val += 1
        val_loss /= max(n_val, 1)
        val_losses.append(val_loss)
        nbv_metrics.append(float(np.mean(nbv_vals)) if nbv_vals else 0.0)

        meta = {
            "epoch": epoch, "loss": train_loss, "best_loss": best_loss,
            "train_losses": train_losses, "val_losses": val_losses,
            "nbv_metrics": nbv_metrics,
        }
        save_checkpoint(os.path.join(weights_dir, f"unvalidated_{name}"), state, meta)
        if train_loss < best_loss:
            best_loss = train_loss
            meta["best_loss"] = best_loss
            save_checkpoint(os.path.join(weights_dir, f"best_unval_{name}"), state, meta)
        if verbose:
            print(f"epoch {epoch}: train {train_loss:.6f} val {val_loss:.6f} "
                  f"nbv {nbv_metrics[-1]:.4f} ({time.time() - t0:.1f}s)")
    return state, train_losses, val_losses, nbv_metrics
