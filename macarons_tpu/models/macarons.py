"""MACARONS composition: depth + occupancy + visibility modules, one bundle.

Rebuilds reference macarons/networks/Macarons.py:18-309. In JAX there is no
DDP-driven need for string-mode dispatch or twin module shells — the bundle is
a NamedTuple of three flax modules plus their variable trees, with factories,
checkpoint IO, and a two-optimizer trainer state with freeze flags
(reference MacaronsOptimizer :59-88).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Params
from ..utils.checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint
from .many_depth import ManyDepth
from .scone import SconeOcc, SconeVis


class MacaronsModel(NamedTuple):
    depth: ManyDepth
    occ: SconeOcc
    vis: SconeVis


class MacaronsVariables(NamedTuple):
    depth: Any  # {"params", "batch_stats"}
    occ: Any  # {"params"}
    vis: Any  # {"params"}


def create_macarons_model(params: Params) -> MacaronsModel:
    """Assemble the three modules from config (reference Macarons.py:232-253)."""
    # depth_compute_dtype="bfloat16" runs every conv in bf16 (geometry /
    # disparity heads stay f32 inside the module; params stay f32, so
    # checkpoints are unchanged). Default stays f32: on the tunneled axon
    # runtime an explicit-bf16 matmul measures 0.2 TFLOP/s vs 72.7 for f32
    # arrays (a ~465x fallback penalty, measured round 4) — f32 arrays
    # already use bf16 MXU passes internally at default matmul precision,
    # so explicit bf16 storage only pays when the runtime supports it.
    depth_dtype = params.get("depth_compute_dtype")
    if depth_dtype in (None, "none", "float32"):
        depth_dtype = None
    depth = ManyDepth(
        input_height=params.get("image_height", 256),
        input_width=params.get("image_width", 456),
        d_min=params.get("znear", 0.5),
        d_max=params.get("zfar", 750.0),
        n_depth=params.get("n_depth", 96),
        pose_factor=params.get("pose_factor", 100.0),
        learn_pose=params.get("learn_pose", False),
        dtype=jnp.dtype(depth_dtype) if depth_dtype else None,
    )
    occ = SconeOcc(
        seq_len=params.get("seq_len", 2048),
        n_scale=0 if params.get("no_local_features", False) else 3,
        k_for_knn=params.get("k_for_knn", 16),
    )
    vis = SconeVis(use_sigmoid=params.get("use_sigmoid", True))
    return MacaronsModel(depth, occ, vis)


def init_macarons_variables(params: Params, model: MacaronsModel,
                            key) -> MacaronsVariables:
    k1, k2, k3 = jax.random.split(key, 3)
    H = params.get("image_height", 256)
    W = params.get("image_width", 456)
    n_alpha = params.get("n_alpha", 2)
    depth_vars = model.depth.init(
        k1, jnp.zeros((1, H, W, 3)), jnp.zeros((1, n_alpha, H, W, 3)),
        jnp.eye(3)[None], jnp.zeros((1, 3)), gt_pose=jnp.zeros((1, n_alpha, 6)),
    )
    occ_vars = model.occ.init(
        k2, jnp.zeros((1, 128, 3)), jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 64))
    )
    vis_vars = model.vis.init(
        k3, jnp.zeros((1, 128, 4)), jnp.zeros((1, 128, 64))
    )
    return MacaronsVariables(depth_vars, occ_vars, vis_vars)


class MacaronsOptimizer(NamedTuple):
    """Two AdamW chains with independent freeze flags (reference Macarons.py:59-88).

    Freezing is realized by not applying updates (host-side flags select which
    grads are computed/applied in the trainer)."""

    depth_tx: Any
    scone_tx: Any
    depth_opt_state: Any
    scone_opt_state: Any
    depth_frozen: bool = False
    scone_frozen: bool = False


def create_macarons_optimizer(params: Params, variables: MacaronsVariables,
                              depth_lr: Optional[float] = None,
                              scone_lr: Optional[float] = None):
    depth_lr = depth_lr if depth_lr is not None else params.get("depth_learning_rate", params.get("learning_rate", 1e-4))
    scone_lr = scone_lr if scone_lr is not None else params.get("scone_learning_rate", params.get("learning_rate", 1e-4))
    depth_tx = optax.adamw(depth_lr)
    scone_tx = optax.adamw(scone_lr)
    scone_params = {"occ": variables.occ["params"], "vis": variables.vis["params"]}
    return MacaronsOptimizer(
        depth_tx, scone_tx,
        depth_tx.init(variables.depth["params"]),
        scone_tx.init(scone_params),
    )


# -- checkpoint IO ----------------------------------------------------------


def save_macarons(path: str, variables: MacaronsVariables, metadata=None,
                  opt_states: Optional[dict] = None):
    """Save the bundle (+ optionally the two optimizer states, reference
    train_macarons.py:1603-1612 saves model + optimizer state dicts)."""
    tree = {"depth": variables.depth, "occ": variables.occ, "vis": variables.vis}
    if opt_states is not None:
        tree["depth_opt"] = opt_states["depth"]
        tree["scone_opt"] = opt_states["scone"]
    save_checkpoint(path, tree, metadata)


def load_macarons(path: str, variables: MacaronsVariables,
                  opt_states: Optional[dict] = None):
    """Restore the bundle saved by save_macarons. With `opt_states` (templates
    with the right structure), also restores both optimizer states and returns
    (variables, opt_states, meta); else (variables, meta)."""
    tree = {"depth": variables.depth, "occ": variables.occ, "vis": variables.vis}
    if opt_states is not None:
        tree["depth_opt"] = opt_states["depth"]
        tree["scone_opt"] = opt_states["scone"]
    loaded, meta = load_checkpoint(path, tree)
    new_vars = MacaronsVariables(loaded["depth"], loaded["occ"], loaded["vis"])
    if opt_states is not None:
        return new_vars, {"depth": loaded["depth_opt"],
                          "scone": loaded["scone_opt"]}, meta
    return new_vars, meta


def load_pretrained_module_weights(variables: MacaronsVariables,
                                   occ_ckpt: Optional[str] = None,
                                   vis_ckpt: Optional[str] = None):
    """Graft pretrained SconeOcc/SconeVis pretrainer checkpoints into the bundle
    (reference weights/generate_macarons_model.py:96-160)."""
    occ_vars, vis_vars = variables.occ, variables.vis
    if occ_ckpt and checkpoint_exists(occ_ckpt):
        from ..trainers.pretrain_occ import TrainState  # noqa: F401

        # Pretrainer checkpoints store a TrainState whose .params matches
        target = {"params": occ_vars["params"]}
        try:
            loaded, _ = load_checkpoint(occ_ckpt, target)
            occ_vars = {"params": loaded["params"]}
        except Exception:
            pass
    if vis_ckpt and checkpoint_exists(vis_ckpt):
        target = {"params": vis_vars["params"]}
        try:
            loaded, _ = load_checkpoint(vis_ckpt, target)
            vis_vars = {"params": loaded["params"]}
        except Exception:
            pass
    return MacaronsVariables(variables.depth, occ_vars, vis_vars)
