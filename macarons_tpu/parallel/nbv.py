"""Multi-chip NBV scoring: shard the candidate-camera axis across the mesh.

Single-chip, the fused scorer already evaluates all candidates in one launch
(scene.runtime.make_coverage_gain_fn). Across chips, candidates are an
embarrassingly parallel axis: the proxy field is replicated (it's read-only for
scoring) and each device scores its candidate shard; the argmax happens on the
gathered (C,) gains. XLA inserts the collectives from the sharding annotations
— no hand-written communication, and it rides ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.geometry import FoVCamera


def make_sharded_coverage_gain_fn(base_fn, mesh: Mesh, axis: str = "dp"):
    """Wrap a scene.runtime coverage-gain fn with candidate-axis sharding.

    base_fn: the jitted fn from make_coverage_gain_fn.
    Candidate cameras/positions/keys are sharded on `axis`; the field inputs
    and model params are replicated. The candidate count must be divisible by
    the mesh size (pad with dummy candidates and mask if needed).
    """
    cand = NamedSharding(mesh, P(axis))
    cand_cam = FoVCamera(
        R=cand, T=cand, fov=cand, znear=cand, zfar=cand, aspect_ratio=cand
    )
    repl = NamedSharding(mesh, P())

    def place(tree, sharding):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def run(vis_vars, X_world, harmonics, occ, valid, cand_cams, cand_X,
            prediction_camera, box_diag, cell_resolution, sensor_range, key):
        vis_vars = place(vis_vars, repl)
        X_world = jax.device_put(X_world, repl)
        harmonics = jax.device_put(harmonics, repl)
        occ = jax.device_put(occ, repl)
        valid = jax.device_put(valid, repl)
        cand_cams = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), cand_cams, cand_cam)
        cand_X = jax.device_put(cand_X, cand)
        return base_fn(vis_vars, X_world, harmonics, occ, valid, cand_cams,
                       cand_X, prediction_camera, box_diag, cell_resolution,
                       sensor_range, key)

    return run


def pad_candidates(cand_cams: FoVCamera, cand_X, n_devices: int):
    """Pad the candidate axis to a multiple of n_devices (repeat the last
    candidate; caller slices gains back to the true count)."""
    C = cand_X.shape[0]
    pad = (-C) % n_devices
    if pad == 0:
        return cand_cams, cand_X, C

    def pad_leaf(x):
        reps = jnp.repeat(x[-1:], pad, axis=0)
        return jnp.concatenate([x, reps], axis=0)

    return (jax.tree_util.tree_map(pad_leaf, cand_cams), pad_leaf(cand_X), C)
