"""Scene-data-parallel online training: one scene per device, like the
reference's one scene per GPU (train_macarons.py:1374-1715, DDP allreduce in
every backward + scone_utils.reduce_tensor :82-87).

TPU-first shape: instead of N processes with NCCL allreduce, the S scenes of a
group run in ONE program — every per-scene supervision input gets a leading
scene axis sharded over the mesh ('dp'), the loss is vmapped per scene and
meaned, so XLA inserts the gradient psum over ICI. The reference's dummy-pass
liveness hack is unnecessary: every scene slice has identical static shapes.

Scenes have per-scene grid shapes (n_cells, capacity from settings.json); a
group is stacked by padding every grid/table to the group max (phantom cells
carry valid=False and are masked everywhere downstream).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..scene.grid import GridState
from ..scene.runtime import CellTables


def pad_grid_state(state: GridState, n_cells: int, capacity: int) -> GridState:
    """Pad (C, K, ...) grid arrays to (n_cells, capacity, ...); padding slots
    are invalid."""
    C, K = state.valid.shape

    def pad(x, fill=0.0):
        out = jnp.zeros((n_cells, capacity) + x.shape[2:], x.dtype)
        return out.at[:C, :K].set(x)

    return GridState(pad(state.points), pad(state.features), pad(state.valid))


def pad_cell_tables(tables: CellTables, n_cells: int, k_cell: int) -> CellTables:
    C, K = tables.slot_mask.shape

    def pad2(x):
        out = jnp.zeros((n_cells, k_cell) + x.shape[2:], x.dtype)
        return out.at[:C, :K].set(x)

    nb = jnp.zeros((n_cells, tables.neighbor_ids.shape[1]),
                   tables.neighbor_ids.dtype).at[:C].set(tables.neighbor_ids)
    centers = jnp.zeros((n_cells, 3), tables.centers.dtype).at[:C].set(
        tables.centers)
    return CellTables(pad2(tables.slots), pad2(tables.slot_mask), nb, centers,
                      tables.pred_diag)


def stack_scene_group(trees: List):
    """Stack a list of identical-structure pytrees along a new leading scene
    axis. Grids/tables must be pre-padded to common shapes."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def group_pad_shapes(scenes) -> tuple:
    """Common (n_cells, capacity, k_cell) for a scene group."""
    n_cells = max(s.surface_scene.valid.shape[0] for s in scenes)
    capacity = max(s.surface_scene.valid.shape[1] for s in scenes)
    k_cell = max(s.cell_table.proxy_slots.shape[1] for s in scenes)
    return n_cells, capacity, k_cell


def shard_scene_axis(tree, mesh: Optional[Mesh], axis: str = "dp"):
    """Place every leaf with its leading (scene) axis sharded over the mesh."""
    if mesh is None:
        return tree
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, tree)


def replicate_tree(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_parallel_scone_step(rt, n_supervision: int):
    """Build the jitted scene-parallel scone supervision step.

    sb (scene batch) is a dict of stacked per-scene inputs (leading axis S):
      proxy: ProxyState (pre-window prediction state),
      sup_occ (S, N, 1) occupancy-loss target, surface: GridState, tables: CellTables,
      pred_R/pred_T (S,1,3,3)/(S,1,3), close_mask (S,N), visited_R (S,F,3,3),
      visited_T (S,F,3), visited_X (S,F,3), sup_gains (S,F), X_world (S,N,3),
      harmonics (S,N,H), occ (S,N,1), valid (S,N), box_diag (S,),
      cell_resolution (S,), n_cells_active (S,)
    Returns step(occ_vars, vis_vars, opt_state, sb, key)
      -> (occ_vars, vis_vars, opt_state, loss, occ_loss, cov_loss)
    """
    from ..models import losses as L
    from ..ops.geometry import FoVCamera

    occ_impl = rt._occ_impl_sup
    coverage_gains = rt.coverage_gains
    tx = rt.scone_tx
    zfar = rt.dcfg.zfar
    sensor_range = rt.sensor_range

    @jax.jit
    def step(occ_vars, vis_vars, opt_state, sb, key):
        S = sb["sup_gains"].shape[0]
        keys = jax.random.split(key, S)

        def scene_loss(ps, sc, k):
            k_occ, k_cov = jax.random.split(k)
            ov = {"params": ps["occ"]}
            vv = {"params": ps["vis"]}
            pred_cam = FoVCamera.create(sc["pred_R"], sc["pred_T"], zfar=zfar)
            proba, pred_mask, _ = occ_impl(
                ov, sc["proxy"], sc["surface"], sc["tables"], pred_cam, k_occ,
                supervision=True, eligible_override=sc["close_mask"],
                n_cells_active=sc["n_cells_active"],
            )
            sup = sc["sup_occ"]
            err = jnp.where(pred_mask[:, None], (proba - sup) ** 2, 0.0)
            n_pred = jnp.sum(pred_mask)
            occ_loss = jnp.sum(err) / jnp.maximum(n_pred, 1) \
                * n_pred / n_supervision

            cams = FoVCamera.create(sc["visited_R"], sc["visited_T"], zfar=zfar)
            gains = coverage_gains(
                vv, sc["X_world"], sc["harmonics"], sc["occ"], sc["valid"],
                cams, sc["visited_X"], pred_cam, sc["box_diag"],
                sc["cell_resolution"], sensor_range, k_cov,
            )
            cov_loss = L.uncentered_l1(
                gains.reshape(1, -1, 1), sc["sup_gains"].reshape(1, -1, 1))
            return occ_loss + cov_loss, (occ_loss, cov_loss)

        def loss_fn(ps):
            losses, (occ_l, cov_l) = jax.vmap(
                lambda sc, k: scene_loss(ps, sc, k))(sb, keys)
            # Mean over the sharded scene axis == the reference's DDP
            # gradient allreduce (1 scene/GPU, scone_utils.py:82-87)
            return jnp.mean(losses), (jnp.mean(occ_l), jnp.mean(cov_l))

        ps = {"occ": occ_vars["params"], "vis": vis_vars["params"]}
        (loss, (occ_loss, cov_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ps)
        updates, opt_state = tx.update(grads, opt_state, ps)
        new = optax.apply_updates(ps, updates)
        return ({"params": new["occ"]}, {"params": new["vis"]}, opt_state,
                loss, occ_loss, cov_loss)

    return step
