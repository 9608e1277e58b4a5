"""End-to-end SconeOcc pretraining smoke test on synthetic GT over the 8-device
CPU mesh: loss must decrease, checkpoints must round-trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macarons_tpu.config import Params
from macarons_tpu.data import shapenet as sng
from macarons_tpu.trainers import pretrain_occ
from test_rasterizer import cube_mesh

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


SMALL = dict(
    seq_len=32, n_sample=24, n_view_min=1, n_view_max=2,
    view_state_n_elev=7, view_state_n_azim=14, harmonic_degree=8,
    camera_dist=1.5, pole_cameras=True, n_camera_elev=5, n_camera_azim=10,
    n_camera=52, gt_max_diagonal=1.0, prediction_in_random_camera_space=False,
    batch_size=1, epochs=2, learning_rate=1e-3, warmup=5,
    schedule_learning_rate=False, start_from_scratch=True,
    random_seed=42, torch_seed=5, scone_occ_model_name="test_occ",
    no_view_harmonics=False, no_local_features=False,
)


def test_pretrain_occ_runs_and_checkpoints(shapenet_root, tmp_path):
    params = Params(dict(SMALL, data_path=shapenet_root))
    state, train_losses, val_losses = pretrain_occ.run_training(
        params, weights_dir=str(tmp_path / "w"), verbose=False,
    )
    assert len(train_losses) == 2 and len(val_losses) == 2
    assert np.isfinite(train_losses).all() and np.isfinite(val_losses).all()
    # Checkpoints written
    assert os.path.exists(tmp_path / "w" / "unvalidated_test_occ.msgpack")
    assert os.path.exists(tmp_path / "w" / "best_unval_test_occ.msgpack")


def test_occ_step_converges_on_fixed_batch(shapenet_root):
    """The jit step must reliably reduce loss on a repeated batch."""
    from macarons_tpu.data import datasets as D
    from macarons_tpu.ops.view_state import get_cameras_on_sphere

    params = Params(dict(SMALL, data_path=shapenet_root, learning_rate=3e-3))
    model = pretrain_occ.build_model(params)
    rng = jax.random.PRNGKey(0)
    state = pretrain_occ.create_train_state(params, model, rng)
    X_cam, _, _ = pretrain_occ.candidate_camera_poses(params)
    rs = np.random.default_rng(0)
    train, _, _ = D.get_shapenet_datasets(shapenet_root)
    batch = D.assemble_occ_batch(rs, train.paths[:2], np.asarray(X_cam), 1, 2,
                                 params.seq_len, params.n_sample)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    step = pretrain_occ.make_train_step(params, model, train=True)
    losses = []
    for i in range(8):
        state, loss = step(state, batch, jax.random.PRNGKey(100))  # fixed key
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_pretrain_occ_resume(shapenet_root, tmp_path):
    params = Params(dict(SMALL, data_path=shapenet_root, epochs=1))
    pretrain_occ.run_training(params, weights_dir=str(tmp_path / "w"), verbose=False)
    params2 = Params(dict(SMALL, data_path=shapenet_root, epochs=2,
                          start_from_scratch=False))
    _, train_losses, _ = pretrain_occ.run_training(
        params2, weights_dir=str(tmp_path / "w"), verbose=False,
    )
    # Resumed from epoch 1: only one new epoch, meta carried over
    meta = json.load(open(tmp_path / "w" / "unvalidated_test_occ.json"))
    assert meta["epoch"] == 1
    assert len(meta["train_losses"]) == 2


def test_batch_is_sharded_over_mesh(shapenet_root):
    from macarons_tpu.parallel.mesh import make_mesh, shard_batch
    from macarons_tpu.data import datasets as D
    from macarons_tpu.ops.view_state import get_cameras_on_sphere

    mesh = make_mesh()
    assert mesh.devices.size == 8
    X_cam, _, _, _ = get_cameras_on_sphere(5, 10, 1.5, pole_cameras=True)
    rs = np.random.default_rng(0)
    train, _, _ = D.get_shapenet_datasets(shapenet_root)
    batch = D.assemble_occ_batch(rs, train.paths, np.asarray(X_cam),
                                 1, 2, 32, 24)
    sharded = shard_batch(batch, mesh)
    assert len(sharded["pc"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sharded["pc"]), batch["pc"])
