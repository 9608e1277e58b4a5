"""SconeVis pretrainer: GT gains, greedy sequences, fixed-batch convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macarons_tpu.config import Params
from macarons_tpu.trainers import pretrain_occ, pretrain_vis
from macarons_tpu.data import datasets as D
from test_pretrain_occ import SMALL

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier

VIS_SMALL = dict(
    SMALL,
    n_proxy_points=256, min_occ_for_proxy_points=0.0,
    use_occ_to_sample_proxy_points=True, true_monte_carlo_sampling=True,
    filter_tol=0.01, occ_no_view_harmonics=False, use_sigmoid=True,
    training_loss="uncentered_l1", scone_vis_model_name="test_vis",
)


def test_gt_coverage_gain_properties(rng):
    cov = jnp.array(rng.integers(0, 2, (10, 64)), jnp.float32)
    view_idx = jnp.array([2, 0], jnp.int32)
    view_mask = jnp.array([True, False])
    g = np.asarray(pretrain_vis.gt_coverage_gain(cov, view_idx, view_mask))
    assert g.shape == (10,)
    # Already-visited camera (2) has zero gain; all gains >= 0
    assert abs(g[2]) < 1e-6
    assert np.all(g >= -1e-6)
    # Manual check for camera 5
    prev = np.asarray(cov)[2] > 0
    expect = ((prev | (np.asarray(cov)[5] > 0)).mean() - prev.mean())
    np.testing.assert_allclose(g[5], expect, atol=1e-6)


def test_greedy_optimal_sequences(rng):
    cov = np.array(rng.integers(0, 2, (6, 40)), np.float32)
    seq = pretrain_vis.greedy_optimal_sequences(cov, 3)
    assert len(set(seq.tolist())) == 3
    # First element is the single best camera
    assert seq[0] == np.argmax((cov > 0).mean(axis=1))


def test_vis_step_converges_on_fixed_batch(shapenet_root):  # noqa: F811
    params = Params(dict(VIS_SMALL, data_path=shapenet_root, learning_rate=3e-3))
    occ_model = pretrain_occ.build_model(params)
    rng = jax.random.PRNGKey(0)
    L = params.n_view_max * params.seq_len
    occ_vars = occ_model.init(
        rng, jnp.zeros((1, L, 3)), jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 64))
    )
    vis_model = pretrain_vis.build_vis_model(params)
    vis_vars = vis_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, params.seq_len, 4)),
        jnp.zeros((1, params.seq_len, 64)),
    )
    import optax
    from flax.training import train_state

    state = pretrain_vis.TrainState.create(
        apply_fn=vis_model.apply, params=vis_vars["params"],
        tx=optax.adamw(3e-3),
    )
    X_cam, _, _ = pretrain_occ.candidate_camera_poses(params)
    rs = np.random.default_rng(0)
    train, _, _ = D.get_shapenet_datasets(shapenet_root)
    batch = pretrain_vis.assemble_vis_batch(rs, train.paths[:2], np.asarray(X_cam),
                                            params)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    step = pretrain_vis.make_vis_step(params, occ_model, vis_model, occ_vars,
                                      train=True)
    losses = []
    for _ in range(8):
        state, loss, pred, truth = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert pred.shape == (2, 52)
    assert losses[-1] < losses[0], losses


def test_nbv_metric(rng):
    cov = np.array(rng.integers(0, 2, (5, 30)), np.float32)
    pred = np.array([0.1, 0.9, 0.2, 0.0, 0.3])
    view_idx = np.array([0, 0])
    view_mask = np.array([True, False])
    m = pretrain_vis.nbv_metric(pred, cov, view_idx, view_mask)
    prev = cov[0] > 0
    expect = ((prev | (cov[1] > 0)).mean() - prev.mean())
    np.testing.assert_allclose(m, expect, atol=1e-6)
