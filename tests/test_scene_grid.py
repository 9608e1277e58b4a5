"""Fixed-shape voxel scene store: fill/dedup/eviction, coverage, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macarons_tpu.scene import grid as G


@pytest.fixture
def cfg():
    return G.make_grid_config(
        x_min=(-1, -1, -1), x_max=(1, 1, 1), grid_l=4, grid_w=4, grid_h=4,
        capacity=32, resolution=0.05, feature_dim=1,
    )


def test_config_heuristics():
    # capacity from resolution (reference Cell.__init__ area heuristic)
    c = G.make_grid_config((-1, -1, -1), (1, 1, 1), 2, 2, 2, resolution=0.1)
    assert c.capacity > 0
    c2 = G.make_grid_config((-1, -1, -1), (1, 1, 1), 2, 2, 2, capacity=100)
    assert c2.resolution > 0


def test_cell_index_and_bbox(cfg):
    pts = jnp.array([[-0.99, -0.99, -0.99], [0.99, 0.99, 0.99], [0, 0, 0],
                     [2.0, 0, 0]])
    cid = np.asarray(G.cell_index(cfg, pts))
    assert cid[0] == 0
    assert cid[1] == cfg.n_cells - 1
    inb = np.asarray(G.in_bounding_box(cfg, pts))
    np.testing.assert_array_equal(inb, [True, True, True, False])


def test_fill_and_dedup(cfg, rng):
    state = G.empty_grid(cfg)
    pts = jnp.array(rng.uniform(-1, 1, (500, 3)), jnp.float32)
    state = G.fill_cells(cfg, state, jax.random.PRNGKey(0), pts)
    n1 = int(state.valid.sum())
    assert 0 < n1 <= 500
    # Same points again: resolution dedup must reject all of them
    state2 = G.fill_cells(cfg, state, jax.random.PRNGKey(1), pts)
    assert int(state2.valid.sum()) == n1
    stored1, v1 = G.all_points(state)
    stored2, v2 = G.all_points(state2)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # Stored points all came from the input set
    s = np.asarray(stored1)[np.asarray(v1)]
    d = np.abs(s[:, None, :] - np.asarray(pts)[None]).sum(-1).min(1)
    assert d.max() < 1e-6


def test_resolution_dedup_within_fill(cfg):
    # Points closer than resolution to an existing point are rejected.
    state = G.empty_grid(cfg)
    p0 = jnp.array([[0.1, 0.1, 0.1]])
    state = G.fill_cells(cfg, state, jax.random.PRNGKey(0), p0)
    near = p0 + 0.01  # within resolution=0.05
    far = p0 + 0.2
    state = G.fill_cells(cfg, state, jax.random.PRNGKey(1),
                         jnp.concatenate([near, far]))
    assert int(state.valid.sum()) == 2  # p0 + far only


def test_capacity_eviction(cfg):
    # Flood one cell with >capacity well-separated points -> exactly capacity kept.
    small = G.make_grid_config((-1, -1, -1), (1, 1, 1), 1, 1, 1, capacity=16,
                               resolution=1e-4)
    state = G.empty_grid(small)
    pts = jnp.array(
        np.random.default_rng(0).uniform(-0.9, 0.9, (200, 3)), jnp.float32)
    state = G.fill_cells(small, state, jax.random.PRNGKey(0), pts)
    assert int(state.valid.sum()) == 16


def test_progressive_fill_denoises(cfg):
    # Progressive refill keeps fewer points than one-shot for clustered data.
    state = G.empty_grid(cfg)
    base = np.random.default_rng(1).uniform(-1, 1, (50, 3))
    cluster = base[None] + np.random.default_rng(2).normal(
        scale=0.004, size=(40, 50, 3))
    pts = jnp.array(cluster.reshape(-1, 3), jnp.float32)
    state = G.fill_cells_progressive(cfg, state, jax.random.PRNGKey(0), pts,
                                     chunk=100)
    n = int(state.valid.sum())
    # ~2000 noisy points collapse near the 50 cluster centers
    assert n < 300, n


def test_coverage_gain_counts_new_points(cfg):
    state = G.empty_grid(cfg)
    surf = jnp.array(
        np.random.default_rng(3).uniform(-0.9, 0.9, (300, 3)), jnp.float32)
    state = G.fill_cells(cfg, state, jax.random.PRNGKey(0), surf)
    n_stored = int(state.valid.sum())
    stored, valid = G.all_points(state)
    part = stored[jnp.asarray(np.where(np.asarray(valid))[0][:50])]
    mask = jnp.ones((50,), bool)
    gain1, state = G.camera_coverage_gain(cfg, state, part, mask,
                                          surface_epsilon=0.01)
    assert int(gain1) == 50
    # Same partial cloud again: zero NEW coverage
    gain2, state = G.camera_coverage_gain(cfg, state, part, mask,
                                          surface_epsilon=0.01)
    assert int(gain2) == 0


@pytest.mark.slow  # compiles the windowed coverage-gain program (~5 s on CPU)
def test_window_coverage_gains(cfg):
    """Reference supervision-gain semantics (train_macarons.py:449-470):
    window points pre-inserted with frame0=covered / rest=uncovered; each
    frame's gain counts uncovered stored points near ITS cloud with NO marking
    between frames; afterwards everything is covered."""
    state = G.empty_grid(cfg)
    rng = np.random.default_rng(6)
    # Pre-existing (covered) surface
    old = jnp.array(rng.uniform(-0.9, -0.5, (40, 3)), jnp.float32)
    state = G.fill_cells(cfg, state, jax.random.PRNGKey(0), old,
                         features=jnp.ones((40, 1)))
    n_old = int(state.valid.sum())
    # Window: frame 0 revisits the old region (covered, expect gain 0);
    # frames 1 and 2 see the SAME new region (both count it: no intra-window
    # marking).
    new = jnp.array(rng.uniform(0.5, 0.9, (30, 3)), jnp.float32)
    state = G.fill_cells(cfg, state, jax.random.PRNGKey(1), new,
                         features=jnp.zeros((30, 1)))
    n_new = int(state.valid.sum()) - n_old
    pcs = jnp.stack([old[:30], new, new])
    masks = jnp.ones((3, 30), bool)
    gains, state = G.window_coverage_gains(cfg, state, pcs, masks,
                                           surface_epsilon=0.01)
    gains = np.asarray(gains)
    assert gains[0] == 0.0  # frame 0 = previous pose, already covered
    assert gains[1] == n_new and gains[2] == n_new  # no marking between frames
    # set_all_features_to_value(1.): everything covered afterwards
    assert float(state.features[..., 0].min()) == 1.0
    gains2, _ = G.window_coverage_gains(cfg, state, pcs, masks,
                                        surface_epsilon=0.01)
    assert np.all(np.asarray(gains2) == 0.0)


def test_scene_coverage_metric(cfg):
    gt = G.empty_grid(cfg)
    pts = jnp.array(
        np.random.default_rng(4).uniform(-0.9, 0.9, (400, 3)), jnp.float32)
    gt = G.fill_cells(cfg, gt, jax.random.PRNGKey(0), pts)
    # Recovered == GT -> coverage 1
    cov, n = G.scene_coverage(cfg, gt, gt)
    assert float(cov) == 1.0 and int(n) == int(gt.valid.sum())
    # Empty recovered -> coverage 0
    cov0, _ = G.scene_coverage(cfg, gt, G.empty_grid(cfg))
    assert float(cov0) == 0.0
    # Recovered shifted by more than epsilon -> low coverage
    rec = G.empty_grid(cfg)
    rec = G.fill_cells(cfg, rec, jax.random.PRNGKey(1), pts + 0.5)
    cov_shift, _ = G.scene_coverage(cfg, gt, rec, surface_epsilon=0.05)
    assert float(cov_shift) < 0.2


def test_fill_respects_mask(cfg):
    state = G.empty_grid(cfg)
    pts = jnp.array(np.random.default_rng(5).uniform(-1, 1, (100, 3)), jnp.float32)
    mask = jnp.arange(100) < 10
    state = G.fill_cells(cfg, state, jax.random.PRNGKey(0), pts, pts_mask=mask)
    assert int(state.valid.sum()) <= 10
