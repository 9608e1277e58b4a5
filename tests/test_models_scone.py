"""Tests for the SCONE transformer stack: shapes, masking, fused NBV evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macarons_tpu.models.attention import PCTransformer
from macarons_tpu.models.scone import (
    SconeOcc,
    SconeVis,
    compute_coverage_gain,
    compute_coverage_gain_multiple,
    compute_visibilities,
)
from macarons_tpu.models import losses
from macarons_tpu.ops.harmonics import harmonics_from_directions


@pytest.fixture(scope="module")
def small_occ():
    model = SconeOcc(seq_len=64, n_code=1, n_heads=2, n_scale=3, k_for_knn=8,
                     pts_embedding_dim=32, global_feature_dim=64,
                     local_feature_dim=32, x_embedding_dim=64)
    pc = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 3))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 3))
    vh = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 64))
    params = model.init(jax.random.PRNGKey(3), pc, x, vh)
    return model, params, pc, x, vh


@pytest.mark.slow  # module fixture compiles the full SconeOcc
def test_scone_occ_shapes(small_occ):
    model, params, pc, x, vh = small_occ
    out = model.apply(params, pc, x, vh, key=jax.random.PRNGKey(4))
    assert out.shape == (2, 24, 1)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow  # uses the SconeOcc fixture
def test_scone_occ_deterministic_without_key(small_occ):
    model, params, pc, x, vh = small_occ
    o1 = model.apply(params, pc, x, vh)
    o2 = model.apply(params, pc, x, vh)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


@pytest.mark.slow  # jit+grad compile of the full SconeOcc
def test_scone_occ_jit_grad(small_occ):
    model, params, pc, x, vh = small_occ

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, pc, x, vh)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


@pytest.mark.slow  # compiles the full SconeVis
def test_scone_vis_shapes():
    model = SconeVis(pts_embedding_dim=64, n_code=1, n_heads=2)
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, 100, 4))
    vh = jax.random.normal(jax.random.PRNGKey(1), (2, 100, 64))
    params = model.init(jax.random.PRNGKey(2), pts, vh)
    out = model.apply(params, pts, vh)
    assert out.shape == (2, 100, 64)


@pytest.mark.slow  # compiles two full PcTransformer variants (~10 s on CPU)
def test_pctransformer_mask_invariance(rng):
    """Padding points must not change the pooled feature when masked out."""
    model = PCTransformer(pts_embedding_dim=32, feature_dim=64, n_code=1, n_heads=2)
    real = jnp.array(rng.normal(size=(1, 20, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), real)
    pad_a = jnp.concatenate([real, jnp.zeros((1, 12, 3))], axis=1)
    pad_b = jnp.concatenate([real, 100.0 * jnp.ones((1, 12, 3))], axis=1)
    mask = jnp.array([[True] * 20 + [False] * 12])
    fa = model.apply(params, pad_a, pts_mask=mask)
    fb = model.apply(params, pad_b, pts_mask=mask)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)


def _naive_coverage_gain(pts, harmonics, X_cam, use_sigmoid=True):
    """Per-candidate loop reference implementation (independent of the fused path)."""
    B, L = pts.shape[0], pts.shape[1]
    C = X_cam.shape[1]
    out = np.zeros((B, C), np.float32)
    for b in range(B):
        for c in range(C):
            rays = np.asarray(X_cam)[b, c][None] - np.asarray(pts)[b, :, :3]
            Y = np.asarray(harmonics_from_directions(jnp.array(rays), degree=8))
            z = np.sum(Y * np.asarray(harmonics)[b], axis=-1)
            v = 1 / (1 + np.exp(-z)) if use_sigmoid else np.maximum(z, 0)
            out[b, c] = v.sum() / L
    return out


def test_fused_coverage_gain_matches_naive(rng):
    pts = jnp.array(rng.normal(size=(2, 50, 4)), jnp.float32)
    harm = jnp.array(rng.normal(size=(2, 50, 64)) * 0.3, jnp.float32)
    X_cam = jnp.array(rng.normal(size=(2, 7, 3)) * 4, jnp.float32)
    fused = np.asarray(compute_coverage_gain(pts, harm, X_cam))
    naive = _naive_coverage_gain(pts, harm, X_cam)
    np.testing.assert_allclose(fused, naive, atol=1e-4)


def test_coverage_gain_multiple_diagonal(rng):
    pts = jnp.array(rng.normal(size=(1, 30, 4)), jnp.float32)
    harm = jnp.array(rng.normal(size=(1, 30, 64)) * 0.3, jnp.float32)
    X_cam = jnp.array(rng.normal(size=(1, 4, 3)) * 4, jnp.float32)
    single = np.asarray(compute_coverage_gain(pts, harm, X_cam))
    multi, idx = compute_coverage_gain_multiple(pts, harm, X_cam, n_cam=2)
    multi, idx = np.asarray(multi), np.asarray(idx)
    # Pairs (c, c) reduce to the single-camera gain
    for c in range(4):
        j = np.where((idx[:, 0] == c) & (idx[:, 1] == c))[0][0]
        np.testing.assert_allclose(multi[0, j], single[0, c], atol=1e-5)
    # Joint gain >= max of individual gains
    for j in range(idx.shape[0]):
        c0, c1 = idx[j]
        assert multi[0, j] >= max(single[0, c0], single[0, c1]) - 1e-5


def test_masked_coverage_gain(rng):
    pts = jnp.array(rng.normal(size=(1, 40, 4)), jnp.float32)
    harm = jnp.array(rng.normal(size=(1, 40, 64)) * 0.3, jnp.float32)
    X_cam = jnp.array(rng.normal(size=(1, 3, 3)) * 4, jnp.float32)
    mask = jnp.array([[True] * 25 + [False] * 15])
    g = np.asarray(compute_coverage_gain(pts, harm, X_cam, pts_mask=mask))
    # Equals zeroing the padded points' visibilities
    vis = np.asarray(compute_visibilities(pts, harm, X_cam))
    expect = (vis * np.asarray(mask)[:, None, :]).sum(-1) / 40
    np.testing.assert_allclose(g, expect, atol=1e-6)


def test_losses_match_torch(rng):
    import torch

    x = rng.normal(size=(3, 10, 1)).astype(np.float32) * 0.5 + 1.0
    y = rng.normal(size=(3, 10, 1)).astype(np.float32) * 0.5 + 1.0
    ours = float(losses.uncentered_l1(jnp.array(x), jnp.array(y)))
    xt, yt = torch.tensor(x), torch.tensor(y)
    xm = xt.mean(dim=1, keepdim=True)
    ym = yt.mean(dim=1, keepdim=True)
    ref = ((xt / (xm + 1e-7) - yt / (ym + 1e-7)).abs().mean(dim=1)).mean().item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    ours_l1 = float(losses.l1_normalized(jnp.array(x), jnp.array(y)))
    xs = xt.std(dim=1, keepdim=True)
    ys = yt.std(dim=1, keepdim=True)
    ref_l1 = (
        (((xt - xm) / (xs + 1e-7) - (yt - ym) / (ys + 1e-7)).abs().mean(dim=1))
        .mean().item()
    )
    np.testing.assert_allclose(ours_l1, ref_l1, rtol=1e-5)

    ours_kl = float(losses.kl_div_ce(jnp.array(x), jnp.array(y)))
    kl = torch.nn.KLDivLoss(reduction="batchmean")(
        torch.log_softmax(xt, dim=1), torch.softmax(yt, dim=1)
    ).item()
    np.testing.assert_allclose(ours_kl, kl, rtol=1e-4, atol=1e-6)
