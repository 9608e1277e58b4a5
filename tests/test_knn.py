import numpy as np
import jax.numpy as jnp

from macarons_tpu.ops import knn


def test_knn_matches_numpy_bruteforce(rng):
    x = rng.normal(size=(2, 50, 3)).astype(np.float32)
    pc = rng.normal(size=(2, 200, 3)).astype(np.float32)
    gathered, dists, idx = knn.knn_points(jnp.array(x), jnp.array(pc), k=8)
    for b in range(2):
        d = np.linalg.norm(x[b][:, None, :] - pc[b][None, :, :], axis=-1)
        ref_idx = np.argsort(d, axis=-1)[:, :8]
        ref_d = np.take_along_axis(d, ref_idx, axis=-1)
        np.testing.assert_allclose(np.asarray(dists)[b], ref_d, atol=1e-4)
        # indices can differ on ties; check gathered point distances instead
        g = np.asarray(gathered)[b]
        gd = np.linalg.norm(g - x[b][:, None, :], axis=-1)
        np.testing.assert_allclose(gd, ref_d, atol=1e-4)


def test_cdist_matches_torch(rng):
    import torch

    x = rng.normal(size=(3, 20, 3)).astype(np.float32)
    y = rng.normal(size=(3, 30, 3)).astype(np.float32)
    ours = np.asarray(knn.cdist(jnp.array(x), jnp.array(y)))
    ref = torch.cdist(torch.tensor(x), torch.tensor(y)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_knn_masked_excludes_padding(rng):
    pc = rng.normal(size=(1, 64, 3)).astype(np.float32)
    pc_mask = np.zeros((1, 64), bool)
    pc_mask[:, :10] = True  # only first 10 are real
    x = rng.normal(size=(1, 5, 3)).astype(np.float32)
    gathered, dists, idx, valid = knn.knn_points_masked(
        jnp.array(x), jnp.array(pc), k=4, pc_mask=jnp.array(pc_mask)
    )
    assert np.all(np.asarray(idx) < 10)
    assert np.all(np.asarray(valid))
    # Ask for more neighbors than valid points -> invalid flags appear
    _, _, idx2, valid2 = knn.knn_points_masked(
        jnp.array(x), jnp.array(pc), k=16, pc_mask=jnp.array(pc_mask)
    )
    assert np.asarray(valid2).sum(axis=-1).max() == 10
