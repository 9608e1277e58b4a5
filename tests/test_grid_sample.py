"""Golden tests vs torch.nn.functional.grid_sample (CPU torch available)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from macarons_tpu.ops.grid_sample import grid_sample, sample_points_bilinear


def _compare(rng, mode, padding_mode, align_corners, H=7, W=11, C=3, N=2,
             grid_shape=(5, 6), scale=1.4):
    img = rng.normal(size=(N, H, W, C)).astype(np.float32)
    grid = (rng.uniform(-1, 1, (N, *grid_shape, 2)) * scale).astype(np.float32)
    ours = np.asarray(
        grid_sample(jnp.array(img), jnp.array(grid), mode=mode,
                    padding_mode=padding_mode, align_corners=align_corners)
    )
    ref = F.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2),
        torch.tensor(grid),
        mode=mode, padding_mode=padding_mode, align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_border(rng):
    _compare(rng, "bilinear", "border", False)


def test_bilinear_border_align(rng):
    _compare(rng, "bilinear", "border", True)


def test_bilinear_zeros(rng):
    _compare(rng, "bilinear", "zeros", False)


def test_nearest_border(rng):
    # Avoid exact .5 boundaries where torch/np rounding differ
    _compare(rng, "nearest", "border", False, scale=1.37)


def test_point_sampler(rng):
    img = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    xy = rng.uniform(-0.9, 0.9, (2, 17, 2)).astype(np.float32)
    ours = np.asarray(sample_points_bilinear(jnp.array(img), jnp.array(xy)))
    ref = F.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2),
        torch.tensor(xy).view(2, 17, 1, 2),
        mode="bilinear", padding_mode="border", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()[:, :, 0, :]
    np.testing.assert_allclose(ours, ref, atol=1e-5)
