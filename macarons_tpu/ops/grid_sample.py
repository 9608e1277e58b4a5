"""Bilinear grid sampling — replaces torch.nn.functional.grid_sample (cuDNN).

Used by the cost-volume warp (reference ManyDepth.py:196-200), the photometric
reconstruction loss (depth_model_utils.py:632-640), and signed-distance-to-depth-map
carving (macarons_utils.py:2493-2498). Semantics match torch's
``grid_sample(mode='bilinear'|'nearest', padding_mode='border'|'zeros',
align_corners=False)``: grids are in [-1, 1], unnormalized as ((g+1)*S - 1)/2.

Implementation is pure gather + fused elementwise math — XLA lowers the gathers
efficiently; layout is NHWC (TPU-native).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(image, grid, mode: str = "bilinear", padding_mode: str = "border",
                align_corners: bool = False):
    """Sample `image` (N, H, W, C) at `grid` (N, Hg, Wg, 2) -> (N, Hg, Wg, C).

    grid[..., 0] is the x (width) coordinate, grid[..., 1] the y (height)
    coordinate, both in [-1, 1] (torch convention).
    """
    N, H, W, C = image.shape
    gx = _unnormalize(grid[..., 0], W, align_corners)
    gy = _unnormalize(grid[..., 1], H, align_corners)

    if padding_mode == "border":
        gx = jnp.clip(gx, 0.0, W - 1.0)
        gy = jnp.clip(gy, 0.0, H - 1.0)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        out = _gather2d(image, iyc, ixc)
        if padding_mode == "zeros":
            out = jnp.where(valid[..., None], out, 0.0)
        return out
    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode!r}")

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    def corner(yf, xf, wy, wx):
        ix = xf.astype(jnp.int32)
        iy = yf.astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            w = jnp.where(valid, wy * wx, 0.0)
        else:
            w = wy * wx
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        return _gather2d(image, iyc, ixc) * w[..., None]

    return (
        corner(y0, x0, wy0, wx0)
        + corner(y0, x1, wy0, wx1)
        + corner(y1, x0, wy1, wx0)
        + corner(y1, x1, wy1, wx1)
    )


def _gather2d(image, iy, ix):
    """image (N, H, W, C); iy/ix (N, Hg, Wg) -> (N, Hg, Wg, C)."""
    N, H, W, C = image.shape
    flat = image.reshape(N, H * W, C)
    lin = (iy * W + ix).reshape(N, -1)  # (N, Hg*Wg)
    out = jnp.take_along_axis(flat, lin[..., None], axis=1)
    return out.reshape(*iy.shape, C)


def sample_points_bilinear(image, xy, padding_mode: str = "border",
                           align_corners: bool = False):
    """Sample `image` (N, H, W, C) at per-point coords xy (N, P, 2) -> (N, P, C).

    Convenience wrapper matching the reference pattern of reshaping point
    projections to a (N, P, 1, 2) grid (macarons_utils.py:2489-2498).
    """
    out = grid_sample(image, xy[:, :, None, :], padding_mode=padding_mode,
                      align_corners=align_corners)
    return out[:, :, 0, :]
