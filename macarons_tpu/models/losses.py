"""Loss functions for the SCONE/MACARONS training objectives.

Rebuilds reference SconeVis.py:306-378 losses and the occupancy MSE as pure jax
functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def kl_div_ce(x, y):
    """KL divergence after softmax over the camera axis (reference SconeVis.py:306-319).

    x, y: (batch, n_camera, 1) predicted / target coverage distributions.
    Matches torch KLDivLoss(reduction='batchmean')(log_softmax(x), softmax(y)).
    """
    log_px = jax.nn.log_softmax(x, axis=1)
    py = jax.nn.softmax(y, axis=1)
    log_py = jax.nn.log_softmax(y, axis=1)
    kl = jnp.sum(py * (log_py - log_px), axis=1)
    return jnp.mean(jnp.sum(kl, axis=-1))


def l1_normalized(x, y):
    """L1 between mean/std-normalized coverage distributions (SconeVis.py:322-350)."""
    x_mean = jnp.mean(x, axis=1, keepdims=True)
    y_mean = jnp.mean(y, axis=1, keepdims=True)
    x_std = jnp.std(x, axis=1, keepdims=True, ddof=1)
    y_std = jnp.std(y, axis=1, keepdims=True, ddof=1)
    nx = (x - x_mean) / (x_std + EPS)
    ny = (y - y_mean) / (y_std + EPS)
    return jnp.mean(jnp.mean(jnp.abs(nx - ny), axis=1))


def uncentered_l1(x, y):
    """L1 between mean-normalized (uncentered) distributions (SconeVis.py:353-378).

    The MACARONS/SCONE coverage-gain training loss."""
    x_mean = jnp.mean(x, axis=1, keepdims=True)
    y_mean = jnp.mean(y, axis=1, keepdims=True)
    nx = x / (x_mean + EPS)
    ny = y / (y_mean + EPS)
    return jnp.mean(jnp.mean(jnp.abs(nx - ny), axis=1))


def occupancy_mse(pred, target, mask=None):
    """MSE over query points (reference pretrain_scone_occ.py:116-123), mask-aware."""
    err = (pred - target) ** 2
    if mask is None:
        return jnp.mean(err)
    err = jnp.where(mask[..., None] if mask.ndim == err.ndim - 1 else mask, err, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(err) / (denom * err.shape[-1])
