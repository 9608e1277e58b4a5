"""Pallas SH visibility kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from macarons_tpu.models.scone import compute_visibilities
from macarons_tpu.ops.pallas.sh_visibility import pallas_compute_visibilities


def test_pallas_matches_xla(rng):
    L, C = 300, 10  # non-multiples exercise padding
    pts = jnp.array(rng.normal(size=(L, 4)) * 0.4, jnp.float32)
    harm = jnp.array(rng.normal(size=(L, 64)) * 0.3, jnp.float32)
    X_cam = jnp.array(rng.normal(size=(C, 3)) * 2.0, jnp.float32)
    ref = np.asarray(compute_visibilities(pts[None], harm[None], X_cam[None]))[0]
    ours = np.asarray(pallas_compute_visibilities(
        pts, harm, X_cam, interpret=True, l_blk=128))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_pallas_relu_mode(rng):
    L, C = 128, 8
    pts = jnp.array(rng.normal(size=(L, 3)), jnp.float32)
    harm = jnp.array(rng.normal(size=(L, 64)) * 0.3, jnp.float32)
    X_cam = jnp.array(rng.normal(size=(C, 3)) * 2.0, jnp.float32)
    ref = np.asarray(compute_visibilities(pts[None], harm[None], X_cam[None],
                                          use_sigmoid=False))[0]
    ours = np.asarray(pallas_compute_visibilities(
        pts, harm, X_cam, use_sigmoid=False, interpret=True, l_blk=128))
    np.testing.assert_allclose(ours, ref, atol=2e-4)
