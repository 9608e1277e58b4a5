"""Golden tests for real spherical harmonics vs scipy (independent reference)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import sph_harm_y

from macarons_tpu.ops.harmonics import (
    real_spherical_harmonics,
    harmonics_from_directions,
)


def scipy_real_sh(l, m, theta, phi):
    """Real tesseral SH with Condon-Shortley phase, from scipy's complex SH.

    scipy sph_harm_y(l, m, theta, phi) = N P_l^m(cos theta) e^{i m phi} with CS phase.
    Real form used by the reference keeps CS phase inside P_l^m:
      m > 0: sqrt(2) Re(Y_l^m);  m < 0: sqrt(2) Im(Y_l^{|m|});  m = 0: Y_l^0.
    """
    if m == 0:
        return np.real(sph_harm_y(l, 0, theta, phi))
    if m > 0:
        return np.sqrt(2.0) * np.real(sph_harm_y(l, m, theta, phi))
    return np.sqrt(2.0) * np.imag(sph_harm_y(l, -m, theta, phi))


def test_matches_scipy_all_lm(rng):
    theta = rng.uniform(0.01, np.pi - 0.01, size=200)
    phi = rng.uniform(-np.pi, np.pi, size=200)
    ours = np.asarray(real_spherical_harmonics(jnp.array(theta), jnp.array(phi), degree=8))
    idx = 0
    for l in range(8):
        for m in range(-l, l + 1):
            ref = scipy_real_sh(l, m, theta, phi)
            np.testing.assert_allclose(
                ours[:, idx], ref, rtol=2e-4, atol=2e-5,
                err_msg=f"mismatch at l={l}, m={m}",
            )
            idx += 1
    assert idx == 64


def test_orthonormality_l2():
    # Monte-Carlo check that the 64 harmonics are orthonormal on the sphere.
    n = 200_000
    rs = np.random.default_rng(1)
    u = rs.uniform(-1, 1, n)
    theta = np.arccos(u)
    phi = rs.uniform(-np.pi, np.pi, n)
    Y = np.asarray(real_spherical_harmonics(jnp.array(theta), jnp.array(phi), degree=8))
    gram = (Y.T @ Y) * (4 * np.pi / n)
    np.testing.assert_allclose(gram, np.eye(64), atol=0.05)


def test_harmonics_from_directions_poles():
    # A ray along +y has elev=pi/2 -> theta=0 (north pole): only m=0 terms nonzero.
    rays = jnp.array([[0.0, 1.0, 0.0]])
    Y = np.asarray(harmonics_from_directions(rays, degree=8))[0]
    idx = 0
    for l in range(8):
        for m in range(-l, l + 1):
            if m != 0:
                assert abs(Y[idx]) < 1e-5, (l, m, Y[idx])
            idx += 1
    # Y_00 = 1/sqrt(4 pi)
    np.testing.assert_allclose(Y[0], 1.0 / np.sqrt(4 * np.pi), rtol=1e-5)


def test_jit_grad_safe():
    import jax

    def f(theta):
        return real_spherical_harmonics(theta, jnp.ones_like(theta), degree=8).sum()

    g = jax.grad(f)(jnp.array([0.3, 1.2]))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow  # compiles both SH formulations + grad (~8 s on CPU)
def test_sh_weighted_sum_matches_materialized():
    """sh_weighted_sum == einsum over the materialized basis (identical math,
    different accumulation; verified to 5.7e-13 in f64 — in f32 the
    accumulation path is ~100x CLOSER to the f64 truth because it skips the
    arctan2 -> sin/cos roundtrip). Degenerate rays stay finite, and it is
    grad-safe (it feeds the NBV scorer which differentiates in pretraining)."""
    import jax
    from macarons_tpu.ops.harmonics import sh_weighted_sum

    k = jax.random.PRNGKey(0)
    rays = jax.random.normal(k, (2, 5, 129, 3))
    coeffs = jax.random.normal(jax.random.PRNGKey(1), (2, 129, 64)) * 0.3
    Y = harmonics_from_directions(rays)
    ref = jnp.einsum("bclk,blk->bcl", Y, coeffs)
    out = sh_weighted_sum(rays, coeffs[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)

    rz = jnp.zeros((1, 1, 3, 3)).at[0, 0, 1, 1].set(1.0) \
        .at[0, 0, 2, 2].set(1e-12)
    o2 = sh_weighted_sum(rz, jnp.ones((1, 1, 3, 64)))
    assert np.isfinite(np.asarray(o2)).all()

    g = jax.grad(lambda c: jnp.sum(sh_weighted_sum(rays, c)))(coeffs[:, None])
    assert np.isfinite(np.asarray(g)).all()
