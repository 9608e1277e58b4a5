"""Golden tests for real spherical harmonics vs scipy (independent reference)."""

import numpy as np
import jax.numpy as jnp
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
