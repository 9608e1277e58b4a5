"""Real (tesseral) spherical harmonics, closed-form and fully vectorized.

TPU-first replacement for the reference's recursive, globally-memoized Legendre
evaluation (reference: macarons/utility/spherical_harmonics.py:12-156, which needs a
per-batch cache clear). Here the associated-Legendre recurrence is unrolled at trace
time over the static (l, m) index set, producing one fused elementwise computation —
no cache, no host control flow, safe under jit/vmap/grad.

Conventions match the reference (lucidrains-derived):
  - Condon-Shortley phase included in P_l^m.
  - Y_{l,0}   = N_l P_l^0(cos theta)
  - Y_{l,m>0} = N_l sqrt(2 (l-m)!/(l+m)!) cos(m phi) P_l^m(cos theta)
  - Y_{l,m<0} = N_l sqrt(2 (l-|m|)!/(l+|m|)!) sin(|m| phi) P_l^|m|(cos theta)
  with N_l = sqrt((2l+1)/(4 pi)); theta = polar angle, phi = azimuth.

Harmonics are packed in the reference's order: for l = 0..degree-1, m = -l..l,
giving degree**2 coefficients (64 for degree 8).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def _assoc_legendre_all(ct, st, max_l: int, xp=jnp):
    """All P_l^m(cos theta) for 0 <= m <= l < max_l, Condon-Shortley included.

    ct = cos(theta), st = sin(theta) >= 0 (theta in [0, pi]).
    Returns dict {(l, m): array} — static Python dict built at trace time.
    `xp` selects the array backend (jnp, or np for host-side constant tables).
    """
    P = {}
    P[(0, 0)] = xp.ones_like(ct)
    for m in range(1, max_l):
        # P_m^m = (-1)^m (2m-1)!! (sin theta)^m
        P[(m, m)] = ((-1.0) ** m) * _double_factorial(2 * m - 1) * (st ** m)
    for m in range(0, max_l - 1):
        # P_{m+1}^m = (2m+1) x P_m^m
        P[(m + 1, m)] = (2 * m + 1) * ct * P[(m, m)]
    for m in range(0, max_l):
        for l in range(m + 2, max_l):
            # (l-m) P_l^m = (2l-1) x P_{l-1}^m - (l+m-1) P_{l-2}^m
            P[(l, m)] = (
                (2 * l - 1) * ct * P[(l - 1, m)] - (l + m - 1) * P[(l - 2, m)]
            ) / (l - m)
    return P


@partial(jax.jit, static_argnames=("degree",))
def real_spherical_harmonics(theta, phi, degree: int = 8):
    """Evaluate all real SH with l < degree at (theta, phi).

    Args:
      theta: polar angle array (...,). NOT elevation — theta = pi/2 - elev.
      phi: azimuth array (...,).
      degree: number of bands; output has degree**2 channels.
    Returns: (..., degree**2) array, packed l-major, m from -l to l.
    """
    theta = jnp.asarray(theta)
    phi = jnp.asarray(phi)
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    P = _assoc_legendre_all(ct, st, degree)

    # Precompute cos(m phi), sin(m phi) via static unroll (cheap, fused by XLA).
    cos_m = {m: jnp.cos(m * phi) for m in range(1, degree)}
    sin_m = {m: jnp.sin(m * phi) for m in range(1, degree)}

    outs = []
    for l in range(degree):
        N = math.sqrt((2 * l + 1) / (4 * math.pi))
        for m in range(-l, l + 1):
            m_abs = abs(m)
            if m == 0:
                outs.append(N * P[(l, 0)])
            else:
                # sqrt(2 (l-|m|)! / (l+|m|)!)
                ratio = math.sqrt(
                    2.0 * math.factorial(l - m_abs) / math.factorial(l + m_abs)
                )
                ang = cos_m[m_abs] if m > 0 else sin_m[m_abs]
                outs.append(N * ratio * ang * P[(l, m_abs)])
    return jnp.stack(outs, axis=-1)


def real_spherical_harmonics_np(theta, phi, degree: int = 8):
    """Host-side numpy twin of real_spherical_harmonics (identical math).

    Used to build CONSTANT basis tables (e.g. the view-state harmonics grid).
    Keeping such constants as host numpy matters: closing a jitted function
    over a committed *device* array constant degrades the runtime's async
    dispatch (measured: an einsum whose weights derive from a captured device
    array flips all subsequent scan executions to a ~84 ms sync floor on the
    tunneled TPU runtime, while numpy-literal captures stay at ~0.2 ms)."""
    import numpy as np

    theta = np.asarray(theta, np.float64)
    phi = np.asarray(phi, np.float64)
    ct = np.cos(theta)
    st = np.sin(theta)
    P = _assoc_legendre_all(ct, st, degree, xp=np)
    cos_m = {m: np.cos(m * phi) for m in range(1, degree)}
    sin_m = {m: np.sin(m * phi) for m in range(1, degree)}
    outs = []
    for l in range(degree):
        N = math.sqrt((2 * l + 1) / (4 * math.pi))
        for m in range(-l, l + 1):
            m_abs = abs(m)
            if m == 0:
                outs.append(N * P[(l, 0)])
            else:
                ratio = math.sqrt(
                    2.0 * math.factorial(l - m_abs) / math.factorial(l + m_abs)
                )
                ang = cos_m[m_abs] if m > 0 else sin_m[m_abs]
                outs.append(N * ratio * ang * P[(l, m_abs)])
    return np.stack(outs, axis=-1).astype(np.float32)


def harmonics_from_directions(rays, degree: int = 8):
    """Real SH of the directions of `rays` (..., 3), reference packing.

    Uses the reference's angle mapping (SconeVis.py:192-193): elevation from
    get_spherical_coords, then theta = pi/2 - elev, phi = azim.
    """
    from .geometry import get_spherical_coords

    _, elev, azim = get_spherical_coords(rays)
    theta = jnp.pi / 2.0 - elev
    return real_spherical_harmonics(theta, azim, degree=degree)


def evaluate_from_harmonic_coordinates(coordinates, theta, phi, degree: int):
    """sum_k coords_k Y_k(theta, phi) — reference spherical_harmonics.py:159-175."""
    z = real_spherical_harmonics(theta, phi, degree=degree)
    return jnp.sum(coordinates * z, axis=-1)


@partial(jax.jit, static_argnames=("degree",))
def sh_weighted_sum(rays, coeffs, degree: int = 8):
    """sum_k coeffs[..., k] * Y_k(dir(rays)) WITHOUT materializing the basis.

    rays (..., 3); coeffs broadcastable to rays[..., 0].shape + (degree**2,)
    after removing the last axis — e.g. rays (B, C, L, 3) with coeffs
    (B, 1, L, K). Numerically equivalent to
    `einsum('...k,...k', coeffs, harmonics_from_directions(rays))` but the
    64 basis terms are generated and consumed term-by-term in ONE fused
    elementwise program: no (.., C, L, 64) HBM tensor and no batched-matvec
    dot_general (which XLA lowers poorly for this contraction shape).
    Same math as the Pallas kernel (ops/pallas/sh_visibility.py), usable on
    any backend and under grad.
    """
    rays = jnp.asarray(rays)
    x = rays[..., 0]
    y = rays[..., 1]
    z = rays[..., 2]
    r2 = x * x + y * y + z * z
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-20))
    # Angle conventions of harmonics_from_directions (reference
    # SconeVis.py:192-193): cos(theta) = y/r; phi = azim with
    # cos(phi) = z/(r sin theta), sin(phi) = x/(r sin theta).
    ct = jnp.clip(y * inv_r, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    inv_rst = inv_r / jnp.maximum(st, 1e-10)
    cphi = jnp.clip(z * inv_rst, -1.0, 1.0)
    sphi = jnp.clip(x * inv_rst, -1.0, 1.0)

    P = _assoc_legendre_all(ct, st, degree)
    cos_m = {0: jnp.ones_like(cphi), 1: cphi}
    sin_m = {0: jnp.zeros_like(sphi), 1: sphi}
    for m in range(2, degree):
        # Chebyshev recurrence: no transcendentals beyond the rsqrt above
        cos_m[m] = cphi * cos_m[m - 1] - sphi * sin_m[m - 1]
        sin_m[m] = sphi * cos_m[m - 1] + cphi * sin_m[m - 1]

    acc = jnp.zeros_like(ct)
    k = 0
    for l in range(degree):
        N = math.sqrt((2 * l + 1) / (4 * math.pi))
        for m in range(-l, l + 1):
            m_abs = abs(m)
            if m == 0:
                Y = N * P[(l, 0)]
            else:
                ratio = math.sqrt(2.0 * math.factorial(l - m_abs)
                                  / math.factorial(l + m_abs))
                ang = cos_m[m_abs] if m > 0 else sin_m[m_abs]
                Y = (N * ratio) * ang * P[(l, m_abs)]
            acc = acc + coeffs[..., k] * Y
            k += 1
    return acc
