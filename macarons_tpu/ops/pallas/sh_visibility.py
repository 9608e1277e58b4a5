"""Pallas TPU kernel: fused spherical-harmonics visibility evaluation.

The NBV scoring inner loop evaluates, for every (candidate camera, point) pair:
ray direction -> spherical angles -> all 64 real SH basis values -> dot with
the point's predicted harmonics -> sigmoid. The XLA path
(models.scone.compute_visibilities) materializes the (C, L, 64) basis tensor in
HBM; this kernel keeps the whole chain in VMEM/registers — the 64 basis terms
are generated and consumed on the fly with Legendre/Chebyshev recurrences, so
the only HBM traffic is the transposed inputs (3, L), (64, L), (3, C) in and
vis (C, L) out: a 64x reduction in intermediate bandwidth.

Layout: the point axis rides the 128-wide lanes (all blocks have L or C last);
the coordinate/harmonic axes are sublanes.

Angle conventions match ops.harmonics/ops.geometry exactly (reference
SconeVis.py:190-205): theta = pi/2 - elev so cos(theta) = y/r and
sin(theta) = cos(elev); phi = azim with cos(phi) = z/(r sin theta),
sin(phi) = x/(r sin theta).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_HARMONICS = 64
MAX_L = 8


def _sh_coeffs():
    """Static normalization constants N_{l,m} in the reference packing order."""
    out = []
    for l in range(MAX_L):
        N = math.sqrt((2 * l + 1) / (4 * math.pi))
        for m in range(-l, l + 1):
            m_abs = abs(m)
            if m == 0:
                out.append((l, m, N))
            else:
                ratio = math.sqrt(
                    2.0 * math.factorial(l - m_abs) / math.factorial(l + m_abs))
                out.append((l, m, N * ratio))
    return out


_COEFFS = _sh_coeffs()


def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def _accumulate_sh(ct, st, cphi, sphi, harm_ref):
    """Accumulate sum_k harm_k * Y_k(theta, phi) with on-the-fly recurrences.

    ct/st/cphi/sphi: (c_blk, l_blk); harm_ref: (64, l_blk) VMEM ref."""
    P = {}
    P[(0, 0)] = jnp.ones_like(ct)
    for m in range(1, MAX_L):
        P[(m, m)] = ((-1.0) ** m) * _double_factorial(2 * m - 1) * (st ** m)
    for m in range(0, MAX_L - 1):
        P[(m + 1, m)] = (2 * m + 1) * ct * P[(m, m)]
    for m in range(0, MAX_L):
        for l in range(m + 2, MAX_L):
            P[(l, m)] = ((2 * l - 1) * ct * P[(l - 1, m)]
                         - (l + m - 1) * P[(l - 2, m)]) / (l - m)

    cos_m = {0: jnp.ones_like(cphi), 1: cphi}
    sin_m = {0: jnp.zeros_like(sphi), 1: sphi}
    for m in range(2, MAX_L):
        cos_m[m] = cphi * cos_m[m - 1] - sphi * sin_m[m - 1]
        sin_m[m] = sphi * cos_m[m - 1] + cphi * sin_m[m - 1]

    acc = jnp.zeros_like(ct)
    for k, (l, m, coeff) in enumerate(_COEFFS):
        m_abs = abs(m)
        if m == 0:
            Y = coeff * P[(l, 0)]
        elif m > 0:
            Y = coeff * cos_m[m_abs] * P[(l, m_abs)]
        else:
            Y = coeff * sin_m[m_abs] * P[(l, m_abs)]
        h_k = harm_ref[k, :][None, :]  # (1, l_blk)
        acc = acc + h_k * Y
    return acc


def _vis_kernel(px_ref, py_ref, pz_ref, harm_ref, cam_ref, out_ref, *,
                use_sigmoid: bool):
    """One (c_blk, l_blk) output tile.

    px/py/pz_ref (1, l_blk); harm_ref (64, l_blk); cam_ref (3, C_pad) in SMEM;
    out_ref (c_blk, l_blk)."""
    c_blk = out_ref.shape[0]
    i = pl.program_id(0)
    px = px_ref[0, :][None, :]  # (1, l_blk)
    py = py_ref[0, :][None, :]
    pz = pz_ref[0, :][None, :]
    # Camera coordinates as SMEM scalars (static unroll over the c_blk rows)
    cx = jnp.stack([cam_ref[0, i * c_blk + c] for c in range(c_blk)])[:, None]
    cy = jnp.stack([cam_ref[1, i * c_blk + c] for c in range(c_blk)])[:, None]
    cz = jnp.stack([cam_ref[2, i * c_blk + c] for c in range(c_blk)])[:, None]

    rx = cx - px  # (c_blk, l_blk)
    ry = cy - py
    rz = cz - pz
    r2 = rx * rx + ry * ry + rz * rz
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-20))

    ct = jnp.clip(ry * inv_r, -1.0, 1.0)  # cos(theta) = sin(elev) = y/r
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))  # sin(theta) >= 0
    inv_rst = 1.0 / jnp.maximum(st, 1e-10) * inv_r
    cphi = jnp.clip(rz * inv_rst, -1.0, 1.0)
    sphi = jnp.clip(rx * inv_rst, -1.0, 1.0)

    z = _accumulate_sh(ct, st, cphi, sphi, harm_ref)
    if use_sigmoid:
        out_ref[:, :] = jax.nn.sigmoid(z)
    else:
        out_ref[:, :] = jnp.maximum(z, 0.0)


@partial(jax.jit, static_argnames=("use_sigmoid", "c_blk", "l_blk", "interpret"))
def pallas_compute_visibilities(pts, harmonics, X_cam, use_sigmoid: bool = True,
                                c_blk: int = 8, l_blk: int = 512,
                                interpret: bool = False):
    """Per-point visibility for every candidate — Pallas TPU kernel.

    pts (L, >=3); harmonics (L, 64); X_cam (C, 3) -> (C, L).
    Matches models.scone.compute_visibilities (B=1) numerically; set
    interpret=True to run on CPU for testing.
    """
    L = pts.shape[0]
    C = X_cam.shape[0]
    pts3 = pts[:, :3].astype(jnp.float32)
    harmonics = harmonics.astype(jnp.float32)
    X_cam = X_cam.astype(jnp.float32)

    pad_l = (-L) % l_blk
    pad_c = (-C) % c_blk
    if pad_l:
        pts3 = jnp.concatenate(
            [pts3, jnp.full((pad_l, 3), 1e6, jnp.float32)], axis=0)
        harmonics = jnp.concatenate(
            [harmonics, jnp.zeros((pad_l, N_HARMONICS), jnp.float32)], axis=0)
    if pad_c:
        X_cam = jnp.concatenate(
            [X_cam, jnp.zeros((pad_c, 3), jnp.float32)], axis=0)
    Lp, Cp = pts3.shape[0], X_cam.shape[0]

    # Lane-aligned layouts: the point axis rides the lanes; camera coords are
    # SMEM scalars read per output row.
    px_t = pts3[:, 0][None, :]  # (1, Lp)
    py_t = pts3[:, 1][None, :]
    pz_t = pts3[:, 2][None, :]
    harm_t = harmonics.T  # (64, Lp)
    cam_t = X_cam.T  # (3, Cp)

    row = pl.BlockSpec((1, l_blk), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_vis_kernel, use_sigmoid=use_sigmoid),
        out_shape=jax.ShapeDtypeStruct((Cp, Lp), jnp.float32),
        grid=(Cp // c_blk, Lp // l_blk),
        in_specs=[
            row, row, row,
            pl.BlockSpec((N_HARMONICS, l_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cp), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((c_blk, l_blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(px_t, py_t, pz_t, harm_t, cam_t)
    return out[:C, :L]
