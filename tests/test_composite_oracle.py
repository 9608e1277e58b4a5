"""COMPOSITE decision-phase oracle (VERDICT r2 item 6).

The individually-pinned stages of test_torch_parity.py are composed here into
ONE end-to-end chain on a fixture scene — multi-frame carving -> view-state
accumulation -> view-space rotation -> view harmonics -> prediction-box
normalization -> fixed-tiny-model SH coefficients -> visibility integration ->
distance factor -> per-candidate coverage gains — and the whole thing is
pinned against a single torch-f64 re-derivation. This catches composition
errors (stage ordering, mask plumbing, error accumulation) that the stage
oracles cannot see. Reference: macarons_utils.py:1194-1805 end-to-end; the
neural modules are replaced by a FIXED deterministic coefficient map and the
occ-weighted MC sampler is bypassed (all eligible points contribute — the
sampler's expectation equivalence is covered by its own tests).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import torch_oracles as O  # noqa: E402

from macarons_tpu.models.scone import compute_visibilities  # noqa: E402
from macarons_tpu.ops import geometry as geo  # noqa: E402
from macarons_tpu.ops import view_state as V  # noqa: E402
from macarons_tpu.ops.geometry import ndc_bounds  # noqa: E402
from macarons_tpu.ops.projection import (  # noqa: E402
    points_in_fov_mask,
    signed_distance_to_depth_maps,
)
from macarons_tpu.scene import proxy as P  # noqa: E402
from macarons_tpu.scene import runtime as R  # noqa: E402

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier

H, W, FOV, ZFAR = 32, 48, 60.0, 20.0
N_ELEV, N_AZIM, DEG = 7, 14, 8
SENSOR_RANGE = 10.0
SURFACE_DISTANCE = 0.4
CELL_RES = 0.1
MIN_OCC = 0.5


def _cam(dist, elev, azim):
    Rm, Tm = geo.look_at_view_transform(dist=dist, elev=jnp.array([elev]),
                                        azim=jnp.array([azim]))
    return geo.FoVCamera.create(Rm, Tm, zfar=ZFAR)


def _frustum_t(pts, R, T, X_cam, fov_range):
    """Torch mirror of points_in_fov_mask (reference macarons_utils.py:2400-2435)."""
    pv = pts @ R + T
    z = pv[:, 2]
    safe_z = torch.where(z.abs() < 1e-8, torch.full_like(z, 1e-8), z)
    import math

    tan_half = math.tan(math.radians(FOV) / 2.0)
    x_ndc = pv[:, 0] / (safe_z * tan_half)
    y_ndc = pv[:, 1] / (safe_z * tan_half)
    min_x, max_x, min_y, max_y = ndc_bounds(H, W)
    ok = ((x_ndc >= min_x) & (x_ndc <= max_x)
          & (y_ndc >= min_y) & (y_ndc <= max_y) & (z > 0))
    d = torch.linalg.norm(pts - X_cam[None, :], dim=-1)
    return ok & (d < fov_range)


def test_composite_decision_phase():
    rs = np.random.default_rng(0)
    N = 1500
    pts_np = rs.uniform(-1.5, 1.5, (N, 3)).astype(np.float32)
    frames = [(3.0, 20.0, 30.0), (3.0, 10.0, 80.0), (2.8, -15.0, 150.0)]
    depths = [rs.uniform(1.5, 4.0, (1, H, W, 1)).astype(np.float32)
              for _ in frames]
    cams = [_cam(*f) for f in frames]
    cand_specs = [(3.2, 35.0, 10.0), (3.2, -30.0, 120.0), (3.0, 5.0, 200.0),
                  (2.6, 50.0, 300.0), (3.4, -5.0, 60.0)]
    cand_cams = [_cam(*c) for c in cand_specs]
    # Fixed tiny "model": SH coefficients = tanh(pts4n @ W1) @ W2
    W1 = (rs.standard_normal((4, 16)) * 0.5).astype(np.float32)
    W2 = (rs.standard_normal((16, 64)) * 0.3).astype(np.float32)
    box_diag = float(np.linalg.norm([3.0, 3.0, 3.0]))

    # ================= JAX chain (the repo's kernels) ======================
    proxy = P.initialize_proxy_points(jax.random.PRNGKey(0), [-1.5] * 3,
                                      [1.5] * 3, N)
    proxy = proxy._replace(points=jnp.asarray(pts_np))
    ones_mask = jnp.ones((1, H, W, 1), bool)
    for d_, cam in zip(depths, cams):
        fov = points_in_fov_mask(proxy.points[None], cam, H, W,
                                 fov_range=SENSOR_RANGE)[0]
        sd = signed_distance_to_depth_maps(proxy.points, jnp.asarray(d_),
                                           ones_mask, cam, ZFAR)[0]
        proxy = P.update_view_states(proxy, cam.camera_center(), fov,
                                     N_ELEV, N_AZIM, signed_distances=sd,
                                     distance_to_surface=SURFACE_DISTANCE)
        proxy = P.update_supervision_occ(proxy, fov, sd)
        proxy = P.update_out_of_field(proxy, fov)

    pred_cam = cams[-1]
    perm = V.view_space_permutation(pred_cam, N_ELEV, N_AZIM)
    rot_vs = jnp.take(proxy.view_states, perm, axis=-1)
    base, h_polar, _ = V.get_all_harmonics_under_degree(DEG, N_ELEV, N_AZIM)
    vh = V.compute_view_harmonics(rot_vs[None], base, h_polar, N_ELEV,
                                  N_AZIM)[0]  # (N, 64)

    eligible = ((proxy.supervision_occ[:, 0] > 0)
                & (proxy.out_of_field[:, 0] < 1))
    occ = jnp.where(eligible, 1.0, 0.0)[:, None]  # warmup-style field

    big = 1e9
    pw = proxy.points
    mx = jnp.max(jnp.where(eligible[:, None], pw, -big), axis=0)
    mn = jnp.min(jnp.where(eligible[:, None], pw, big), axis=0)
    center = pred_cam.world_to_view(((mx + mn) / 2)[None, None])[0, 0]
    ptsv = pred_cam.world_to_view(pw[None])[0]
    ptsn = V.normalize_points_in_prediction_box(ptsv, center, box_diag)
    pts4n = jnp.concatenate((ptsn, occ), axis=-1)
    coeffs = jnp.tanh(pts4n @ jnp.asarray(W1)) @ jnp.asarray(W2)

    gains_j = []
    for cam_c in cand_cams:
        Xc = cam_c.camera_center()[0]
        fovc = points_in_fov_mask(pw[None], cam_c, H, W,
                                  fov_range=SENSOR_RANGE)[0]
        sel = fovc & eligible & (occ[:, 0] > MIN_OCC)
        Xc_v = pred_cam.world_to_view(Xc[None, None])[0, 0]
        Xc_n = V.normalize_points_in_prediction_box(Xc_v, center, box_diag)
        vis = compute_visibilities(pts4n[None], coeffs[None],
                                   Xc_n[None, None])[0, 0]
        df = R.distance_factor(pw, Xc, jnp.asarray(FOV), H, W, CELL_RES)
        fov_volume = jnp.sum(jnp.where(sel, occ[:, 0], 0.0))
        g = jnp.sum(vis * df * sel) / jnp.maximum(jnp.sum(sel), 1) * fov_volume
        gains_j.append(float(g))

    # ================= torch-f64 re-derivation =============================
    pts_t = torch.tensor(pts_np, dtype=torch.float64)
    n_bins = N_ELEV * N_AZIM
    vs_t = torch.zeros(N, n_bins, dtype=torch.float64)
    occ_t = torch.ones(N, dtype=torch.float64)
    n_in = torch.zeros(N, dtype=torch.float64)
    n_behind = torch.zeros(N, dtype=torch.float64)
    oof_t = torch.ones(N, dtype=torch.float64)
    for d_, cam in zip(depths, cams):
        R_t = torch.tensor(np.asarray(cam.R), dtype=torch.float64)[0]
        T_t = torch.tensor(np.asarray(cam.T), dtype=torch.float64)[0]
        C_t = -(T_t @ R_t.t())
        fov = _frustum_t(pts_t, R_t, T_t, C_t, SENSOR_RANGE)
        sd = O.signed_distance_to_depth(pts_np, d_, np.asarray(cam.R),
                                        np.asarray(cam.T), FOV, H, W, ZFAR)
        # view-state update: fov & sd < distance_to_surface
        upd = fov & (sd < SURFACE_DISTANCE)
        rays = C_t[None, :] - pts_t
        _, elev, azim = O.spherical_coords(rays)
        bins = O.view_state_bins(elev, azim, N_ELEV, N_AZIM)
        oh = torch.nn.functional.one_hot(bins, n_bins).double()
        vs_t = torch.maximum(vs_t, oh * upd[:, None].double())
        # carving counters (reference update_proxy_supervision_occ :2888-2913)
        n_in = n_in + fov.double()
        behind = (sd >= 0.0) & fov
        n_behind = n_behind + behind.double()
        ratio = n_behind / torch.clamp(n_in, min=1.0)
        occ_t = torch.where(fov, (ratio >= 1.0).double(), occ_t)
        oof_t = torch.where(fov, torch.zeros_like(oof_t), oof_t)

    # Intermediates: carving + view states must agree exactly
    np.testing.assert_array_equal(
        np.asarray(proxy.supervision_occ[:, 0]) > 0, occ_t.numpy() > 0)
    np.testing.assert_array_equal(
        np.asarray(proxy.out_of_field[:, 0]), oof_t.numpy())
    np.testing.assert_array_equal(np.asarray(proxy.view_states), vs_t.numpy())

    # view-space permutation (oracle re-derivation, scone_utils.py:863-930)
    R_p = torch.tensor(np.asarray(pred_cam.R), dtype=torch.float64)[0]
    T_p = torch.tensor(np.asarray(pred_cam.T), dtype=torch.float64)[0]
    C_p = -(T_p @ R_p.t())
    import math

    g_elev = torch.tensor(
        [-math.pi / 2 + (i + 1) / (N_ELEV + 1) * math.pi
         for i in range(N_ELEV) for _ in range(N_AZIM)], dtype=torch.float64)
    g_azim = torch.tensor(
        [2 * math.pi * j / N_AZIM for _ in range(N_ELEV)
         for j in range(N_AZIM)], dtype=torch.float64)
    X_ref = torch.stack(
        (torch.cos(g_elev) * torch.sin(g_azim), torch.sin(g_elev),
         torch.cos(g_elev) * torch.cos(g_azim)), dim=-1)
    world = (X_ref - T_p[None, :]) @ R_p.t()  # view_to_world, row-vector
    dirs = world - C_p[None, :]
    _, pe, pa = O.spherical_coords(dirs)
    perm_t = O.view_space_bins(pe, pa, N_ELEV, N_AZIM)
    np.testing.assert_array_equal(np.asarray(perm), perm_t.numpy())

    rot_vs_t = vs_t[:, perm_t]
    vh_t = O.view_harmonics(rot_vs_t[None], N_ELEV, N_AZIM, DEG)[0]
    np.testing.assert_allclose(np.asarray(vh), vh_t.numpy(), atol=2e-4)

    elig_t = (occ_t > 0) & (oof_t < 1)
    occ_f = elig_t.double()
    mx_t = pts_t[elig_t].max(dim=0).values
    mn_t = pts_t[elig_t].min(dim=0).values
    center_t = ((mx_t + mn_t) / 2) @ R_p + T_p
    ptsv_t = pts_t @ R_p + T_p
    ptsn_t = (ptsv_t - center_t) / box_diag
    np.testing.assert_allclose(np.asarray(ptsn), ptsn_t.numpy(), atol=2e-4)
    pts4n_t = torch.cat((ptsn_t, occ_f[:, None]), dim=-1)
    coeffs_t = torch.tanh(pts4n_t @ torch.tensor(W1).double()) \
        @ torch.tensor(W2).double()

    eps = math.sqrt(math.pi) / 2.0 * CELL_RES
    focal = 1.0 / math.tan(math.radians(FOV) / 2.0)
    pixel = 2.0 / min(H, W)
    th = focal * eps / pixel
    gains_t = []
    for cam_c in cand_cams:
        R_c = torch.tensor(np.asarray(cam_c.R), dtype=torch.float64)[0]
        T_c = torch.tensor(np.asarray(cam_c.T), dtype=torch.float64)[0]
        C_c = -(T_c @ R_c.t())
        fovc = _frustum_t(pts_t, R_c, T_c, C_c, SENSOR_RANGE)
        sel = fovc & elig_t & (occ_f > MIN_OCC)
        Xc_v = C_c @ R_p + T_p
        Xc_n = (Xc_v - center_t) / box_diag
        rays = Xc_n[None, :] - pts4n_t[:, :3]
        _, e_r, a_r = O.spherical_coords(rays)
        Y = O.real_sh(np.pi / 2 - e_r, a_r, DEG)
        vis = torch.sigmoid(torch.einsum("lh,lh->l", Y, coeffs_t))
        d = torch.linalg.norm(pts_t - C_c[None, :], dim=-1)
        df = torch.where(d > th, (eps * focal / pixel / d) ** 2,
                         torch.ones_like(d))
        fov_volume = (occ_f * sel.double()).sum()
        g = (vis * df * sel.double()).sum() \
            / torch.clamp(sel.double().sum(), min=1.0) * fov_volume
        gains_t.append(float(g))

    np.testing.assert_allclose(gains_j, gains_t, rtol=1e-3, atol=1e-3)
    assert max(gains_t) > 0  # the fixture actually exercises the chain
