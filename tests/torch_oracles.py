"""Torch-CPU oracles for numerical parity checks.

Independent re-derivations of the reference's documented math (PyTorch3D
conventions, torch-1.7 rounding semantics), written from the formulas — used
by test_torch_parity.py and tools/parity_report.py to bound the JAX
implementations' drift per stage. Reference citations per function.
"""

import math

import numpy as np
import torch


def trunc_div(a, b):
    """torch-1.7 floor_divide semantics: TRUNCATION toward zero
    (the reference runs torch 1.7.1; modern floor_divide floors)."""
    return torch.div(a, b, rounding_mode="trunc")


# ---------------------------------------------------------------------------
# Spherical coordinates (reference CustomGeometry.py:27-45)
# ---------------------------------------------------------------------------


def spherical_coords(X):
    """(r, elev, azim): elev = asin(y/r); azim = acos(z/(r cos elev)) signed
    by x (azim measured from +z toward +x), clamped edge cases."""
    r = torch.linalg.norm(X, dim=-1)
    safe_r = torch.clamp(r, min=1e-20)
    elev = torch.asin(torch.clamp(X[..., 1] / safe_r, -1.0, 1.0))
    denom = torch.clamp(safe_r * torch.cos(elev), min=1e-20)
    cos_azim = torch.clamp(X[..., 2] / denom, -1.0, 1.0)
    azim = torch.acos(cos_azim)
    azim = torch.where(X[..., 0] < 0, -azim, azim)
    return r, elev, azim


# ---------------------------------------------------------------------------
# Real spherical harmonics via scipy-free recursive Legendre
# (reference spherical_harmonics.py:67-156 semantics)
# ---------------------------------------------------------------------------


def _lpmv(l, m, x):
    """Associated Legendre P_l^m(x) with Condon-Shortley, recursive."""
    if m == l:
        dfact = 1.0
        for k in range(2 * m - 1, 1, -2):
            dfact *= k
        return ((-1.0) ** m) * dfact * (1 - x * x).clamp(min=0).pow(m / 2.0)
    if l == m + 1:
        return (2 * m + 1) * x * _lpmv(m, m, x)
    return ((2 * l - 1) * x * _lpmv(l - 1, m, x)
            - (l + m - 1) * _lpmv(l - 2, m, x)) / (l - m)


def real_sh(theta, phi, degree=8):
    """All real SH l < degree at (theta, phi), packed l-major, m=-l..l."""
    ct = torch.cos(theta)
    outs = []
    for l in range(degree):
        N = math.sqrt((2 * l + 1) / (4 * math.pi))
        for m in range(-l, l + 1):
            ma = abs(m)
            P = _lpmv(l, ma, ct)
            if m == 0:
                outs.append(N * P)
            else:
                ratio = math.sqrt(2.0 * math.factorial(l - ma)
                                  / math.factorial(l + ma))
                ang = torch.cos(ma * phi) if m > 0 else torch.sin(ma * phi)
                outs.append(N * ratio * ang * P)
    return torch.stack(outs, dim=-1)


# ---------------------------------------------------------------------------
# View-state direction binning (reference scone_utils.py:799-860)
# ---------------------------------------------------------------------------


def view_state_bins(ray_elev, ray_azim, n_elev, n_azim):
    """Flat bin index per ray, with the reference's exact quirks: trunc
    division, >half rounding, asymmetric elev clamps (upper n_elev-1, lower
    -n_elev//2 = FLOOR), azim wrap, final % n_candidates."""
    elev_step = math.pi / (n_elev + 1)
    azim_step = 2 * math.pi / n_azim
    idx_elev = trunc_div(ray_elev, elev_step)
    idx_azim = trunc_div(ray_azim, azim_step)
    idx_elev = idx_elev + (torch.remainder(ray_elev, elev_step)
                           > elev_step / 2.0).to(idx_elev.dtype)
    idx_azim = idx_azim + (torch.remainder(ray_azim, azim_step)
                           > azim_step / 2.0).to(idx_azim.dtype)
    idx_elev = torch.where(
        idx_elev >= n_elev, torch.full_like(idx_elev, n_elev - 1), idx_elev)
    lower = -n_elev // 2  # python floor: -4 for n_elev=7
    idx_elev = torch.where(
        idx_elev < lower, torch.full_like(idx_elev, lower), idx_elev)
    idx_azim = torch.where(
        idx_azim > n_azim // 2, torch.full_like(idx_azim, -(n_azim // 2)),
        idx_azim)
    idx_elev = idx_elev + n_elev // 2
    idx_azim = torch.where(idx_azim < 0, idx_azim + n_azim, idx_azim)
    indices = idx_elev.long() * n_azim + idx_azim.long()
    return torch.remainder(indices, n_elev * n_azim)


def view_space_bins(ray_elev, ray_azim, n_elev, n_azim):
    """move_view_state_to_view_space's bin variant (scone_utils.py:908-925):
    same rounding as view_state_bins but SYMMETRIC elev clamps
    (upper n_elev//2, lower -(n_elev//2))."""
    elev_step = math.pi / (n_elev + 1)
    azim_step = 2 * math.pi / n_azim
    idx_elev = trunc_div(ray_elev, elev_step)
    idx_azim = trunc_div(ray_azim, azim_step)
    idx_elev = idx_elev + (torch.remainder(ray_elev, elev_step)
                           > elev_step / 2.0).to(idx_elev.dtype)
    idx_azim = idx_azim + (torch.remainder(ray_azim, azim_step)
                           > azim_step / 2.0).to(idx_azim.dtype)
    upper = n_elev // 2
    idx_elev = torch.where(
        idx_elev > upper, torch.full_like(idx_elev, upper), idx_elev)
    idx_elev = torch.where(
        idx_elev < -upper, torch.full_like(idx_elev, -upper), idx_elev)
    idx_azim = torch.where(
        idx_azim > n_azim // 2, torch.full_like(idx_azim, -(n_azim // 2)),
        idx_azim)
    idx_elev = idx_elev + n_elev // 2
    idx_azim = torch.where(idx_azim < 0, idx_azim + n_azim, idx_azim)
    indices = idx_elev.long() * n_azim + idx_azim.long()
    return torch.remainder(indices, n_elev * n_azim)


# ---------------------------------------------------------------------------
# View harmonics: L2 spherical inner product (reference scone_utils.py:934-960)
# ---------------------------------------------------------------------------


def view_harmonics(view_state, n_elev, n_azim, degree=8):
    """(B, L, V) histogram -> (B, L, H) via sum_v state_v * Y_h(v) * sin(polar)
    * dpolar * dazim."""
    elev = torch.tensor(
        [-math.pi / 2 + (i + 1) / (n_elev + 1) * math.pi
         for i in range(n_elev) for _ in range(n_azim)], dtype=torch.float64)
    azim = torch.tensor(
        [2 * math.pi * j / n_azim for _ in range(n_elev)
         for j in range(n_azim)], dtype=torch.float64)
    polar = math.pi / 2 - elev
    z = real_sh(polar, azim, degree)  # (V, H)
    w = z * torch.sin(polar)[:, None] * (math.pi / (n_elev + 1)) \
        * (2 * math.pi / n_azim)
    return torch.einsum("blv,vh->blh", view_state.double(), w)


# ---------------------------------------------------------------------------
# NDC depth backprojection (PT3D FoV camera unprojection,
# reference macarons_utils.py:2339-2360 / ManyDepth.py:111-144)
# ---------------------------------------------------------------------------


def backproject_depth(depth, R, T, fov_deg, H, W):
    """World points for each pixel of a (H, W) depth map under a PT3D
    FoVPerspective camera. NDC grid per the reference's tables
    (macarons_utils.py:1928-1938): x_ndc = W/s - 2j/(s-1), y_ndc = H/s -
    2i/(s-1) (+X left, +Y up); unprojection with tan(fov/2) scaling
    (scaled_depth_input=False)."""
    depth_t = torch.as_tensor(depth, dtype=torch.float64).reshape(H, W)
    R = torch.as_tensor(R, dtype=torch.float64).reshape(3, 3)
    T = torch.as_tensor(T, dtype=torch.float64).reshape(3)
    s = min(H, W)
    j = torch.arange(W, dtype=torch.float64)
    i = torch.arange(H, dtype=torch.float64)
    x_ndc = (W / s - 2.0 * j / (s - 1))[None, :].expand(H, W)
    y_ndc = (H / s - 2.0 * i / (s - 1))[:, None].expand(H, W)
    tan_half = math.tan(math.radians(fov_deg) / 2.0)
    z = depth_t
    xv = x_ndc * z * tan_half
    yv = y_ndc * z * tan_half
    pv = torch.stack((xv, yv, z), dim=-1).reshape(-1, 3)
    # view -> world: X_w = (X_v - T) R^T  (PT3D world_to_view: X_v = X_w R + T)
    return (pv - T) @ R.t()


def signed_distance_to_depth(pts_world, depth, R, T, fov_deg, H, W, zfar):
    """Reference get_signed_distance_to_depth_maps (macarons_utils.py:2451-2500):
    project points into the camera, bilinear-sample the depth map at their
    pixel, signed distance = point depth - sampled depth."""
    pts = torch.as_tensor(pts_world, dtype=torch.float64)
    R = torch.as_tensor(R, dtype=torch.float64).reshape(3, 3)
    T = torch.as_tensor(T, dtype=torch.float64).reshape(3)
    depth_t = torch.as_tensor(depth, dtype=torch.float64).reshape(1, 1, H, W)
    pv = pts @ R + T  # world -> view
    f = 1.0 / math.tan(math.radians(fov_deg) / 2.0)
    s = min(H, W)
    z = pv[:, 2].clamp(min=1e-8)
    x_ndc = f * pv[:, 0] / z
    y_ndc = f * pv[:, 1] / z
    # PT3D NDC -> grid_sample coords (reference macarons_utils.py:2484-2488):
    # factor = -min(H, W); gx = factor/W * x_ndc, gy = factor/H * y_ndc
    gx = -float(s) / W * x_ndc
    gy = -float(s) / H * y_ndc
    grid = torch.stack((gx, gy), dim=-1).reshape(1, 1, -1, 2)
    sampled = torch.nn.functional.grid_sample(
        depth_t, grid, mode="bilinear", padding_mode="border",
        align_corners=False).reshape(-1)
    return pv[:, 2] - sampled


# ---------------------------------------------------------------------------
# ManyDepth cost-volume warp + photometric reconstruction loss
# (reference ManyDepth.py:111-205 cost volume, depth_model_utils.py:577-673
# reconstruction loss) — weights-free f64 twins of the math the depth module
# runs around its learned convs.
# ---------------------------------------------------------------------------


def cost_volume(feat, R, T, feat_alpha, R_alpha, T_alpha, fov_deg=60.0,
                d_min=0.5, d_max=750.0, n_depth=96):
    """Plane-sweep L1 cost volume (reference ManyDepth.py:111-205).

    feat (B, fh, fw, C); R (B, 3, 3); T (B, 3); feat_alpha (B, A, fh, fw, C).
    Returns torch f64 (B, fh, fw, n_depth)."""
    feat = torch.as_tensor(np.asarray(feat), dtype=torch.float64)
    R = torch.as_tensor(np.asarray(R), dtype=torch.float64)
    T = torch.as_tensor(np.asarray(T), dtype=torch.float64)
    feat_alpha = torch.as_tensor(np.asarray(feat_alpha), dtype=torch.float64)
    R_alpha = torch.as_tensor(np.asarray(R_alpha), dtype=torch.float64)
    T_alpha = torch.as_tensor(np.asarray(T_alpha), dtype=torch.float64)
    B, fh, fw, C = feat.shape
    A = feat_alpha.shape[1]
    D = n_depth
    s = min(fh, fw)
    tan_half = math.tan(math.radians(fov_deg) / 2.0)

    j = torch.arange(fw, dtype=torch.float64)
    i = torch.arange(fh, dtype=torch.float64)
    x_ndc = (fw / s - 2.0 * j / (s - 1))[None, :].expand(fh, fw).reshape(-1)
    y_ndc = (fh / s - 2.0 * i / (s - 1))[:, None].expand(fh, fw).reshape(-1)
    depths = torch.linspace(d_min, d_max, D, dtype=torch.float64)
    P = fh * fw
    pv = torch.stack(
        (x_ndc[None] * depths[:, None] * tan_half,
         y_ndc[None] * depths[:, None] * tan_half,
         depths[:, None].expand(D, P)), dim=-1)  # (D, P, 3)
    # view -> world per batch: X_w = (X_v - T) R^T
    world = (torch.einsum("dpj,bij->bdpi", pv, R)
             - torch.einsum("bj,bij->bi", T, R)[:, None, None, :])
    # world -> each alpha view
    view_a = (torch.einsum("bdpj,baji->badpi", world, R_alpha)
              + T_alpha[:, :, None, None, :])
    z = view_a[..., 2]
    safe_z = torch.where(z.abs() < 1e-8, torch.full_like(z, 1e-8), z)
    gx = -(s / fw) * (view_a[..., 0] / (safe_z * tan_half))
    gy = -(s / fh) * (view_a[..., 1] / (safe_z * tan_half))
    grid = torch.stack((gx, gy), dim=-1).reshape(B * A, D * P, 1, 2)
    src = feat_alpha.reshape(B * A, fh, fw, C).permute(0, 3, 1, 2)
    warped = torch.nn.functional.grid_sample(
        src, grid, mode="bilinear", padding_mode="zeros",
        align_corners=False)  # (B*A, C, D*P, 1)
    warped = warped.reshape(B, A, C, D, P).permute(0, 1, 3, 4, 2)
    warped = warped.mean(dim=1)  # (B, D, P, C)
    target = feat.reshape(B, 1, P, C)
    cost = (warped - target).abs().mean(dim=-1)  # (B, D, P)
    return cost.reshape(B, D, fh, fw).permute(0, 2, 3, 1)


def _ssim_dist(x, y):
    """(1 - SSIM)/2 with 3x3 reflect-padded average pools (reference
    ManyDepth.py:809-842). x, y: torch f64 (N, C, H, W)."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    pad = torch.nn.ReflectionPad2d(1)

    def pool(v):
        return torch.nn.functional.avg_pool2d(pad(v), 3, 1)

    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return ((1 - n / d) / 2).clamp(0.0, 1.0)


def reconstruction_loss(images, alpha_images, mask, R, T, R_alpha, T_alpha,
                        depth, fov_deg=60.0, ssim_factor=0.85,
                        use_mask=True, zfar=750.0, padding_mode="border"):
    """Photometric reprojection loss (reference depth_model_utils.py:577-673).

    images (B, H, W, 3); alpha_images (B, A, H, W, 3); mask (B, H, W, 1) bool;
    depth (B, H, W, 1); R/T target cameras, R_alpha/T_alpha (B, A, ...).
    Returns a torch f64 scalar."""
    images = torch.as_tensor(np.asarray(images), dtype=torch.float64)
    alpha_images = torch.as_tensor(np.asarray(alpha_images),
                                   dtype=torch.float64)
    mask_t = torch.as_tensor(np.asarray(mask), dtype=torch.bool)
    depth = torch.as_tensor(np.asarray(depth), dtype=torch.float64)
    R = torch.as_tensor(np.asarray(R), dtype=torch.float64)
    T = torch.as_tensor(np.asarray(T), dtype=torch.float64)
    R_alpha = torch.as_tensor(np.asarray(R_alpha), dtype=torch.float64)
    T_alpha = torch.as_tensor(np.asarray(T_alpha), dtype=torch.float64)
    B, H, W, _ = images.shape
    A = alpha_images.shape[1]
    s = min(H, W)
    tan_half = math.tan(math.radians(fov_deg) / 2.0)

    warp_depth = torch.where(mask_t, depth,
                             torch.full_like(depth, zfar)) if use_mask \
        else depth

    losses = []
    for b in range(B):
        world = backproject_depth(warp_depth[b], R[b], T[b], fov_deg, H, W)
        per_alpha = []
        for a in range(A):
            pv = world @ R_alpha[b, a] + T_alpha[b, a]
            z = pv[:, 2]
            safe_z = torch.where(z.abs() < 1e-8, torch.full_like(z, 1e-8), z)
            gx = -(s / W) * (pv[:, 0] / (safe_z * tan_half))
            gy = -(s / H) * (pv[:, 1] / (safe_z * tan_half))
            grid = torch.stack((gx, gy), dim=-1).reshape(1, H, W, 2)
            src = alpha_images[b, a].permute(2, 0, 1)[None]
            warped = torch.nn.functional.grid_sample(
                src, grid, mode="bilinear", padding_mode=padding_mode,
                align_corners=False)  # (1, 3, H, W)
            tgt = images[b].permute(2, 0, 1)[None]
            l1 = (tgt - warped).abs().mean(dim=1, keepdim=True)
            if ssim_factor > 0:
                sm = _ssim_dist(tgt, warped).mean(dim=1, keepdim=True)
                per_alpha.append(ssim_factor * sm + (1 - ssim_factor) * l1)
            else:
                per_alpha.append(l1)
        loss = torch.stack(per_alpha, dim=0).min(dim=0).values  # (1,1,H,W)
        if use_mask:
            m = mask_t[b, ..., 0].double()
            losses.append((loss[0, 0] * m).sum() / (m.sum() + 1e-7))
        else:
            losses.append(loss.mean())
    return torch.stack(losses).sum() if use_mask else torch.stack(losses).mean()
