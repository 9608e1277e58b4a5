"""Generate PARITY.md: per-stage max-abs-diff of the JAX decision-phase math
vs independent torch-CPU oracles (VERDICT r1 item 7).

Run from the repo root:  python data_tools/parity_report.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

import torch_oracles as O  # noqa: E402

from macarons_tpu.ops import geometry as geo  # noqa: E402
from macarons_tpu.ops import view_state as V  # noqa: E402
from macarons_tpu.ops.harmonics import real_spherical_harmonics  # noqa: E402
from macarons_tpu.ops.projection import (  # noqa: E402
    project_depth_back_to_3D,
    signed_distance_to_depth_maps,
)
from macarons_tpu.models.scone import compute_visibilities  # noqa: E402


def rand(shape, seed, lo=-1.0, hi=1.0):
    return np.random.default_rng(seed).uniform(lo, hi, shape).astype(np.float32)


def main():
    rows = []

    X = rand((100_000, 3), 1, -5, 5)
    r_j, e_j, a_j = geo.get_spherical_coords(jnp.asarray(X))
    r_t, e_t, a_t = O.spherical_coords(torch.tensor(X, dtype=torch.float64))
    rows.append(("Spherical coords r / elev / azim (100k pts)",
                 f"{np.abs(np.asarray(r_j) - r_t.numpy()).max():.2e} / "
                 f"{np.abs(np.asarray(e_j) - e_t.numpy()).max():.2e} / "
                 f"{np.abs(np.asarray(a_j) - a_t.numpy()).max():.2e}"))

    theta = rand((50_000,), 2, 0.001, np.pi - 0.001)
    phi = rand((50_000,), 3, -np.pi, np.pi)
    z_j = real_spherical_harmonics(jnp.asarray(theta), jnp.asarray(phi), 8)
    z_t = O.real_sh(torch.tensor(theta, dtype=torch.float64),
                    torch.tensor(phi, dtype=torch.float64), 8)
    rows.append(("Real SH basis, 64 coeffs (50k dirs)",
                 f"{np.abs(np.asarray(z_j) - z_t.numpy()).max():.2e}"))

    elev = np.linspace(-np.pi / 2, np.pi / 2, 500).astype(np.float32)
    azim = np.linspace(-np.pi, np.pi, 360).astype(np.float32)
    ee, aa = [x.reshape(-1) for x in np.meshgrid(elev, azim, indexing="ij")]
    idx_j = np.asarray(V._bin_directions(jnp.asarray(ee), jnp.asarray(aa),
                                         7, 14, elev_upper_clamp=6))
    idx_t = O.view_state_bins(torch.tensor(ee), torch.tensor(aa), 7, 14).numpy()
    rows.append((f"View-state direction bins ({ee.size} dirs, f32, incl. "
                 "below-pole wrap)",
                 f"{int((idx_j != idx_t).sum())} mismatched bins"))

    vs = (np.random.default_rng(5).uniform(size=(4, 512, 98)) > 0.6
          ).astype(np.float32)
    base, h_polar, _ = V.get_all_harmonics_under_degree(8, 7, 14)
    vh_j = V.compute_view_harmonics(jnp.asarray(vs), base, h_polar, 7, 14)
    vh_t = O.view_harmonics(torch.tensor(vs), 7, 14, 8)
    rows.append(("View-state harmonics (4x512 histograms)",
                 f"{np.abs(np.asarray(vh_j) - vh_t.numpy()).max():.2e}"))

    H, W = 256, 456
    R, T = geo.look_at_view_transform(dist=3.0, elev=jnp.array([25.0]),
                                      azim=jnp.array([40.0]))
    cam = geo.FoVCamera.create(R, T, fov=60.0, zfar=20.0)
    # Smooth surface-like depth (random per-pixel depth would turn f32 pixel
    # rounding at bilinear-sample boundaries into large spurious diffs)
    yy, xx = np.meshgrid(np.linspace(0, 4, H), np.linspace(0, 6, W),
                         indexing="ij")
    depth = (4.0 + np.sin(xx) * np.cos(yy)).astype(np.float32).reshape(
        1, H, W, 1)
    pts_j, _ = project_depth_back_to_3D(jnp.asarray(depth), cam)
    pts_t = O.backproject_depth(depth, np.asarray(R), np.asarray(T), 60.0, H, W)
    rows.append((f"NDC depth backprojection ({H}x{W})",
                 f"{np.abs(np.asarray(pts_j)[0] - pts_t.numpy()).max():.2e}"))

    mask = np.ones((1, H, W, 1), bool)
    pts = rand((100_000, 3), 9, -2, 2)
    # Carving only ever consumes in-frustum points (the fov mask gates every
    # update); behind-camera projections are undefined in both impls.
    from macarons_tpu.ops.projection import points_in_fov_mask

    fov = np.asarray(points_in_fov_mask(jnp.asarray(pts)[None], cam, H, W))[0]
    sd_j = signed_distance_to_depth_maps(jnp.asarray(pts), jnp.asarray(depth),
                                         jnp.asarray(mask), cam, 20.0)
    sd_t = O.signed_distance_to_depth(pts, depth, np.asarray(R),
                                      np.asarray(T), 60.0, H, W, 20.0)
    diff = np.abs(np.asarray(sd_j)[0, :, 0] - sd_t.numpy())[fov]
    rows.append((f"Signed distance to depth map ({int(fov.sum())} in-FoV pts, "
                 "grid_sample carving)", f"{diff.max():.2e}"))

    pts4 = rand((1, 2048, 4), 10, -0.5, 0.5)
    harm = rand((1, 2048, 64), 11, -0.3, 0.3)
    Xc = rand((1, 30, 3), 12, -2, 2)
    vis_j = compute_visibilities(jnp.asarray(pts4), jnp.asarray(harm),
                                 jnp.asarray(Xc))
    rays = (torch.tensor(Xc)[:, :, None, :3]
            - torch.tensor(pts4)[:, None, :, :3]).double()
    _, el, az = O.spherical_coords(rays)
    z = torch.einsum("bclh,blh->bcl", O.real_sh(np.pi / 2 - el, az, 8),
                     torch.tensor(harm).double())
    vis_t = torch.sigmoid(z)
    rows.append(("SH visibility integration (2048 pts x 30 candidates)",
                 f"{np.abs(np.asarray(vis_j) - vis_t.numpy()).max():.2e}"))

    # ManyDepth cost-volume warp at production feature resolution
    # (256/4 x 456/4, 96 planes) — weights-free plane-sweep math
    # (reference ManyDepth.py:111-205)
    from macarons_tpu.models.many_depth import CostVolumeBuilder

    B, A, fh, fw, C, D = 1, 2, 64, 114, 16, 96
    feat = rand((B, fh, fw, C), 20, 0, 1)
    feat_a = rand((B, A, fh, fw, C), 21, 0, 1)
    Rj, Tj = geo.look_at_view_transform(dist=8.0, elev=jnp.array([20.0]),
                                        azim=jnp.array([30.0]))
    Ra, Ta = geo.look_at_view_transform(
        dist=8.0, elev=jnp.array([22.0, 18.0]), azim=jnp.array([35.0, 25.0]))
    builder = CostVolumeBuilder(height=fh * 4, width=fw * 4, d_min=0.5,
                                d_max=750.0, n_depth=D, output_channels=4)
    vars_ = builder.init(jax.random.PRNGKey(0), jnp.asarray(feat), Rj, Tj,
                         jnp.asarray(feat_a), Ra[None], Ta[None])
    _, cv_j = builder.apply(vars_, jnp.asarray(feat), Rj, Tj,
                            jnp.asarray(feat_a), Ra[None], Ta[None],
                            return_cost_volume=True)
    cv_t = O.cost_volume(feat, np.asarray(Rj), np.asarray(Tj), feat_a,
                         np.asarray(Ra)[None], np.asarray(Ta)[None],
                         fov_deg=60.0, d_min=0.5, d_max=750.0, n_depth=D)
    rows.append((f"ManyDepth cost-volume warp ({fh}x{fw} feats, {D} planes)",
                 f"{np.abs(np.asarray(cv_j) - cv_t.numpy()).max():.2e}"))

    # Photometric reconstruction loss at full frame resolution
    # (reference depth_model_utils.py:577-673)
    from macarons_tpu.models.depth_losses import reconstruction_loss

    H, W = 256, 456
    rs = np.random.default_rng(30)
    images = rs.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    alpha_images = rs.uniform(0, 1, (1, A, H, W, 3)).astype(np.float32)
    depth = rs.uniform(3.0, 12.0, (1, H, W, 1)).astype(np.float32)
    dmask = rs.uniform(0, 1, (1, H, W, 1)) > 0.15
    cam = geo.FoVCamera.create(Rj, Tj, zfar=20.0)
    cam_a = geo.FoVCamera.create(Ra, Ta, zfar=20.0)
    loss_j = reconstruction_loss(
        jnp.asarray(images), jnp.asarray(alpha_images), jnp.asarray(dmask),
        cam, cam_a, jnp.asarray(depth), ssim_factor=0.85, use_mask=True,
        zfar=20.0)
    loss_t = O.reconstruction_loss(
        images, alpha_images, dmask, np.asarray(Rj), np.asarray(Tj),
        np.asarray(Ra)[None], np.asarray(Ta)[None], depth, fov_deg=60.0,
        ssim_factor=0.85, use_mask=True, zfar=20.0)
    rows.append((f"Photometric reconstruction loss ({H}x{W}, SSIM+L1+mask)",
                 f"{abs(float(loss_j) - float(loss_t)):.2e}"))

    lines = [
        "# PARITY — JAX vs torch-CPU oracles",
        "",
        "Per-stage numerical parity of the NBV decision-phase math against",
        "independent torch re-derivations of the reference's documented",
        "formulas (PT3D conventions, torch-1.7 rounding). Oracles:",
        "`tests/torch_oracles.py`; assertions: `tests/test_torch_parity.py`;",
        "regenerate with `python data_tools/parity_report.py`.",
        "",
        "| Stage | max abs diff (f32 impl vs f64 oracle) |",
        "|---|---|",
    ]
    for name, val in rows:
        lines.append(f"| {name} | {val} |")
    lines += [
        "",
        "Notes:",
        "- View-state bins are compared bit-exactly at f32 (the reference's",
        "  dtype); the round-1 2/9592 clamp deviation is fixed (the reference's",
        "  `-n_elev // 2` floor clamp + `% n_candidates` below-pole wrap are",
        "  reproduced, ops/view_state.py:_bin_directions).",
        "- The depth network's LEARNED convs are excluded (no pretrained",
        "  reference weights in this environment); all the math around them",
        "  is covered — backprojection, carving, gains, and now the",
        "  plane-sweep cost-volume warp and the photometric SSIM+L1",
        "  reconstruction loss (weights-free f64 oracles).",
    ]
    out = os.path.join(os.path.dirname(__file__), "..", "PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
