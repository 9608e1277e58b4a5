"""End-to-end tests of the ShapeNet GT generator on a cube (carving is exact
for convex shapes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from macarons_tpu.data import shapenet as sng
from test_rasterizer import cube_mesh

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


@pytest.fixture(scope="module")
def small_cfg():
    return sng.ShapeNetGTConfig(
        n_points_surface=512,
        part_pc_length=256,
        n_samples_for_occupancy=1000,
        n_max_samples=2000,
        image_size=64,
        surface_epsilon_is_constant=True,
        surface_epsilon=0.08,
    )


@pytest.fixture(scope="module")
def cube_gt(small_cfg):
    verts, faces = cube_mesh(1.0)
    verts = sng.adjust_mesh_diagonally(verts, 1.0)  # dataset diag-1 convention
    gt = sng.generate_mesh_gt(jax.random.PRNGKey(0), verts, faces, small_cfg)
    return verts, faces, gt


def test_adjust_mesh_diagonally():
    verts, _ = cube_mesh(1.0)
    v = np.asarray(sng.adjust_mesh_diagonally(verts + 5.0, 1.5))
    diag = np.linalg.norm(v.max(0) - v.min(0))
    np.testing.assert_allclose(diag, 1.5, rtol=1e-5)
    np.testing.assert_allclose((v.max(0) + v.min(0)) / 2, 0.0, atol=1e-6)


def test_surface_points_on_cube(cube_gt):
    verts, faces, gt = cube_gt
    half = float(np.abs(np.asarray(verts)).max())
    sp = gt["surface_points"]
    assert sp.shape == (512, 3)
    np.testing.assert_allclose(np.abs(sp).max(axis=-1), half, atol=1e-5)


def test_partial_point_clouds_on_surface(cube_gt):
    verts, faces, gt = cube_gt
    half = float(np.abs(np.asarray(verts)).max())
    pc, mask = gt["partial_point_cloud"], gt["partial_point_cloud_mask"]
    assert pc.shape == (52, 256, 3) and mask.shape == (52, 256)
    assert mask.any(axis=1).all()  # every candidate sees the cube
    valid_pts = pc[mask]
    np.testing.assert_allclose(np.abs(valid_pts).max(axis=-1), half, atol=2e-2)


def test_occupancy_field_carving_exact(cube_gt):
    verts, faces, gt = cube_gt
    half = float(np.abs(np.asarray(verts)).max())
    occ_field = gt["occupancy_field"]
    assert occ_field.shape == (1000 + 512, 4)
    pts, occ = occ_field[:1000, :3], occ_field[:1000, 3]
    inside = np.all(np.abs(pts) < half * 0.92, axis=-1)
    outside = np.any(np.abs(pts) > half * 1.08, axis=-1)
    assert occ[inside].mean() > 0.98
    assert occ[outside].mean() < 0.02
    # surface points appended with occ=1
    np.testing.assert_array_equal(occ_field[1000:, 3], 1.0)
    # balancing put a healthy fraction of occupied points in the field
    assert 0.1 < occ[:1000].mean() <= 1.0


def test_coverage_matrix_side_dependence(cube_gt):
    verts, faces, gt = cube_gt
    cov = gt["coverage"]
    assert cov.shape == (52, 512)
    sp = gt["surface_points"]
    half = float(np.abs(np.asarray(verts)).max())
    X_cam, _ = sng.candidate_cameras(sng.ShapeNetGTConfig())
    X_cam = np.asarray(X_cam)
    # Find a camera nearly along +z; points on the z+ face should be covered far
    # more than points on the z- face.
    c = int(np.argmax(X_cam[:, 2] / np.linalg.norm(X_cam, axis=-1)))
    zplus = sp[:, 2] > half * 0.999
    zminus = sp[:, 2] < -half * 0.999
    assert cov[c][zplus].mean() > 0.8
    assert cov[c][zminus].mean() < 0.2
    # Coverage is binary
    assert set(np.unique(cov)) <= {0.0, 1.0}


def test_save_and_reload(tmp_path, cube_gt):
    _, _, gt = cube_gt
    sng.save_mesh_gt(gt, str(tmp_path))
    loaded = np.load(tmp_path / "partial_point_clouds.npz")
    np.testing.assert_array_equal(loaded["coverage"], gt["coverage"])
    occ = np.load(tmp_path / "occupancy_field.npz")["occupancy_field"]
    np.testing.assert_array_equal(occ, gt["occupancy_field"])
