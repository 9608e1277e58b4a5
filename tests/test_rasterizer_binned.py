"""Binned rasterizer: exact agreement with the brute-force scan path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from macarons_tpu.ops import geometry as geo
from macarons_tpu.ops import rasterizer as ras
from test_rasterizer import cube_mesh, _cam

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier


def random_mesh(rng, n_faces=400, extent=1.5):
    verts = jnp.array(rng.uniform(-extent, extent, (n_faces * 3, 3)),
                      jnp.float32)
    faces = jnp.arange(n_faces * 3, dtype=jnp.int32).reshape(n_faces, 3)
    return verts, faces


@pytest.mark.parametrize("pc", [True, False])
def test_binned_matches_scan_cube(pc):
    verts, faces = cube_mesh(1.0)
    cam = _cam(dist=4.0, elev=25.0, azim=40.0)
    a = ras.rasterize(verts, faces, cam, (48, 64), method="scan",
                      perspective_correct=pc)
    b = ras.rasterize(verts, faces, cam, (48, 64), method="binned",
                      perspective_correct=pc)
    np.testing.assert_array_equal(np.asarray(a.pix_to_face),
                                  np.asarray(b.pix_to_face))
    np.testing.assert_allclose(np.asarray(a.zbuf), np.asarray(b.zbuf),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.bary), np.asarray(b.bary),
                               atol=1e-5)


def test_binned_matches_scan_random_soup(rng):
    verts, faces = random_mesh(rng)
    cam = _cam(dist=5.0, elev=-15.0, azim=100.0)
    a = ras.rasterize(verts, faces, cam, (40, 56), method="scan")
    b = ras.rasterize(verts, faces, cam, (40, 56), method="binned",
                      max_faces_per_tile=512)
    same = np.asarray(a.pix_to_face) == np.asarray(b.pix_to_face)
    assert same.mean() > 0.999, same.mean()
    hit = np.asarray(a.zbuf) > 0
    np.testing.assert_allclose(np.asarray(a.zbuf)[same & hit],
                               np.asarray(b.zbuf)[same & hit], atol=1e-4)


def test_binned_nonsquare_nondivisible_size(rng):
    # Image size not divisible by the tile size exercises the padding path.
    verts, faces = random_mesh(rng, n_faces=100)
    cam = _cam(dist=5.0)
    a = ras.rasterize(verts, faces, cam, (37, 53), method="scan")
    b = ras.rasterize(verts, faces, cam, (37, 53), method="binned", tile=16)
    assert (np.asarray(a.pix_to_face) == np.asarray(b.pix_to_face)).mean() > 0.999


def test_binned_ortho():
    verts = jnp.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                      jnp.float32)
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    R, T = geo.look_at_view_transform(dist=5.0, elev=0.0, azim=0.0)
    cam = geo.OrthoCamera.create(R, T, znear=0.5, zfar=20.0)
    frags = ras.rasterize(verts, faces, cam, (32, 32), method="binned")
    np.testing.assert_allclose(np.asarray(frags.zbuf)[0], 5.0, atol=1e-4)


def test_auto_method_selection(rng):
    # Small mesh -> same result whichever path auto picks; exercise both cutoffs
    verts, faces = cube_mesh(1.0)
    cam = _cam()
    auto = ras.rasterize(verts, faces, cam, (32, 32), method="auto")
    scan = ras.rasterize(verts, faces, cam, (32, 32), method="scan")
    np.testing.assert_array_equal(np.asarray(auto.pix_to_face),
                                  np.asarray(scan.pix_to_face))


def test_pairlist_binning_matches_topk(rng):
    """The sorted pair-list binning (no (T, F) top_k) selects the SAME
    per-tile face sets as the top_k binning — ascending face ids, big-face
    merge included — so the pallas render is unchanged."""
    verts, faces = random_mesh(rng, n_faces=300)
    # Add a few BIG faces (span > cap) to exercise the merge path
    big_verts = jnp.array([[-3, -3, 0.2], [3, -3, 0.2], [0, 3, 0.2],
                           [-3, 3, -0.2], [3, 3, -0.2], [0, -3, -0.2]],
                          jnp.float32)
    verts = jnp.concatenate([verts, big_verts])
    nb = 300 * 3
    faces = jnp.concatenate([
        faces, jnp.array([[nb, nb + 1, nb + 2], [nb + 3, nb + 4, nb + 5]],
                         jnp.int32)])
    cam = _cam(dist=5.0, elev=10.0, azim=70.0)
    vp = ras.project_verts_batch(verts, cam)
    tf_a, tv_a = ras._pairlist_bin(vp[0], faces, (40, 56), 16, 256)
    # Reference sets from the top_k path. K=512 so no tile overflows: under
    # overflow the paths truncate differently BY DESIGN (topk drops the
    # highest face ids including big faces; the pair path keeps big faces in
    # a separate uncapped pass and truncates only the small-face segments).
    a = ras.rasterize(verts, faces, cam, (40, 56), method="pallas", tile=16,
                      max_faces_per_tile=512, binning="topk")
    b = ras.rasterize(verts, faces, cam, (40, 56), method="pallas", tile=16,
                      max_faces_per_tile=512, binning="pairlist")
    np.testing.assert_array_equal(np.asarray(a.pix_to_face),
                                  np.asarray(b.pix_to_face))
    np.testing.assert_allclose(np.asarray(a.zbuf), np.asarray(b.zbuf),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.bary), np.asarray(b.bary),
                               atol=1e-6)
    # Per-tile lists ascend by face id (the z tie-break contract)
    tf = np.asarray(tf_a)
    tv = np.asarray(tv_a)
    for t in range(tf.shape[0]):
        row = tf[t][tv[t]]
        assert np.all(np.diff(row) > 0)


def test_pairlist_matches_scan_render(rng):
    """End-to-end: pairlist-binned pallas render == brute-force scan."""
    verts, faces = random_mesh(rng, n_faces=150)
    cam = _cam(dist=5.0)
    a = ras.rasterize(verts, faces, cam, (37, 53), method="scan")
    b = ras.rasterize(verts, faces, cam, (37, 53), method="pallas", tile=16,
                      binning="pairlist")
    same = np.asarray(a.pix_to_face)[0] == np.asarray(b.pix_to_face)[0]
    assert same.mean() > 0.999
    hit = np.asarray(a.pix_to_face)[0] >= 0
    np.testing.assert_allclose(np.asarray(a.zbuf)[0][same & hit],
                               np.asarray(b.zbuf)[0][same & hit], atol=1e-4)


def test_pallas_tile_kernel_matches_scan(rng):
    """The Pallas per-tile kernel (interpret mode on CPU) reproduces the
    brute-force scan exactly: face ids, zbuf, barycentrics."""
    verts, faces = random_mesh(rng, n_faces=120)
    cam = _cam(dist=5.0)
    a = ras.rasterize(verts, faces, cam, (37, 53), method="scan")
    b = ras.rasterize(verts, faces, cam, (37, 53), method="pallas", tile=16)
    hit = np.asarray(a.pix_to_face)[0] >= 0
    same = np.asarray(a.pix_to_face)[0] == np.asarray(b.pix_to_face)[0]
    assert same.mean() > 0.999
    np.testing.assert_allclose(np.asarray(a.zbuf)[0][same & hit],
                               np.asarray(b.zbuf)[0][same & hit], atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.bary)[0][same & hit],
                               np.asarray(b.bary)[0][same & hit], atol=1e-4)
