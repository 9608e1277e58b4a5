import numpy as np
import jax
import jax.numpy as jnp

from macarons_tpu.ops import sampling


def _unit_square_mesh():
    # Two triangles covering [0,1]^2 in the z=0 plane.
    verts = jnp.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


def test_face_areas():
    verts, faces = _unit_square_mesh()
    areas = np.asarray(sampling.compute_mesh_face_area(verts, faces))
    np.testing.assert_allclose(areas, [0.5, 0.5], atol=1e-6)


def test_surface_sampling_uniform():
    verts, faces = _unit_square_mesh()
    pts = sampling.sample_points_on_mesh_surface(
        jax.random.PRNGKey(0), verts, faces, 20000
    )
    pts = np.asarray(pts)
    assert pts.shape == (20000, 3)
    assert np.all(pts[:, 2] == 0)
    assert np.all((pts[:, :2] >= 0) & (pts[:, :2] <= 1))
    # Uniform over the square: mean ~ (0.5, 0.5), both triangles hit equally
    np.testing.assert_allclose(pts[:, :2].mean(0), [0.5, 0.5], atol=0.02)
    upper = (pts[:, 1] > pts[:, 0]).mean()  # fraction in the second triangle
    assert 0.45 < upper < 0.55


def test_area_weighted_triangle_selection():
    # One big triangle (area 2) + one small (area 0.005): sampling should be ~400:1
    verts = jnp.array(
        [[0, 0, 0], [2, 0, 0], [0, 2, 0], [5, 0, 0], [5.1, 0, 0], [5, 0.1, 0]],
        jnp.float32,
    )
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    idx = np.asarray(
        sampling.sample_mesh_triangle(jax.random.PRNGKey(1), verts, faces, 10000)
    )
    frac_small = (idx == 1).mean()
    assert frac_small < 0.01


def test_face_mask_zeroes_probability():
    verts, faces = _unit_square_mesh()
    mask = jnp.array([True, False])
    idx = np.asarray(
        sampling.sample_mesh_triangle(jax.random.PRNGKey(2), verts, faces, 1000,
                                      face_mask=mask)
    )
    assert np.all(idx == 0)


def test_vertex_feature_interpolation():
    verts, faces = _unit_square_mesh()
    colors = jnp.array(verts[:, :2])  # feature = xy coords
    pts, feats = sampling.sample_points_on_mesh_surface(
        jax.random.PRNGKey(3), verts, faces, 500, vert_features=colors
    )
    np.testing.assert_allclose(np.asarray(feats), np.asarray(pts)[:, :2], atol=1e-5)


def test_ball_box_samplers():
    box = np.asarray(sampling.sample_X_in_box(jax.random.PRNGKey(4), 2.0, 5000))
    assert np.all(np.abs(box) <= 1.0)
    ball = np.asarray(sampling.sample_X_in_ball(jax.random.PRNGKey(5), 3.0, 5000))
    r = np.linalg.norm(ball, axis=-1)
    assert np.all(r <= 3.0)
    # Reference semantics (utils.py:1271-1276): radius = R*sqrt(U), i.e. NOT
    # volume-uniform; E[(r/R)^3] = E[U^1.5] = 0.4.
    np.testing.assert_allclose(np.mean((r / 3.0) ** 3), 0.4, atol=0.03)


def test_random_subsample_mask():
    mask = jnp.array([True] * 5 + [False] * 95)
    idx, valid = sampling.random_subsample_mask(jax.random.PRNGKey(6), mask, 8)
    assert np.asarray(valid).sum() == 5
    assert np.all(np.asarray(idx)[np.asarray(valid)] < 5)
