import numpy as np
import jax.numpy as jnp

from macarons_tpu.ops import geometry as geo
from macarons_tpu.ops import rasterizer as ras
from macarons_tpu.ops import projection as proj


def cube_mesh(half=1.0):
    v = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)],
        np.float32,
    )
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # x- / x+
        (0, 4, 5, 1), (2, 3, 7, 6),  # y- / y+
        (0, 2, 6, 4), (1, 5, 7, 3),  # z- / z+
    ]
    f = []
    for a, b, c, d in quads:
        f += [(a, b, c), (a, c, d)]
    return jnp.array(v), jnp.array(f, jnp.int32)


def _cam(dist=4.0, elev=0.0, azim=0.0, fov=60.0):
    R, T = geo.look_at_view_transform(dist=dist, elev=elev, azim=azim)
    return geo.FoVCamera.create(R, T, fov=fov, znear=0.5, zfar=20.0)


def test_single_triangle_center_depth():
    verts = jnp.array([[-1, -1, 0], [1, -1, 0], [0, 1.5, 0]], jnp.float32)
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    cam = _cam(dist=3.0)
    frags = ras.rasterize(verts, faces, cam, (32, 32))
    zb = np.asarray(frags.zbuf)[0]
    center = zb[16, 16]
    np.testing.assert_allclose(center, 3.0, atol=0.01)
    # Corners empty
    assert zb[0, 0] == -1 and zb[-1, -1] == -1
    assert np.asarray(frags.pix_to_face)[0, 16, 16] == 0


def test_nearer_face_wins():
    verts = jnp.array(
        [[-1, -1, 0], [1, -1, 0], [0, 1.5, 0],
         [-1, -1, 1], [1, -1, 1], [0, 1.5, 1]], jnp.float32
    )
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    cam = _cam(dist=3.0)  # camera at z=3 looking at origin: z=1 plane is closer
    frags = ras.rasterize(verts, faces, cam, (16, 16))
    assert np.asarray(frags.pix_to_face)[0, 8, 8] == 1
    np.testing.assert_allclose(np.asarray(frags.zbuf)[0, 8, 8], 2.0, atol=0.01)


def test_cube_depth_and_backprojection():
    verts, faces = cube_mesh(1.0)
    cam = _cam(dist=4.0, elev=20.0, azim=30.0)
    frags = ras.rasterize(verts, faces, cam, (64, 64))
    zb = np.asarray(frags.zbuf)[0]
    hit = zb > 0
    assert 0.05 < hit.mean() < 0.9
    # Backproject hits onto the cube surface: max|coord| == 1
    pts, mask = proj.project_depth_back_to_3D(frags.zbuf[..., None], cam)
    p = np.asarray(pts)[0][np.asarray(mask)[0]]
    np.testing.assert_allclose(np.abs(p).max(axis=-1), 1.0, atol=5e-3)
    # Depth range within [dist - sqrt(3), dist + sqrt(3)] (near corner..far corner;
    # silhouette-edge pixels see past the near faces onto the far ones)
    assert zb[hit].min() > 4.0 - np.sqrt(3) - 0.02
    assert zb[hit].max() < 4.0 + np.sqrt(3) + 0.02


def test_orthographic_plane():
    verts = jnp.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], jnp.float32)
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    R, T = geo.look_at_view_transform(dist=5.0, elev=0.0, azim=0.0)
    cam = geo.OrthoCamera.create(R, T, znear=0.5, zfar=20.0)
    frags = ras.rasterize(verts, faces, cam, (32, 32))
    zb = np.asarray(frags.zbuf)[0]
    # Ortho NDC box is [-1,1]^2: the 4x4 plane covers everything at z=5
    np.testing.assert_allclose(zb, 5.0, atol=1e-4)


def test_vertex_color_interpolation():
    verts = jnp.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], jnp.float32)
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    colors = (verts + 2.0) / 4.0  # color encodes position
    cam = _cam(dist=5.0)
    lights = ras.PointLights.create(
        jnp.array([[0.0, 0.0, 5.0]]), ambient=1.0, diffuse=0.0, specular=0.0
    )
    images, frags = ras.render_mesh(
        verts, faces, cam, (24, 24), lights, vert_colors=colors
    )
    img = np.asarray(images)[0]
    # With ambient-only white light, image = interpolated vertex color.
    pos = np.asarray(ras.interpolate_face_attributes(frags, verts[faces]))[0]
    hit = np.asarray(frags.pix_to_face)[0] >= 0
    expected = (pos[hit] + 2.0) / 4.0
    np.testing.assert_allclose(img[hit], expected, atol=1e-4)


def test_diffuse_lighting_direction():
    # Plane facing +z, light along +z -> full diffuse; light along +x -> none.
    verts = jnp.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], jnp.float32)
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    cam = _cam(dist=5.0)
    img_front, frags = ras.render_mesh(
        verts, faces, cam, (16, 16),
        ras.PointLights.create(jnp.array([[0.0, 0.0, 9.0]]), ambient=0.0,
                               diffuse=1.0, specular=0.0),
    )
    img_side, _ = ras.render_mesh(
        verts, faces, cam, (16, 16),
        ras.PointLights.create(jnp.array([[1000.0, 0.0, 0.001]]), ambient=0.0,
                               diffuse=1.0, specular=0.0),
    )
    hit = np.asarray(frags.pix_to_face)[0] >= 0
    assert np.asarray(img_front)[0][hit].mean() > 0.9
    assert np.asarray(img_side)[0][hit].mean() < 0.05


def test_watertight_silhouette_no_holes():
    verts, faces = cube_mesh(1.0)
    cam = _cam(dist=4.0, elev=35.0, azim=45.0)
    frags = ras.rasterize(verts, faces, cam, (64, 64))
    hit = np.asarray(frags.zbuf)[0] > 0
    # Interior of the silhouette must have no holes: every hit pixel's 4-neighborhood
    # within the eroded region is also hit.
    from scipy import ndimage

    filled = ndimage.binary_fill_holes(hit)
    np.testing.assert_array_equal(hit, filled)
