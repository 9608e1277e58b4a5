"""OBJ+MTL texture-atlas baking -> rendering round trip (VERDICT r1 item 8)."""

import numpy as np
import jax.numpy as jnp

from macarons_tpu.data.mesh_io import bake_texture_atlas, load_obj
from macarons_tpu.ops.geometry import FoVCamera, look_at_view_transform
from macarons_tpu.ops.rasterizer import PointLights, render_mesh


def _write_textured_quad(tmp_path):
    """A unit quad in the xy plane, textured left-half red / right-half blue."""
    from PIL import Image

    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = [255, 0, 0]
    tex[:, 4:] = [0, 0, 255]
    Image.fromarray(tex).save(tmp_path / "tex.png")
    (tmp_path / "mesh.mtl").write_text(
        "newmtl mat0\nKd 0.2 0.3 0.4\nmap_Kd tex.png\n")
    (tmp_path / "mesh.obj").write_text(
        "mtllib mesh.mtl\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0.0 0.0\nvt 1.0 0.0\nvt 1.0 1.0\nvt 0.0 1.0\n"
        "usemtl mat0\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    return tmp_path / "mesh.obj"


def test_load_obj_bakes_atlas(tmp_path):
    path = _write_textured_quad(tmp_path)
    mesh = load_obj(str(path), create_texture_atlas=True, texture_atlas_size=5)
    assert mesh.texture_atlas is not None
    assert mesh.texture_atlas.shape == (2, 5, 5, 3)
    # Triangle 1 = (v0, v1, v2) with uv (0,0),(1,0),(1,1).
    # Atlas texel (0, 0) has bary (w0=0, w1=0, w2=1) -> uv of the THIRD vertex
    # (1,1) = top-right of the texture = blue
    np.testing.assert_allclose(mesh.texture_atlas[0, 0, 0], [0, 0, 1], atol=0.1)
    # Texel (0, R-1): bary (0, 1, 0) -> uv (1,0) = bottom-right = blue
    np.testing.assert_allclose(mesh.texture_atlas[0, 0, 4], [0, 0, 1], atol=0.1)
    # Texel (R-1, 0): bary (1, 0, 0) -> uv (0,0) = bottom-left = red
    np.testing.assert_allclose(mesh.texture_atlas[0, 4, 0], [1, 0, 0], atol=0.1)


def test_untextured_material_uses_kd(tmp_path):
    (tmp_path / "m.mtl").write_text("newmtl red\nKd 0.9 0.1 0.1\n")
    (tmp_path / "m.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl red\nf 1 2 3\n")
    mesh = load_obj(str(tmp_path / "m.obj"), create_texture_atlas=True)
    assert mesh.texture_atlas.shape[0] == 1
    np.testing.assert_allclose(mesh.texture_atlas[0, 0, 0], [0.9, 0.1, 0.1],
                               atol=1e-5)


def test_mirror_remaps_atlas(tmp_path):
    """Atlas-aware mirroring (VERDICT r2 Missing #5): a mirrored textured mesh
    rendered from the mirrored camera is the horizontal mirror image of the
    original render — the winding flip's barycentric-role swap is compensated
    by the atlas remap. Also: double mirror round-trips the atlas exactly."""
    import jax.numpy as jnp

    from macarons_tpu.data.mesh_io import (
        _remap_atlas_winding_flip, mirror_mesh,
    )

    path = _write_textured_quad(tmp_path)
    mesh = load_obj(str(path), create_texture_atlas=True, texture_atlas_size=8)

    # Round trip: two winding flips restore the atlas (interior texels exact)
    twice = _remap_atlas_winding_flip(_remap_atlas_winding_flip(
        mesh.texture_atlas))
    np.testing.assert_allclose(twice, mesh.texture_atlas, atol=1e-5)

    lights = PointLights.create(jnp.zeros((1, 3)), ambient=1.0, diffuse=0.0,
                                specular=0.0)

    def render(m, eye):
        R, T = look_at_view_transform(eye=jnp.asarray([eye]),
                                      at=jnp.zeros((1, 3)))
        cam = FoVCamera.create(R, T, zfar=10.0)
        img, frags = render_mesh(
            jnp.asarray(m.verts), jnp.asarray(m.faces), cam, (48, 48), lights,
            texture_atlas=jnp.asarray(m.texture_atlas), background=0.0)
        return np.asarray(img)[0], np.asarray(frags.pix_to_face)[0] >= 0

    eye = [0.3, 0.4, 2.0]  # off-axis to catch orientation mistakes
    img0, hit0 = render(mesh, eye)
    mirrored = mirror_mesh(mesh, [0])
    img1, hit1 = render(mirrored, [-eye[0], eye[1], eye[2]])
    flipped = img1[:, ::-1]
    hit_both = hit0 & hit1[:, ::-1]
    assert hit_both.mean() > 0.3
    # Edge pixels can disagree by rasterization ties; interior must match
    diff = np.abs(img0 - flipped)[hit_both]
    assert np.quantile(diff, 0.95) < 0.05, diff.mean()

    # Control: WITHOUT the remap the mirrored render shows wrong texels
    wrong = mirrored._replace(texture_atlas=mesh.texture_atlas)
    img2, _ = render(wrong, [-eye[0], eye[1], eye[2]])
    assert np.abs(img0 - img2[:, ::-1])[hit_both].mean() > 0.05


def test_textured_render_shows_texture(tmp_path):
    """Rendering the baked atlas puts red on the left half of the image and
    blue on the right (matching the texture through the uv mapping)."""
    path = _write_textured_quad(tmp_path)
    mesh = load_obj(str(path), create_texture_atlas=True, texture_atlas_size=8)
    R, T = look_at_view_transform(dist=2.5, elev=jnp.array([0.0]),
                                  azim=jnp.array([180.0]))
    cam = FoVCamera.create(R, T, zfar=10.0)
    lights = PointLights.create(jnp.zeros((1, 3)), ambient=1.0, diffuse=0.0,
                                specular=0.0)
    images, frags = render_mesh(
        jnp.asarray(mesh.verts), jnp.asarray(mesh.faces), cam, (32, 32),
        lights, texture_atlas=jnp.asarray(mesh.texture_atlas), background=0.0)
    img = np.asarray(images)[0]
    hit = np.asarray(frags.pix_to_face)[0] >= 0
    assert hit.mean() > 0.3
    ys, xs = np.where(hit)
    mid = (xs.min() + xs.max()) / 2
    left = img[ys[xs < mid - 2], xs[xs < mid - 2]]
    right = img[ys[xs > mid + 2], xs[xs > mid + 2]]
    # One side dominated by red, the other by blue (orientation depends on the
    # camera convention; accept either assignment but demand separation)
    lr, lb = left[:, 0].mean(), left[:, 2].mean()
    rr, rb = right[:, 0].mean(), right[:, 2].mean()
    assert (lr > 0.7 and rb > 0.7) or (lb > 0.7 and rr > 0.7)
    assert abs(lr - rr) > 0.5
