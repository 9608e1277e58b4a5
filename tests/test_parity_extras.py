"""Parity extras: RGBDataset, stats-matched init, texture atlas sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from macarons_tpu.ops import geometry as geo
from macarons_tpu.ops import rasterizer as ras


def test_rgb_dataset_alpha_lookup(tmp_path):
    from macarons_tpu.data.datasets import RGBDataset

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(6):
        np.savez(d / f"{i}.npz", rgb=np.zeros(1))
    ds = RGBDataset([str(d)], alphas=[-2, -1])
    # Frames 0 and 1 lack both alpha neighbors
    assert len(ds) == 4
    item = ds[0]
    assert item["frame"].endswith("2.npz")
    assert [p.split("/")[-1] for p in item["alpha_frames"]] == ["0.npz", "1.npz"]
    # Blacklist removal
    ds2 = RGBDataset([str(d)], alphas=[-2, -1],
                     frames_to_remove=[str(d / "3.npz")])
    assert len(ds2) == 3


def test_stats_matched_init(rng):
    from macarons_tpu.models.attention import stats_matched_init

    params = {"a": {"kernel": jnp.zeros((16, 16)), "bias": jnp.ones((16,))}}
    ref = {"a": {"kernel": jnp.array(
        rng.normal(3.0, 0.5, (16, 16)), jnp.float32),
        "bias": jnp.zeros((16,))}}
    out = stats_matched_init(params, ref, jax.random.PRNGKey(0))
    k = np.asarray(out["a"]["kernel"])
    assert abs(k.mean() - 3.0) < 0.3 and abs(k.std() - 0.5) < 0.2
    np.testing.assert_array_equal(np.asarray(out["a"]["bias"]), 1.0)  # bias kept


def test_texture_atlas_sampling():
    # Two triangles, each with a constant-color 4x4 atlas.
    verts = jnp.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                      jnp.float32)
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    atlas = jnp.stack([
        jnp.full((4, 4, 3), jnp.array([1.0, 0.0, 0.0])),
        jnp.full((4, 4, 3), jnp.array([0.0, 1.0, 0.0])),
    ])
    R, T = geo.look_at_view_transform(dist=5.0, elev=0.0, azim=0.0)
    cam = geo.FoVCamera.create(R, T, fov=60.0, znear=0.5, zfar=20.0)
    lights = ras.PointLights.create(jnp.zeros((1, 3)), ambient=1.0,
                                    diffuse=0.0, specular=0.0)
    img, frags = ras.render_mesh(verts, faces, cam, (24, 24), lights,
                                 texture_atlas=atlas)
    img = np.asarray(img)[0]
    p2f = np.asarray(frags.pix_to_face)[0]
    assert np.allclose(img[p2f == 0], [1, 0, 0], atol=1e-5)
    assert np.allclose(img[p2f == 1], [0, 1, 0], atol=1e-5)
    # Bilinear mode also runs
    tex = ras.sample_texture_atlas(frags, atlas, mode="bilinear")
    assert np.isfinite(np.asarray(tex)).all()
