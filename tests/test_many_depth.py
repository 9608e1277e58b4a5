"""ManyDepth: shapes, cost-volume geometry, photometric loss, SSIM, pose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macarons_tpu.models import many_depth as md
from macarons_tpu.models import depth_losses as dl
from macarons_tpu.ops import geometry as geo
from macarons_tpu.ops import rasterizer as ras

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier

H, W = 64, 96


@pytest.fixture(scope="module")
def small_model():
    model = md.ManyDepth(input_height=H, input_width=W, d_min=0.5, d_max=20.0,
                         n_depth=16)
    B, A = 1, 2
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3))
    x_alpha = jax.random.uniform(jax.random.PRNGKey(1), (B, A, H, W, 3))
    R, T = geo.look_at_view_transform(dist=4.0, elev=10.0, azim=20.0)
    gt_pose = jnp.zeros((B, A, 6))
    variables = model.init(jax.random.PRNGKey(2), x, x_alpha, R, T,
                           gt_pose=gt_pose)
    return model, variables, x, x_alpha, R, T, gt_pose


def test_many_depth_shapes(small_model):
    model, variables, x, x_alpha, R, T, gt_pose = small_model
    pose, d1, d2, d3, d4 = model.apply(variables, x, x_alpha, R, T,
                                       gt_pose=gt_pose)
    assert d1.shape == (1, H, W, 1)
    assert d2.shape == (1, H // 2, W // 2, 1)
    assert d3.shape == (1, H // 4, W // 4, 1)
    assert d4.shape == (1, H // 8, W // 8, 1)
    for d in (d1, d2, d3, d4):
        arr = np.asarray(d)
        assert np.all((arr > 0) & (arr < 1))


def test_many_depth_param_count(small_model):
    model, variables, *_ = small_model
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    # ResNet18-based encoder/decoder: ~26M params like the reference wrapper
    assert 10e6 < n < 40e6


def _two_view_plane_setup():
    """A high-frequency-textured plane at z=0 seen from two cameras with a real
    baseline, with exact depth."""
    n = 17
    g = np.linspace(-6, 6, n).astype(np.float32)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    verts = jnp.array(
        np.stack((xx, yy, np.zeros_like(xx)), axis=-1).reshape(-1, 3))
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b = i * n + j, i * n + j + 1
            c, d = (i + 1) * n + j, (i + 1) * n + j + 1
            f += [(a, b, d), (a, d, c)]
    faces = jnp.array(f, jnp.int32)
    colors = jnp.array(
        np.random.default_rng(3).uniform(0.05, 0.95, (n * n, 3)), jnp.float32)
    R0, T0 = geo.look_at_view_transform(dist=5.0, elev=0.0, azim=0.0)
    Ra, Ta = geo.look_at_view_transform(
        dist=jnp.array([5.2, 5.1]), elev=jnp.array([14.0, -10.0]),
        azim=jnp.array([16.0, -18.0]))
    cam0 = geo.FoVCamera.create(R0, T0, fov=60.0, znear=0.5, zfar=20.0)
    cams_a = geo.FoVCamera.create(Ra, Ta, fov=60.0, znear=0.5, zfar=20.0)
    lights = ras.PointLights.create(jnp.array([[0.0, 0.0, 8.0]]), ambient=1.0,
                                    diffuse=0.0, specular=0.0)
    img0, frags0 = ras.render_mesh(verts, faces, cam0, (H, W), lights,
                                   vert_colors=colors)
    imgs_a, _ = ras.render_mesh(verts, faces, cams_a, (H, W), lights,
                                vert_colors=colors)
    depth0 = frags0.zbuf[..., None]
    mask0 = frags0.zbuf[..., None] > 0
    return img0, imgs_a[None], depth0, mask0, cam0, cams_a


def test_reconstruction_loss_zero_at_true_depth():
    img0, imgs_a, depth0, mask0, cam0, cams_a = _two_view_plane_setup()
    loss_true = float(dl.reconstruction_loss(
        img0, imgs_a, mask0, cam0, cams_a, depth0, ssim_factor=0.85,
        use_mask=True, zfar=20.0))
    loss_wrong = float(dl.reconstruction_loss(
        img0, imgs_a, mask0, cam0, cams_a, depth0 * 1.6, ssim_factor=0.85,
        use_mask=True, zfar=20.0))
    assert loss_true < 0.05, loss_true
    assert loss_wrong > loss_true * 2, (loss_true, loss_wrong)


def test_cost_volume_minimum_at_true_depth():
    """Feature cost volume must dip at the bin nearest the true plane depth."""
    img0, imgs_a, depth0, mask0, cam0, cams_a = _two_view_plane_setup()
    true_depth = float(depth0[0, H // 2, W // 2, 0])  # ~5.0 at the center

    cvb = md.CostVolumeBuilder(height=H, width=W, d_min=3.0, d_max=8.0,
                               n_depth=11, output_channels=8)
    # Use raw RGB images (downsampled) as "features"
    fh, fw = H // 4, W // 4
    feat0 = jax.image.resize(img0, (1, fh, fw, 3), "bilinear")
    feat_a = jax.image.resize(imgs_a[0], (2, fh, fw, 3), "bilinear")[None]
    variables = cvb.init(jax.random.PRNGKey(0), feat0, cam0.R, cam0.T, feat_a,
                         cams_a.R[None], cams_a.T[None])
    _, cost = cvb.apply(variables, feat0, cam0.R, cam0.T, feat_a,
                        cams_a.R[None], cams_a.T[None],
                        return_cost_volume=True)
    cost = np.asarray(cost)[0]  # (fh, fw, D)
    bins = np.linspace(3.0, 8.0, 11)
    # Check central region argmin bins
    center = cost[fh // 2 - 2 : fh // 2 + 2, fw // 2 - 2 : fw // 2 + 2]
    best = bins[np.argmin(center, axis=-1)]
    # Median argmin bin hits the true depth; individual low-texture pixels may
    # stray one bin.
    assert abs(np.median(best) - true_depth) <= 0.6, best
    assert (np.abs(best - true_depth) <= 0.6).mean() >= 0.75, best


def test_ssim_properties(rng):
    x = jnp.array(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(md.ssim(x, x)), 0.0, atol=1e-5)
    y = jnp.array(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    s = np.asarray(md.ssim(x, y))
    assert np.all((s >= 0) & (s <= 1))
    assert s.mean() > 0.05


def test_pose_conversion_roundtrip():
    R, T = geo.look_at_view_transform(dist=4.0, elev=10.0, azim=20.0)
    Ra, Ta = geo.look_at_view_transform(
        dist=jnp.array([4.3, 3.8]), elev=jnp.array([12.0, 8.0]),
        azim=jnp.array([25.0, 15.0]))
    pose = dl.convert_matrix_to_pose(R, T, Ra[None], Ta[None], pose_factor=100.0)
    assert pose.shape == (1, 2, 6)
    # Recompose inside ManyDepth's formula: R_alpha = R @ rel_R etc.
    rel_R = geo.matrix_from_axis_angle(100.0 * pose[..., 3:])
    rel_T = 100.0 * pose[..., :3]
    R2, T2 = geo.compose_pose(
        jnp.broadcast_to(R[:, None], (1, 2, 3, 3)),
        jnp.broadcast_to(T[:, None], (1, 2, 3)), rel_R, rel_T)
    np.testing.assert_allclose(np.asarray(R2)[0], np.asarray(Ra), atol=1e-4)
    np.testing.assert_allclose(np.asarray(T2)[0], np.asarray(Ta), atol=1e-4)


def test_regularity_losses(rng):
    disp = jnp.array(rng.uniform(0, 1, (1, 10, 12, 1)), jnp.float32)
    img = jnp.array(rng.uniform(0, 1, (1, 10, 12, 3)), jnp.float32)
    r = float(dl.regularity_loss(disp, img))
    assert r > 0
    # Constant disparity -> zero smoothness penalty
    assert float(dl.regularity_loss(jnp.ones_like(disp), img)) == 0.0
    tab = dl.regularity_tab(disp, img)
    assert tab.shape == (1, 8, 10, 1)


def test_resnet_conversion_structure():
    """A synthetic torch-style state dict converts into trees whose leaf shapes
    match the flax modules."""
    from macarons_tpu.models import resnet as rn

    rs = np.random.default_rng(0)

    def conv(o, i, k):
        return rs.normal(size=(o, i, k, k)).astype(np.float32)

    def bn_stat(stat, n):
        v = rs.normal(size=(n,)).astype(np.float32)
        return np.abs(v) + 0.5 if stat == "running_var" else v

    sd = {"conv1.weight": conv(64, 3, 7)}
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{stat}"] = bn_stat(stat, 64)
    chans = {"layer1": (64, 64), "layer2": (64, 128), "layer3": (128, 256),
             "layer4": (256, 512)}
    for li, (layer, (cin, cout)) in enumerate(chans.items()):
        for b in range(2):
            i0 = cin if b == 0 else cout
            sd[f"{layer}.{b}.conv1.weight"] = conv(cout, i0, 3)
            sd[f"{layer}.{b}.conv2.weight"] = conv(cout, cout, 3)
            for bn in ("bn1", "bn2"):
                for stat in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{layer}.{b}.{bn}.{stat}"] = bn_stat(stat, cout)
        if li > 0:
            sd[f"{layer}.0.downsample.0.weight"] = conv(cout, cin, 1)
            for stat in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{layer}.0.downsample.1.{stat}"] = bn_stat(stat, cout)

    converted = rn.convert_torch_resnet18(sd)

    fe = rn.FeatureExtractor()
    variables = fe.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # Graft stem + layer1 into the FeatureExtractor tree and run it.
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    sp, sb = converted["stem"]
    lp, lb = converted["layer1"]

    def check_and_set(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                check_and_set(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = v

    check_and_set(params["stem"], sp)
    check_and_set(params["layer1"], lp)
    check_and_set(stats["stem"], sb)
    check_and_set(stats["layer1"], lb)
    out = fe.apply({"params": params, "batch_stats": stats},
                   jnp.ones((1, 32, 32, 3)))
    assert out.shape == (1, 8, 8, 64)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bf16_compute_dtype():
    """ManyDepth(dtype=bfloat16): identical f32 param tree (checkpoints
    interchange), finite disparities close to the f32 path, f32 outputs
    (disparity heads and geometry never run in bf16)."""
    import jax

    H, W, D = 64, 96, 8
    kk = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.uniform(kk[0], (1, H, W, 3))
    xa = jax.random.uniform(kk[1], (1, 2, H, W, 3))
    R = jnp.eye(3)[None]
    T = jnp.zeros((1, 3))
    gt_pose = jnp.zeros((1, 2, 6)).at[:, :, 0].set(0.002)

    dm32 = md.ManyDepth(input_height=H, input_width=W, n_depth=D, d_max=20.0)
    dm16 = md.ManyDepth(input_height=H, input_width=W, n_depth=D, d_max=20.0,
                     dtype=jnp.bfloat16)
    v = jax.jit(dm32.init)(kk[2], x, xa, R, T, gt_pose=gt_pose)
    # param trees identical: bf16 is computation-only
    v16 = jax.eval_shape(lambda: dm16.init(kk[2], x, xa, R, T,
                                           gt_pose=gt_pose))
    flat32 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v)
    flat16 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v16)
    assert jax.tree_util.tree_structure(flat32) == \
        jax.tree_util.tree_structure(flat16)
    assert flat32 == flat16

    out32 = dm32.apply(v, x, xa, R, T, gt_pose=gt_pose)
    out16 = dm16.apply(v, x, xa, R, T, gt_pose=gt_pose)
    for o32, o16 in zip(out32[1:], out16[1:]):
        assert o16.dtype == jnp.float32
        a32, a16 = np.asarray(o32), np.asarray(o16)
        assert np.isfinite(a16).all()
        # sigmoid disparities in (0,1): bf16 conv error stays small
        assert np.abs(a32 - a16).max() < 0.05, np.abs(a32 - a16).max()


def test_batched_stem_eval_equivalence(small_model):
    """ManyDepth(batched_stem=True): one batch-(1+A) feature-extractor call
    in eval mode — identical param tree and near-identical outputs to the
    split-call forward (BN uses running stats in eval, so the math is the
    same; only the conv batching differs)."""
    model, variables, x, x_alpha, R, T, gt_pose = small_model
    bmodel = md.ManyDepth(input_height=H, input_width=W, d_min=0.5,
                          d_max=20.0, n_depth=16, batched_stem=True)
    out = model.apply(variables, x, x_alpha, R, T, gt_pose=gt_pose)
    bout = bmodel.apply(variables, x, x_alpha, R, T, gt_pose=gt_pose)
    for o, b in zip(out[1:], bout[1:]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(b), atol=2e-6)
    # Train mode falls back to the split calls (BN batch statistics must
    # match the reference's per-call structure): same apply still works.
    tout, _ = bmodel.apply(variables, x, x_alpha, R, T, gt_pose=gt_pose,
                           train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(tout[1])).all()
