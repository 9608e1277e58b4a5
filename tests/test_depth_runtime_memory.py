"""Depth runtime (apply_depth_model) + replay memory tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macarons_tpu.models.many_depth import ManyDepth
from macarons_tpu.scene import depth_runtime as DR
from macarons_tpu.scene import memory as M
from macarons_tpu.scene import camera as C
from macarons_tpu.ops import geometry as geo
from test_rasterizer import cube_mesh

pytestmark = pytest.mark.slow  # XLA CPU compile dominates; excluded from the smoke tier

H, W = 64, 96
CFG = DR.DepthBatchConfig(znear=0.5, zfar=20.0, data_augmentation=False,
                          regularity_factor=0.01)


def _capture_sequence(n=5):
    verts, faces = cube_mesh(1.0)
    ps = C.PoseSpace(np.array([-4.0, -4, -4]), np.array([4.0, 4, 4]),
                     4, 4, 4, 3, 8)
    cam = C.Camera(pose_space=ps, zfar=20.0, image_height=H, image_width=W,
                   n_interpolation_steps=1)
    rs = np.random.default_rng(0)
    cam.initialize(cam.get_random_valid_pose(rs, verts))
    frames = {"images": [], "zbuf": [], "mask": [], "R": [], "T": []}
    for _ in range(n):
        imgs, depth, mask = cam.capture_image(verts, faces)
        frames["images"].append(np.asarray(imgs))
        frames["zbuf"].append(np.asarray(depth))
        frames["mask"].append(np.asarray(mask))
        frames["R"].append(np.asarray(cam.fov_camera.R))
        frames["T"].append(np.asarray(cam.fov_camera.T))
        nbrs = cam.get_neighboring_poses()
        valid = cam.get_valid_neighbors(nbrs, verts)
        cam.update_camera(valid[rs.integers(0, len(valid))])
    out = {k: np.concatenate(v, axis=0) for k, v in frames.items()}
    out["zfar"] = np.full((n,), 20.0, np.float32)
    return out


@pytest.fixture(scope="module")
def frame_seq():
    return _capture_sequence(5)


def test_create_batch_shapes(frame_seq):
    batch, alpha = DR.create_batch_for_depth_model(CFG, frame_seq,
                                                   mode="inference")
    B = 5 - CFG.n_alpha
    assert batch["images"].shape == (B, H, W, 3)
    assert alpha["images"].shape == (B, 2, H, W, 3)
    # alpha frames are the two previous frames
    np.testing.assert_array_equal(
        np.asarray(alpha["images"][1, 1]), frame_seq["images"][2])
    np.testing.assert_array_equal(
        np.asarray(alpha["images"][1, 0]), frame_seq["images"][1])


def test_apply_depth_model_losses(frame_seq):
    batch, alpha = DR.create_batch_for_depth_model(CFG, frame_seq,
                                                   mode="supervision")
    model = ManyDepth(input_height=H, input_width=W, d_min=0.5, d_max=20.0,
                      n_depth=8)
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"], alpha["images"][:, :2],
        batch["R"], batch["T"], gt_pose=jnp.zeros((batch["R"].shape[0], 2, 6)),
    )
    run = DR.make_apply_depth_fn(model, CFG, compute_loss=True)
    loss, depth, mask, err_mask, pose, gt_pose, _ = run(
        variables, batch, alpha, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert depth.shape == (3, H, W, 1)
    d = np.asarray(depth)
    assert d.min() >= 0.5 - 1e-5 and d.max() <= 20.0 + 1e-5
    assert err_mask.dtype == bool and 0 < np.asarray(err_mask).mean() <= 1.0
    # gt_pose roundtrip: with learn_pose=False the returned pose is gt_pose
    np.testing.assert_allclose(np.asarray(pose), np.asarray(gt_pose)[:, :2],
                               atol=1e-6)


def test_perfect_depth_bypass(frame_seq):
    batch, alpha = DR.create_batch_for_depth_model(CFG, frame_seq,
                                                   mode="supervision")
    model = ManyDepth(input_height=H, input_width=W, d_min=0.5, d_max=20.0,
                      n_depth=8)
    run = DR.make_apply_depth_fn(model, CFG, compute_loss=False,
                                 use_perfect_depth=True)
    _, depth, mask, err, pose, gt, _ = run({}, batch, alpha,
                                           jax.random.PRNGKey(0))
    # Depth equals the clamped GT zbuf
    np.testing.assert_allclose(
        np.asarray(depth), np.clip(np.asarray(batch["zbuf"]), 0.5, 20.0),
        atol=1e-6)


def test_symmetry_conjugation_consistency(frame_seq):
    """Flipped pose must reproject the flipped image consistently: check that
    F R F is a valid rotation and camera center x is mirrored."""
    R = jnp.asarray(frame_seq["R"][:1])
    T = jnp.asarray(frame_seq["T"][:1])
    x = jnp.asarray(frame_seq["images"][:1])
    fx, fR, fT, _ = DR.apply_symmetry(x, R, T)
    I = np.asarray(fR[0] @ fR[0].T)
    np.testing.assert_allclose(I, np.eye(3), atol=1e-5)
    C0 = np.asarray(geo.camera_center_from_RT(R, T))[0]
    C1 = np.asarray(geo.camera_center_from_RT(fR, fT))[0]
    np.testing.assert_allclose(C1, C0 * np.array([-1, 1, 1]), atol=1e-5)


def test_jitter_preserves_range():
    x = jnp.array(np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)),
                  jnp.float32)
    y = DR.adjust_image(x, 1.2, 0.9, 1.1, 0.03)
    y = np.asarray(y)
    assert y.min() >= 0 and y.max() <= 1


def test_memory_roundtrip(tmp_path, frame_seq):
    mem = M.Memory([str(tmp_path / "scene")], n_trajectories=2)
    sp = str(tmp_path / "scene")
    for i in range(5):
        mem.save_frame(sp, i, frame_seq["images"][i : i + 1],
                       frame_seq["zbuf"][i : i + 1],
                       frame_seq["mask"][i : i + 1], frame_seq["R"][i : i + 1],
                       frame_seq["T"][i : i + 1], 20.0)
    assert mem.n_frames(sp) == 5
    seq = mem.load_frame_sequence(sp, 4, 3)
    assert seq["images"].shape == (3, H, W, 3)
    np.testing.assert_array_equal(seq["images"][0], frame_seq["images"][2])

    # Replay sampling: excludes the in-progress trajectory
    rs = np.random.default_rng(0)
    got = mem.get_random_frames_for_depth(rs, sp, 3, exclude_traj=0)
    assert got is None  # only traj 0 has frames
    got = mem.get_random_frames_for_depth(rs, sp, 3, exclude_traj=1)
    assert got is not None and got[0] == 0 and got[1] >= 2

    # Scene snapshots
    from macarons_tpu.scene.grid import GridState
    from macarons_tpu.scene.proxy import initialize_proxy_points

    gs = GridState(np.zeros((4, 8, 3)), np.zeros((4, 8, 1)),
                   np.ones((4, 8), bool))
    mem.save_surface_scene(sp, gs, x_min=np.array([-1.0, -1, -1]))
    loaded, params = mem.load_surface_scene(sp)
    np.testing.assert_array_equal(loaded.valid, gs.valid)
    np.testing.assert_array_equal(params["x_min"], [-1, -1, -1])

    prox = initialize_proxy_points(jax.random.PRNGKey(0), [-1] * 3, [1] * 3, 50)
    mem.save_occupancy_field(sp, prox)
    loaded_prox, _ = mem.load_occupancy_field(sp)
    np.testing.assert_array_equal(loaded_prox.points, np.asarray(prox.points))


def test_frame_ring_matches_memory(tmp_path, frame_seq):
    """The device frame ring holds exactly the newest frames in the same
    order and schema as the on-disk frame memory, and save_frame_batch writes
    per-frame files identical to the per-frame save path — so the fused pose
    loop (ring) and the replay loops (disk) see the same data."""
    L = 4
    ring = DR.init_frame_ring(L, H, W, 20.0)
    # Push frames 0-1 then 2-4 as two batches (exercises the keep-newest-L
    # concat: frame 0 must fall out).
    for lo, hi in ((0, 2), (2, 5)):
        ring = DR.ring_push(
            ring, jnp.asarray(frame_seq["images"][lo:hi]),
            jnp.asarray(frame_seq["zbuf"][lo:hi]),
            jnp.asarray(frame_seq["mask"][lo:hi]).astype(bool),
            jnp.asarray(frame_seq["R"][lo:hi]),
            jnp.asarray(frame_seq["T"][lo:hi]), 20.0)

    mem = M.Memory([str(tmp_path / "scene")])
    sp = str(tmp_path / "scene")
    mem.save_frame_batch(sp, 0, frame_seq["images"][:2], frame_seq["zbuf"][:2],
                         frame_seq["mask"][:2], frame_seq["R"][:2],
                         frame_seq["T"][:2], 20.0)
    mem.save_frame_batch(sp, 2, frame_seq["images"][2:], frame_seq["zbuf"][2:],
                         frame_seq["mask"][2:], frame_seq["R"][2:],
                         frame_seq["T"][2:], 20.0)
    disk = mem.load_frame_sequence(sp, 4, 3)

    got = DR.ring_frames(ring, 3)
    for k in ("images", "zbuf", "mask", "R", "T", "zfar"):
        np.testing.assert_array_equal(np.asarray(got[k]), disk[k], err_msg=k)
    # Batches built from either source are interchangeable
    b_ring, a_ring = DR.create_batch_for_depth_model(CFG, DR.ring_frames(ring, 4))
    b_disk, a_disk = DR.create_batch_for_depth_model(
        CFG, mem.load_frame_sequence(sp, 4, 4))
    np.testing.assert_allclose(np.asarray(b_ring["images"]),
                               np.asarray(b_disk["images"]))
    np.testing.assert_allclose(np.asarray(a_ring["images"]),
                               np.asarray(a_disk["images"]))


def test_macarons_bundle(tmp_path):
    from macarons_tpu.config import Params
    from macarons_tpu.models import macarons as MM

    params = Params({
        "image_height": H, "image_width": W, "znear": 0.5, "zfar": 20.0,
        "n_depth": 8, "seq_len": 64, "learning_rate": 1e-4,
    })
    model = MM.create_macarons_model(params)
    variables = MM.init_macarons_variables(params, model, jax.random.PRNGKey(0))
    opt = MM.create_macarons_optimizer(params, variables)
    opt_states = {"depth": opt.depth_opt_state, "scone": opt.scone_opt_state}
    path = str(tmp_path / "macarons_ckpt")
    MM.save_macarons(path, variables, {"epoch": 3}, opt_states=opt_states)
    v2, opt2, meta = MM.load_macarons(path, variables, opt_states=opt_states)
    assert meta["epoch"] == 3
    a = jax.tree_util.tree_leaves(variables.vis)[0]
    b = jax.tree_util.tree_leaves(v2.vis)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scone_replay_sampling(tmp_path, rng):
    """Build split + snapshot pseudo-GT of the scone replay sampler (reference
    get_random_scene_for_scone_model :3324-3457: the saved occupancy field
    supplies the replay's pseudo-GT and carving counters)."""
    import jax.numpy as jnp

    from macarons_tpu.scene.memory import Memory
    from macarons_tpu.scene.proxy import initialize_proxy_points

    sp = str(tmp_path / "scene")
    mem = Memory([sp], current_epoch=1, n_trajectories=2)
    # Trajectory 0 holds snapshots + 12 consecutive depths
    d = np.zeros((1, 8, 8, 1), np.float32)
    for nb in range(12):
        mem.save_depth(sp, nb, d, d > 0, d > 0, np.eye(3)[None], np.zeros((1, 3)),
                       traj=0)
    np.savez(tmp_path / "scene" / "training" / "0" / "surface" / "scene.npz",
             points=np.zeros((1, 1, 3)), features=np.zeros((1, 1, 1)),
             valid=np.zeros((1, 1), bool))
    prox = initialize_proxy_points(jax.random.PRNGKey(0), [-1] * 3, [1] * 3, 50)
    occ = np.zeros((50, 1), np.float32)
    occ[::2] = 1.0  # carved-occupied on even indices
    oof = np.ones((50, 1), np.float32)
    oof[:30] = 0.0  # first 30 points were seen
    prox = prox._replace(
        supervision_occ=jnp.asarray(occ), out_of_field=jnp.asarray(oof),
        n_inside_fov=jnp.full((50, 1), 3.0), n_behind_depth=jnp.full((50, 1), 2.0))
    mem.save_occupancy_field(sp, prox, traj=0)

    got = mem.get_random_scene_for_scone(rng, sp, n_supervise=3, n_loops=2,
                                         max_build=5, exclude_traj=1)
    assert got is not None
    traj, build, info = got
    assert traj == 0
    assert 1 <= len(build) <= 4  # reference randint(1, max) is hi-exclusive
    assert build == list(range(build[0], build[0] + len(build)))
    # 2 windows of 3 supervision depths each fit after the build without clamp
    assert build[-1] + 2 * (3 - 1) <= 11

    # pseudo-GT = (supervision_occ > 0) & (out_of_field < 1) from the snapshot
    # (reference save_occupancy_field_in_memory :631-632)
    expected = ((occ > 0) & (oof < 1)).astype(np.float32)
    np.testing.assert_array_equal(info["pseudo_gt"], expected)
    np.testing.assert_array_equal(info["n_inside_fov"], np.full((50, 1), 3.0))
    np.testing.assert_array_equal(info["n_behind_depth"], np.full((50, 1), 2.0))
    assert info["n_depths"] == 12

    # A snapshot from a different proxy layout is skipped
    assert mem.get_random_scene_for_scone(
        rng, sp, 3, n_proxy_points=49, exclude_traj=1) is None
    # exclude the only populated trajectory -> nothing replayable
    assert mem.get_random_scene_for_scone(rng, sp, 3, exclude_traj=0) is None
