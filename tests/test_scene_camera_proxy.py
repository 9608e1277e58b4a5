"""Camera pose lattice + proxy field tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from macarons_tpu.scene import camera as C
from macarons_tpu.scene import proxy as P
from test_rasterizer import cube_mesh


@pytest.fixture
def pose_space():
    return C.PoseSpace(
        x_min=np.array([-4, -4, -4]), x_max=np.array([4, 4, 4]),
        pose_l=4, pose_w=4, pose_h=4, pose_n_elev=3, pose_n_azim=8,
    )


@pytest.fixture
def camera(pose_space):
    return C.Camera(pose_space=pose_space, zfar=20.0, image_height=32,
                    image_width=48, n_interpolation_steps=2)


def test_pose_shifts():
    s = C.POSE_SHIFTS
    assert s.shape[1] == 5
    assert np.all(np.abs(s[:, :3]).sum(1) == 1)
    assert np.all(np.abs(s[:, 3:]).sum(1) <= 1)
    # 6 unit translations x 5 rotation combos (total |d_rot|_1 <= 1)
    assert s.shape[0] == 6 * 5


def test_pose_from_idx(pose_space):
    pose = np.asarray(pose_space.pose_from_idx(jnp.array([0, 0, 0, 1, 2])))
    np.testing.assert_allclose(pose[:3], [-3, -3, -3], atol=1e-5)
    np.testing.assert_allclose(pose[3], -90 + 180 * 2 / 4)
    np.testing.assert_allclose(pose[4], 360 * 2 / 8)


def test_neighbors_translate_and_wrap(pose_space):
    n = pose_space.neighbors(np.array([0, 0, 0, 0, 0]))
    # All neighbors moved in position
    assert np.all(np.abs(n[:, :3] - [0, 0, 0]).sum(1) > 0)
    # Azimuth wraps: azim index 7 possible from 0
    assert (n[:, 4] == pose_space.pose_n_azim - 1).any()
    # In-bounds
    assert n[:, 0].min() >= 0 and n[:, 0].max() <= 1


def test_camera_RT_looks_along_view_direction():
    # elev=0, azim=0 -> looking direction = -[sin(180), 0, cos(180)] = +z
    X = jnp.array([[1.0, 2.0, 3.0]])
    V = jnp.array([[0.0, 0.0]])
    R, T = C.get_camera_RT(X, V)
    from macarons_tpu.ops.geometry import FoVCamera

    cam = FoVCamera.create(R, T)
    ahead = X + jnp.array([[0.0, 0.0, 5.0]])
    v = np.asarray(cam.world_to_view(ahead[None]))[0, 0]
    np.testing.assert_allclose(v, [0, 0, 5.0], atol=1e-5)


def test_update_camera_interpolation(camera):
    camera.initialize(np.array([0, 0, 0, 1, 0]))
    assert camera.pose_history.sum() == 1
    # half-step toward a neighbor
    camera.update_camera(np.array([1, 0, 0, 1, 1]), interpolation_step=1)
    X_half = np.asarray(camera.X_cam)[0]
    pose_a = np.asarray(camera.pose_space.pose_from_idx(jnp.array([0, 0, 0, 1, 0])))
    pose_b = np.asarray(camera.pose_space.pose_from_idx(jnp.array([1, 0, 0, 1, 1])))
    np.testing.assert_allclose(X_half, (pose_a[:3] + pose_b[:3]) / 2, atol=1e-5)
    # full step commits the pose
    camera.update_camera(np.array([1, 0, 0, 1, 1]))
    assert camera.pose_history.sum() == 2
    assert len(camera.X_cam_history) == 3


def test_azimuth_wrap_interpolation(camera):
    camera.initialize(np.array([0, 0, 0, 1, 7]))
    camera.update_camera(np.array([1, 0, 0, 1, 0]), interpolation_step=1)
    V = np.asarray(camera.V_cam)[0]
    # azim from 315 to 360 (wrapped), half-way = 337.5
    np.testing.assert_allclose(V[1], (315.0 + 360.0) / 2, atol=1e-4)


def test_pose_validity_and_capture(camera):
    verts, faces = cube_mesh(1.0)
    camera.initialize(np.array([0, 0, 1, 1, 1]))
    # A pose looking at the cube is valid; occupied mask can invalidate it
    valid_idx = None
    rs = np.random.default_rng(0)
    valid_idx = camera.get_random_valid_pose(rs, verts)
    assert camera.pose_is_valid(verts, valid_idx)
    occ = np.ones((4, 4, 4), bool)
    camera.occupied_poses = occ
    assert not camera.pose_is_valid(verts, valid_idx)
    camera.occupied_poses = None

    images, depth, mask = camera.capture_image(verts, faces)
    assert images.shape == (1, 32, 48, 3)
    assert depth.shape == (1, 32, 48, 1)
    assert bool(mask.any()) == bool((np.asarray(depth) > 0).any())


def test_proxy_state_updates():
    key = jax.random.PRNGKey(0)
    st = P.initialize_proxy_points(key, [-1, -1, -1], [1, 1, 1], 500)
    assert st.points.shape == (500, 3)
    fov_mask = jnp.arange(500) < 100
    X_cam = jnp.array([[0.0, 0.0, 5.0]])

    st = P.update_out_of_field(st, fov_mask)
    oof = np.asarray(st.out_of_field)[:, 0]
    assert oof[:100].sum() == 0 and oof[100:].sum() == 400

    st = P.update_view_states(st, X_cam, fov_mask, 7, 14)
    vs = np.asarray(st.view_states)
    assert vs[:100].sum() == 100  # one bin each
    assert vs[100:].sum() == 0

    # Carving: points in front of depth map get freed
    sd = jnp.where(jnp.arange(500)[:, None] < 50, -1.0, 1.0)  # first 50 in front
    st = P.update_supervision_occ(st, fov_mask, sd, score_threshold=1.0)
    occ = np.asarray(st.supervision_occ)[:, 0]
    assert occ[:50].sum() == 0
    assert occ[50:100].sum() == 50
    assert occ[100:].sum() == 400  # untouched


def test_camera_collision():
    key = jax.random.PRNGKey(1)
    st = P.initialize_proxy_points(key, [-1, -1, -1], [1, 1, 1], 2000)
    # All in-field and occupied
    st = st._replace(out_of_field=jnp.zeros_like(st.out_of_field))
    X_cur = jnp.array([-0.9, 0.0, 0.0])
    X_tgt = jnp.array([0.9, 0.0, 0.0])
    collides = P.camera_collides(st, [-1, -1, -1], [1, 1, 1], X_cur, X_tgt,
                                 proxy_distance=0.3, n_interpolation_steps=8)
    assert bool(collides)
    # Freed proxies (carved empty) -> no collision
    st2 = st._replace(supervision_occ=jnp.zeros_like(st.supervision_occ))
    assert not bool(P.camera_collides(st2, [-1, -1, -1], [1, 1, 1], X_cur, X_tgt,
                                      proxy_distance=0.3,
                                      n_interpolation_steps=8))
    # Target outside bbox -> never collides
    assert not bool(P.camera_collides(st, [-1, -1, -1], [1, 1, 1], X_cur,
                                      jnp.array([5.0, 0, 0]),
                                      proxy_distance=0.3,
                                      n_interpolation_steps=8))


@pytest.mark.slow  # compiles the device retry while_loop twice (~20 s on CPU)
def test_episode_random_start_retries_and_degenerate(pose_space):
    """episode_random_start must not silently start at an invalid pose: rare
    valid poses are found by the device retry loop, and a fully degenerate
    scene (every lattice cell occupied except a few, none valid) falls back
    to an UNOCCUPIED pose with any_valid=False."""
    verts, _ = cube_mesh(1.0)
    verts = jnp.asarray(verts)
    dims = (pose_space.pose_l, pose_space.pose_w, pose_space.pose_h,
            pose_space.pose_n_elev, pose_space.pose_n_azim)

    # Rare-valid scene: all but ONE position occupied. With batch=4 a single
    # batch routinely misses it; the while_loop retries must find it.
    occ = np.ones((dims[0], dims[1], dims[2]), bool)
    occ[3, 3, 3] = False
    tables = C.pose_space_tables(pose_space, occupied=occ)
    found_any = False
    for seed in range(4):
        idx, ok = C.episode_random_start(
            jax.random.PRNGKey(seed), tables, dims, dims[3], dims[4], verts,
            None, 32, 48, 20.0, batch=4, max_attempts=64)
        idx = np.asarray(idx)
        if bool(ok):
            found_any = True
            assert tuple(idx[:3]) == (3, 3, 3)
            assert not occ[idx[0], idx[1], idx[2]]
    assert found_any

    # Degenerate scene: EVERY position occupied -> no valid pose exists.
    # The fallback pose must still be reported with any_valid=False (the
    # caller can then raise / pick the host path).
    occ_all = np.ones((dims[0], dims[1], dims[2]), bool)
    tables_bad = C.pose_space_tables(pose_space, occupied=occ_all)
    idx, ok = C.episode_random_start(
        jax.random.PRNGKey(0), tables_bad, dims, dims[3], dims[4], verts,
        None, 32, 48, 20.0, batch=8, max_attempts=4)
    assert not bool(ok)
    assert np.asarray(idx).shape == (5,)

    # Mostly-occupied but with unoccupied cells that fail the FoV test is
    # exercised implicitly above; here check the unoccupied fallback: occupy
    # everything except one cell, but make FoV impossible by passing a mesh
    # far outside every frustum.
    far_verts = jnp.asarray(np.full((8, 3), 1e6, np.float32))
    idx, ok = C.episode_random_start(
        jax.random.PRNGKey(1), tables, dims, dims[3], dims[4], far_verts,
        None, 32, 48, 20.0, batch=64, max_attempts=4)
    assert not bool(ok)
    idx = np.asarray(idx)
    # fallback prefers an unoccupied position when one was sampled
    assert not occ[idx[0], idx[1], idx[2]] or occ.all()
