import numpy as np
import jax
import jax.numpy as jnp

from macarons_tpu.ops import view_state as vs
from macarons_tpu.ops.geometry import FoVCamera, look_at_view_transform

N_ELEV, N_AZIM = 7, 14


def test_view_state_known_direction():
    # Camera straight along +z from a point at origin: elev=0, azim=0
    pts = jnp.zeros((1, 1, 3))
    X_view = jnp.array([[0.0, 0.0, 5.0]])
    state = np.asarray(vs.compute_view_state(pts, X_view, N_ELEV, N_AZIM))[0, 0]
    assert state.sum() == 1
    # elev bin 0 -> +n_elev//2 = 3; azim bin 0 -> index 3*14 + 0 = 42
    assert state[42] == 1.0


def test_view_state_accumulation_binary():
    pts = jnp.array(np.random.default_rng(0).normal(size=(2, 16, 3)), jnp.float32)
    X1 = jnp.array([[0.0, 0.0, 5.0], [5.0, 0.0, 0.0]])
    state = vs.compute_view_state(pts, X1, N_ELEV, N_AZIM)
    assert set(np.unique(np.asarray(state))) <= {0.0, 1.0}
    # OR-accumulation: adding the same views changes nothing
    state2 = vs.update_view_state(state, pts, X1, N_ELEV, N_AZIM)
    np.testing.assert_array_equal(np.asarray(state), np.asarray(state2))
    # A genuinely new direction can only add bins
    state3 = vs.update_view_state(state, pts, jnp.array([[0.0, 5.0, 0.1]]),
                                  N_ELEV, N_AZIM)
    assert np.all(np.asarray(state3) >= np.asarray(state))


def test_view_space_permutation_identity_camera():
    """For the identity camera the permutation maps each grid direction to a bin
    within one discretization step. (Exact identity cannot hold: the reference's
    trunc+mod binning — torch-1.7 floor_divide truncates toward zero — is biased
    by up to one bin for negative angles, and grid points sit exactly on bin
    boundaries. We replicate that bias for parity.)"""
    cam = FoVCamera.create(jnp.eye(3)[None], jnp.zeros((1, 3)))
    perm = np.asarray(vs.view_space_permutation(cam, N_ELEV, N_AZIM))
    elev, azim = (np.asarray(a) for a in vs.sphere_grid_angles(N_ELEV, N_AZIM))
    elev_step = np.pi / (N_ELEV + 1)
    azim_step = 2 * np.pi / N_AZIM
    d_elev = np.abs(elev[perm] - elev)
    d_azim = np.abs(np.angle(np.exp(1j * (azim[perm] - azim))))
    assert np.all(d_elev <= elev_step + 1e-5)
    assert np.all(d_azim <= azim_step + 1e-5)
    # (No exactness sub-check: every grid angle is an exact bin-boundary multiple,
    # so float noise legitimately rounds either way — in the reference too.)


def test_move_view_state_gathers():
    R, T = look_at_view_transform(dist=3.0, elev=25.0, azim=130.0)
    cam = FoVCamera.create(R, T)
    state = jnp.array(
        np.random.default_rng(1).integers(0, 2, (1, 8, N_ELEV * N_AZIM)),
        jnp.float32,
    )
    rot = vs.move_view_state_to_view_space(state, cam, N_ELEV, N_AZIM)
    perm = np.asarray(vs.view_space_permutation(cam, N_ELEV, N_AZIM))
    np.testing.assert_array_equal(
        np.asarray(rot), np.asarray(state)[..., perm]
    )


def test_view_harmonics_full_sphere():
    # All-ones view state: inner products approximate integrals of Y_lm over S^2,
    # = sqrt(4 pi) for (0,0) and ~0 for higher harmonics.
    base, h_polar, h_azim = vs.get_all_harmonics_under_degree(8, N_ELEV, N_AZIM)
    assert base.shape == (64, N_ELEV * N_AZIM)
    ones = jnp.ones((1, 1, N_ELEV * N_AZIM))
    coords = np.asarray(
        vs.compute_view_harmonics(ones, base, h_polar, N_ELEV, N_AZIM)
    )[0, 0]
    np.testing.assert_allclose(coords[0], np.sqrt(4 * np.pi), rtol=0.05)
    assert np.all(np.abs(coords[1:]) < 0.25)


def test_filter_proxy_points_mask():
    R, T = look_at_view_transform(dist=5.0, elev=jnp.array([0.0, 30.0]),
                                  azim=jnp.array([0.0, 90.0]))
    cams = FoVCamera.create(R, T, fov=60.0, znear=0.5, zfar=20.0)
    pc = jnp.array(np.random.default_rng(2).uniform(-0.5, 0.5, (100, 3)),
                   jnp.float32)
    X = jnp.array([[0.0, 0.0, 0.0], [3.0, 3.0, 3.0]], jnp.float32)
    mask = np.asarray(vs.filter_proxy_points_mask(cams, X, pc))
    assert mask[0] and not mask[1]


def test_sample_proxy_points_distribution():
    n = 1000
    X = jnp.array(np.random.default_rng(3).normal(size=(n, 3)), jnp.float32)
    occ = np.zeros((n, 1), np.float32)
    occ[:100] = 0.9  # only first 100 pass min_occ, equal weights
    occ[50] = 0.0  # except this one
    vh = jnp.zeros((n, 64))
    pts4, harm, idx, mask = vs.sample_proxy_points(
        jax.random.PRNGKey(0), X, jnp.array(occ), vh, 512, min_occ=0.5
    )
    assert pts4.shape == (512, 4) and bool(np.all(np.asarray(mask)))
    idx = np.asarray(idx)
    assert np.all(idx < 100) and not np.any(idx == 50)
    # occ concatenated as 4th channel
    np.testing.assert_allclose(np.asarray(pts4)[:, 3], 0.9, atol=1e-6)


def test_sample_proxy_points_none_valid():
    X = jnp.zeros((10, 3))
    occ = jnp.zeros((10, 1))
    vh = jnp.zeros((10, 64))
    _, _, _, mask = vs.sample_proxy_points(
        jax.random.PRNGKey(0), X, occ, vh, 16, min_occ=0.5
    )
    assert not np.any(np.asarray(mask))
