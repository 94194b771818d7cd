"""Camera model tests: project/unproject consistency, Jacobians, vs OpenCV."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import cameras

# EuRoC-like pinhole and TUM-VI-like KB8 intrinsics (values of the same form
# as Examples/Stereo-Inertial/EuRoC.yaml / TUM-VI.yaml in the reference).
PINHOLE = cameras.Camera.pinhole(458.654, 457.296, 367.215, 248.375)
KB8 = cameras.Camera.kb8(
    190.978, 190.973, 254.932, 256.897,
    0.00348238, 0.000715035, -0.00205324, 0.000419742,
)


def _random_points(rng, n, spread=2.0):
    p = rng.normal(size=(n, 3)) * spread
    p[:, 2] = np.abs(p[:, 2]) + 0.5
    return p


def test_pinhole_project_unproject(rng):
    p = _random_points(rng, 256)
    uv = cameras.project(PINHOLE, jnp.asarray(p))
    rays = cameras.unproject(PINHOLE, uv)
    p_norm = p / p[:, 2:3]
    np.testing.assert_allclose(np.asarray(rays), p_norm, atol=1e-4)


def test_kb8_project_unproject(rng):
    p = _random_points(rng, 256, spread=1.0)
    uv = cameras.project(KB8, jnp.asarray(p))
    rays = cameras.unproject(KB8, uv)
    p_norm = p / p[:, 2:3]
    np.testing.assert_allclose(np.asarray(rays), p_norm, atol=1e-3)


def test_kb8_vs_opencv(rng):
    """KB8 projection must match cv2.fisheye.projectPoints."""
    import cv2

    p = _random_points(rng, 64, spread=0.8).astype(np.float64)
    K = np.array([[190.978, 0, 254.932], [0, 190.973, 256.897], [0, 0, 1]])
    D = np.array([0.00348238, 0.000715035, -0.00205324, 0.000419742])
    uv_cv, _ = cv2.fisheye.projectPoints(
        p.reshape(1, -1, 3), np.zeros(3), np.zeros(3), K, D
    )
    uv = np.asarray(cameras.project(KB8, jnp.asarray(p, jnp.float64)))
    np.testing.assert_allclose(uv, uv_cv.reshape(-1, 2), atol=1e-3)


def test_pinhole_vs_opencv(rng):
    import cv2

    p = _random_points(rng, 64).astype(np.float64)
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    uv_cv, _ = cv2.projectPoints(p, np.zeros(3), np.zeros(3), K, None)
    uv = np.asarray(cameras.project(PINHOLE, jnp.asarray(p, jnp.float64)))
    np.testing.assert_allclose(uv, uv_cv.reshape(-1, 2), atol=1e-4)


def test_project_jacobian_matches_autodiff(rng):
    for cam in [PINHOLE, KB8]:
        p = jnp.asarray(_random_points(rng, 32, spread=1.0))
        jac = np.asarray(cameras.project_jac(cam, p))
        jac_ad = np.asarray(jax.vmap(jax.jacfwd(lambda q: cameras.project(cam, q)))(p))
        np.testing.assert_allclose(jac, jac_ad, atol=1e-3)


def test_stereo_project(rng):
    p = _random_points(rng, 16)
    bf = jnp.float32(47.9)
    uvr = np.asarray(cameras.stereo_project(PINHOLE, bf, jnp.asarray(p)))
    np.testing.assert_allclose(uvr[:, 2], uvr[:, 0] - 47.9 / p[:, 2], atol=1e-3)


def test_camera_is_pytree():
    leaves, treedef = jax.tree_util.tree_flatten(PINHOLE)
    assert len(leaves) == 5
    cam2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert cam2.kind == cameras.PINHOLE

    @jax.jit
    def f(cam, p):
        return cameras.project(cam, p)

    out = f(PINHOLE, jnp.ones((4, 3)))
    assert out.shape == (4, 2)
