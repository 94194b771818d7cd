"""Unit tests for the Lie-group substrate (SURVEY.md §7 stage 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.utils import lie


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return np.asarray(lie.quat_to_rotmat(jnp.asarray(q, jnp.float64)))


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3))
    # exp/log roundtrip is only identity on the principal domain |w| < pi
    norm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = w / norm * (norm % 3.1)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-9)


def test_so3_exp_small_angle(rng):
    w = rng.normal(size=(16, 3)) * 1e-10
    R = lie.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-9)
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), w, atol=1e-12)


def test_so3_log_near_pi(rng):
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for theta in [np.pi - 1e-6, np.pi - 1e-3, np.pi * 0.999]:
        w = axes * theta
        R = lie.so3_exp(jnp.asarray(w))
        w2 = np.asarray(lie.so3_log(R))
        # log may return the equivalent rotation (sign flip at exactly pi)
        err = np.minimum(np.linalg.norm(w2 - w, axis=-1), np.linalg.norm(w2 + w, axis=-1))
        assert err.max() < 1e-5


def test_so3_orthonormality(rng):
    w = rng.normal(size=(32, 3)) * 2.0
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_right_jacobian_numeric(rng):
    """J_r satisfies exp(w + dw) ≈ exp(w) exp(J_r(w) dw)."""
    w = rng.normal(size=(8, 3))
    dw = rng.normal(size=(8, 3)) * 1e-6
    R1 = lie.so3_exp(jnp.asarray(w + dw))
    Jr = lie.so3_right_jacobian(jnp.asarray(w))
    R2 = lie.so3_exp(jnp.asarray(w)) @ lie.so3_exp(jnp.einsum("nij,nj->ni", Jr, jnp.asarray(dw)))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-10)


def test_right_jacobian_inverse(rng):
    w = rng.normal(size=(16, 3)) * 2.0
    Jr = lie.so3_right_jacobian(jnp.asarray(w))
    Jr_inv = lie.so3_right_jacobian_inv(jnp.asarray(w))
    eye = np.broadcast_to(np.eye(3), (16, 3, 3))
    np.testing.assert_allclose(np.asarray(Jr @ Jr_inv), eye, atol=1e-8)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6))
    # keep rotation within the principal domain |phi| < pi
    norm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] = xi[:, 3:] / norm * (norm % 3.1)
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-8)


def test_se3_compose_inverse(rng):
    xi = rng.normal(size=(8, 6))
    R, t = lie.se3_exp(jnp.asarray(xi))
    Ri, ti = lie.se3_inverse(R, t)
    Rc, tc = lie.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-12)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 7)) * 0.6
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    xi2 = lie.sim3_log(R, t, s)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-7)


def test_sim3_compose_apply(rng):
    xa = jnp.asarray(rng.normal(size=(7,)) * 0.5)
    xb = jnp.asarray(rng.normal(size=(7,)) * 0.5)
    p = jnp.asarray(rng.normal(size=(10, 3)))
    Ra, ta, sa = lie.sim3_exp(xa)
    Rb, tb, sb = lie.sim3_exp(xb)
    lhs = lie.sim3_apply(Ra, ta, sa, lie.sim3_apply(Rb, tb, sb, p))
    Rc, tc, sc = lie.sim3_compose(Ra, ta, sa, Rb, tb, sb)
    rhs = lie.sim3_apply(Rc, tc, sc, p)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_sim3_inverse(rng):
    x = jnp.asarray(rng.normal(size=(7,)) * 0.5)
    p = jnp.asarray(rng.normal(size=(5, 3)))
    R, t, s = lie.sim3_exp(x)
    Ri, ti, si = lie.sim3_inverse(R, t, s)
    back = lie.sim3_apply(Ri, ti, si, lie.sim3_apply(R, t, s, p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-10)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 128)
    q = lie.rotmat_to_quat(jnp.asarray(R))
    R2 = lie.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-9)


def test_quat_roundtrip_degenerate():
    """Near-pi rotations around each axis exercise all Shepperd cases."""
    for axis in np.eye(3):
        for theta in [np.pi, np.pi - 1e-7, 0.0, 1e-9]:
            R = np.asarray(lie.so3_exp(jnp.asarray(axis * theta)))
            q = lie.rotmat_to_quat(jnp.asarray(R))
            R2 = np.asarray(lie.quat_to_rotmat(q))
            np.testing.assert_allclose(R2, R, atol=1e-7)


def test_jit_and_vmap():
    """All ops must be jittable (static shapes, no python branching on data)."""
    f = jax.jit(lambda w: lie.so3_log(lie.so3_exp(w)))
    w = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)))
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-9)
    g = jax.jit(jax.vmap(lambda xi: jnp.concatenate(
        [lie.se3_log(*lie.se3_exp(xi))])))
    np.testing.assert_allclose(np.asarray(g(jnp.stack([w[0], w[1]])[:, [0, 1, 2, 0, 1, 2]] * 0.3)),
                               np.asarray(jnp.stack([w[0], w[1]])[:, [0, 1, 2, 0, 1, 2]] * 0.3),
                               atol=1e-8)
