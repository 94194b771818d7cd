"""IMU preintegration tests vs closed-form trajectories."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.utils import lie

CALIB = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)


def simulate(
    n, dt, omega_body, accel_world, R0=np.eye(3), v0=np.zeros(3), p0=np.zeros(3),
    bias_g=np.zeros(3), bias_a=np.zeros(3),
):
    """Ground-truth body trajectory + ideal IMU samples.

    omega_body: constant body angular rate; accel_world: constant world-frame
    linear acceleration (excluding gravity).
    """
    g = np.array([0, 0, -pre.GRAVITY])
    R, v, p = R0.copy(), v0.copy(), p0.copy()
    samples = []
    for _ in range(n):
        # specific force in body frame: f = R^T (a_world - g)
        f = R.T @ (accel_world - g)
        samples.append(np.concatenate([f + bias_a, omega_body + bias_g, [dt]]))
        # integrate ground truth with small steps for accuracy;
        # accel_world IS the body's total kinematic acceleration (specific
        # force above already subtracts gravity: f = a - g).
        sub = 20
        for _ in range(sub):
            a_w = accel_world
            p = p + v * (dt / sub) + 0.5 * a_w * (dt / sub) ** 2
            v = v + a_w * (dt / sub)
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(omega_body * (dt / sub), jnp.float64)))
        # keep f constant over the step (first-order; fine for small dt)
    return np.array(samples, np.float32), R, v, p


def test_static_gravity_only():
    """Body at rest: dV = R^T * (-g) * t accumulated = +g_mag upward in body."""
    n, dt = 200, 0.005
    samples, R_gt, v_gt, p_gt = simulate(n, dt, np.zeros(3), np.zeros(3))
    out = pre.integrate(jnp.asarray(samples), jnp.zeros(3), jnp.zeros(3), CALIB)
    T = n * dt
    np.testing.assert_allclose(float(out.dT), T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.dR), np.eye(3), atol=1e-6)
    # dV = integral of f dt = (0,0,g)*T in body frame
    np.testing.assert_allclose(np.asarray(out.dV), [0, 0, pre.GRAVITY * T], rtol=1e-5)
    # predict_state should return the body to rest
    R2, p2, v2 = pre.predict_state(
        jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), out
    )
    # f32: g*T = 9.81 cancels against the integrated dV, leaving ~1e-6
    # relative residue, i.e. ~1e-5 absolute.
    np.testing.assert_allclose(np.asarray(v2), np.zeros(3), atol=5e-5)
    np.testing.assert_allclose(np.asarray(p2), np.zeros(3), atol=5e-5)


def test_rotation_and_acceleration():
    n, dt = 100, 0.005
    omega = np.array([0.3, -0.2, 0.5])
    acc_w = np.array([0.4, 0.1, -0.3])
    samples, R_gt, v_gt, p_gt = simulate(n, dt, omega, acc_w)
    out = pre.integrate(jnp.asarray(samples), jnp.zeros(3), jnp.zeros(3), CALIB)
    R2, p2, v2 = pre.predict_state(
        jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), out
    )
    np.testing.assert_allclose(np.asarray(R2), R_gt, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v2), v_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p2), p_gt, atol=2e-3)


def test_padding_is_noop():
    n, dt = 50, 0.005
    samples, *_ = simulate(n, dt, np.array([0.1, 0.2, 0.3]), np.array([0.5, 0, 0]))
    padded = np.concatenate([samples, np.zeros((30, 7), np.float32)])
    a = pre.integrate(jnp.asarray(samples), jnp.zeros(3), jnp.zeros(3), CALIB)
    b = pre.integrate(jnp.asarray(padded), jnp.zeros(3), jnp.zeros(3), CALIB)
    np.testing.assert_allclose(np.asarray(a.dR), np.asarray(b.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.dP), np.asarray(b.dP), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), atol=1e-12)


def test_bias_jacobians_first_order():
    """delta getters with bias shift must match re-integration with that bias."""
    n, dt = 100, 0.005
    omega = np.array([0.4, 0.1, -0.3])
    acc_w = np.array([0.2, -0.1, 0.4])
    bg = np.array([0.01, -0.02, 0.015])
    ba = np.array([0.05, 0.03, -0.04])
    samples, *_ = simulate(n, dt, omega, acc_w, bias_g=bg, bias_a=ba)
    # integrate at zero linearization bias
    out0 = pre.integrate(jnp.asarray(samples), jnp.zeros(3), jnp.zeros(3), CALIB)
    # integrate at the true bias
    out1 = pre.integrate(jnp.asarray(samples), jnp.asarray(bg, jnp.float32),
                         jnp.asarray(ba, jnp.float32), CALIB)
    # first-order corrected getters from out0 evaluated at the true bias
    dR_corr = pre.delta_rotation(out0, jnp.asarray(bg, jnp.float32))
    dV_corr = pre.delta_velocity(out0, jnp.asarray(bg, jnp.float32), jnp.asarray(ba, jnp.float32))
    dP_corr = pre.delta_position(out0, jnp.asarray(bg, jnp.float32), jnp.asarray(ba, jnp.float32))
    np.testing.assert_allclose(np.asarray(dR_corr), np.asarray(out1.dR), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dV_corr), np.asarray(out1.dV), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dP_corr), np.asarray(out1.dP), atol=2e-3)


def test_merge_matches_single_integration():
    n, dt = 120, 0.005
    omega = np.array([0.3, -0.1, 0.2])
    acc_w = np.array([0.1, 0.2, -0.1])
    samples, *_ = simulate(n, dt, omega, acc_w)
    full = pre.integrate(jnp.asarray(samples), jnp.zeros(3), jnp.zeros(3), CALIB)
    a = pre.integrate(jnp.asarray(samples[:60]), jnp.zeros(3), jnp.zeros(3), CALIB)
    b = pre.integrate(jnp.asarray(samples[60:]), jnp.zeros(3), jnp.zeros(3), CALIB)
    m = pre.merge(a, b)
    np.testing.assert_allclose(np.asarray(m.dR), np.asarray(full.dR), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dV), np.asarray(full.dV), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m.dP), np.asarray(full.dP), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m.JRg), np.asarray(full.JRg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m.JVg), np.asarray(full.JVg), atol=2e-3)
    np.testing.assert_allclose(np.asarray(m.JPa), np.asarray(full.JPa), atol=2e-3)
    # covariance should be close (same order of magnitude, PSD)
    c_full = np.asarray(full.cov)
    c_m = np.asarray(m.cov)
    assert np.all(np.linalg.eigvalsh(c_m) > -1e-12)
    np.testing.assert_allclose(c_m, c_full, rtol=0.2, atol=1e-10)


def test_covariance_grows_and_psd():
    n, dt = 200, 0.005
    samples, *_ = simulate(n, dt, np.array([0.2, 0.1, -0.1]), np.zeros(3))
    out = pre.integrate(jnp.asarray(samples), jnp.zeros(3), jnp.zeros(3), CALIB)
    c = np.asarray(out.cov)
    assert np.all(np.linalg.eigvalsh(c) > 0)
    half = pre.integrate(jnp.asarray(samples[:100]), jnp.zeros(3), jnp.zeros(3), CALIB)
    assert np.trace(np.asarray(half.cov)) < np.trace(c)
