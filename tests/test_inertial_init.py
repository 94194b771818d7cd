"""Inertial initialization tests: recover gravity direction, biases, scale.

Mirrors the reference's IMU init contract (Changelog.md:44 — scale error <5%
in 2 s): simulate a body with known motion/biases, preintegrate between
keyframes, and check Optimizer::InertialOptimization-equivalent recovery.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.optim import inertial_init as ii
from orb_slam3_vio_fixes_tpu.utils import lie

G = np.array([0.0, 0.0, -9.81], np.float32)


def _simulate(n_kf=11, kf_dt=0.5, hz=200.0, bg=None, ba=None, seed=0,
              world_rot=None):
    """Simulate excitation-rich body motion; return per-KF ground truth and
    per-pair IMU sample windows.

    world_rot: optional SO(3) matrix rotating the TRUE world into the VISION
    world (gravity unknown in vision frame — what IMU init must recover).
    """
    rng = np.random.default_rng(seed)
    bg = np.zeros(3, np.float32) if bg is None else bg
    ba = np.zeros(3, np.float32) if ba is None else ba
    Rv = np.eye(3, dtype=np.float32) if world_rot is None else world_rot

    dt = 1.0 / hz
    steps_per_kf = int(round(kf_dt * hz))
    n_steps = steps_per_kf * (n_kf - 1)

    # body angular velocity + world acceleration profiles (smooth, exciting)
    ts = np.arange(n_steps) * dt
    w_b = np.stack([
        0.4 * np.sin(2.1 * ts), 0.3 * np.cos(1.7 * ts), 0.5 * np.sin(1.3 * ts)
    ], 1).astype(np.float32)
    a_w = np.stack([
        1.5 * np.sin(3.0 * ts), 1.2 * np.cos(2.2 * ts), 0.8 * np.sin(1.9 * ts)
    ], 1).astype(np.float32)

    R = np.eye(3, dtype=np.float32)
    v = np.zeros(3, np.float32)
    p = np.zeros(3, np.float32)
    kf_R, kf_p, kf_v = [R.copy()], [p.copy()], [v.copy()]
    samples = []  # per-step (acc_meas, gyro_meas, dt)
    for k in range(n_steps):
        acc_meas = R.T @ (a_w[k] - G) + ba
        gyro_meas = w_b[k] + bg
        samples.append(np.concatenate([acc_meas, gyro_meas, [dt]]))
        # integrate GT (midpoint-free Euler is fine at 200 Hz for the test)
        p = p + v * dt + 0.5 * a_w[k] * dt * dt
        v = v + a_w[k] * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_b[k] * dt)))
        if (k + 1) % steps_per_kf == 0:
            kf_R.append(R.copy())
            kf_p.append(p.copy())
            kf_v.append(v.copy())
    kf_R = np.stack(kf_R)
    kf_p = np.stack(kf_p)
    kf_v = np.stack(kf_v)
    windows = np.stack(samples).reshape(n_kf - 1, steps_per_kf, 7).astype(np.float32)

    # vision-world versions (rotated): x_vision = Rv @ x_true
    kf_R_vis = np.einsum("ij,kjl->kil", Rv, kf_R)
    kf_p_vis = np.einsum("ij,kj->ki", Rv, kf_p)
    return kf_R_vis, kf_p_vis, kf_v, windows


def _build_factors(kf_R, windows):
    n_pair = windows.shape[0]
    zero = jnp.zeros(3)
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)
    pres = jax.vmap(lambda w: pre.integrate(jnp.asarray(w), zero, zero, calib))(
        jnp.asarray(windows)
    )
    idx_i = np.arange(n_pair, dtype=np.int32)
    idx_j = idx_i + 1
    return ii.factors_from_preintegrations(
        idx_i, idx_j, pres, np.ones(n_pair, bool)
    )


def test_gravity_and_gyro_bias_recovery():
    """Vision world rotated 15 deg off gravity; nonzero gyro bias."""
    bg_true = np.array([0.02, -0.015, 0.01], np.float32)
    ang = np.deg2rad(15.0)
    Rv = np.asarray(lie.so3_exp(jnp.asarray([ang, 0.0, 0.0], jnp.float32)))
    kf_R, kf_p, kf_v, windows = _simulate(bg=bg_true, world_rot=Rv)
    factors = _build_factors(kf_R, windows)

    v, bg, ba, Rwg, s, chi2 = ii.inertial_optimization(
        jnp.asarray(kf_R), jnp.asarray(kf_p), jnp.zeros_like(jnp.asarray(kf_v)),
        factors,
        ii.InertialInitConfig(n_iters=40, prior_gyro=1.0, prior_acc=1e6,
                              fix_scale=True),
    )
    # gravity in vision world should equal Rv @ G
    g_est = np.asarray(Rwg @ jnp.array([0.0, 0.0, -9.81]))
    g_true = Rv @ G
    assert np.linalg.norm(g_est - g_true) < 0.05, (g_est, g_true)
    assert np.linalg.norm(np.asarray(bg) - bg_true) < 2e-3, bg
    # velocities in the vision frame: v_vis = Rv v_true
    v_true_vis = np.einsum("ij,kj->ki", Rv, kf_v)
    assert np.abs(np.asarray(v) - v_true_vis).max() < 0.05


def test_scale_recovery_mono():
    """Mono: positions fed at 40% of metric scale; optimizer recovers s=2.5."""
    s_true = 2.5
    kf_R, kf_p, kf_v, windows = _simulate(seed=1)
    factors = _build_factors(kf_R, windows)
    v, bg, ba, Rwg, s, chi2 = ii.inertial_optimization(
        jnp.asarray(kf_R), jnp.asarray(kf_p / s_true),
        jnp.zeros_like(jnp.asarray(kf_v)),
        factors,
        ii.InertialInitConfig(n_iters=60, prior_gyro=1.0, prior_acc=1e6,
                              fix_scale=False),
    )
    assert abs(float(s) / s_true - 1.0) < 0.05, float(s)


def test_acc_bias_recovery():
    ba_true = np.array([0.05, -0.03, 0.08], np.float32)
    kf_R, kf_p, kf_v, windows = _simulate(ba=ba_true, seed=2)
    factors = _build_factors(kf_R, windows)
    v, bg, ba, Rwg, s, chi2 = ii.inertial_optimization(
        jnp.asarray(kf_R), jnp.asarray(kf_p), jnp.zeros_like(jnp.asarray(kf_v)),
        factors,
        ii.InertialInitConfig(n_iters=60, prior_gyro=1.0, prior_acc=1e-2,
                              fix_scale=True),
    )
    assert np.linalg.norm(np.asarray(ba) - ba_true) < 0.02, ba
    assert np.linalg.norm(np.asarray(bg)) < 2e-3


def test_apply_scaled_rotation_consistency():
    """Rotating+scaling the map must preserve reprojection geometry."""
    rng = np.random.default_rng(0)
    K, L = 4, 50
    kf_R = np.stack([
        np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.2, 3).astype(np.float32))))
        for _ in range(K)
    ])
    kf_t = rng.normal(0, 1, (K, 3)).astype(np.float32)
    kf_v = rng.normal(0, 1, (K, 3)).astype(np.float32)
    lm = rng.normal(0, 2, (L, 3)).astype(np.float32) + np.array([0, 0, 6], np.float32)
    R_gw = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.1], jnp.float32)))
    s = jnp.float32(1.7)
    R2, t2, v2, lm2 = ii.apply_scaled_rotation(
        jnp.asarray(kf_R), jnp.asarray(kf_t), jnp.asarray(kf_v),
        jnp.asarray(lm), jnp.asarray(R_gw), s,
    )
    # camera-frame coordinates of landmarks must scale by s exactly
    for k in range(K):
        xc_old = np.einsum("ij,lj->li", kf_R[k], lm) + kf_t[k]
        xc_new = np.einsum("ij,lj->li", np.asarray(R2[k]), np.asarray(lm2)) + np.asarray(t2[k])
        np.testing.assert_allclose(xc_new, 1.7 * xc_old, rtol=1e-4, atol=1e-4)
