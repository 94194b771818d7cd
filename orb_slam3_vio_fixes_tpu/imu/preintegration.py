"""IMU preintegration as a jitted scan over measurement windows.

TPU-native replacement for the reference's IMU::Preintegrated
(reference semantics: src/ImuTypes.cc:177-235 IntegrateNewMeasurement —
midpoint integration of (dR, dV, dP), first-order bias Jacobians JRg/JVg/
JVa/JPg/JPa, 9x9 covariance propagation via the A/B system matrices at
:186-228, bias random-walk block; include/ImuTypes.h:143-251 for the state;
GetDeltaRotation/Velocity/Position bias-corrected getters at
src/ImuTypes.cc:283-305; gravity magnitude 9.81 include/ImuTypes.h:43).

Re-design: a `Preintegrated` pytree + `integrate(samples, mask, bias, calib)`
implemented with `lax.scan` (the sequential dependency is fundamental — each
step is tiny, so the scan is compiled once and replayed per frame window;
batching across many windows is done by vmapping `integrate`).

Padding convention: masked-out samples use dt=0, which makes every update a
no-op identically (Exp(0)=I), so fixed-capacity windows need no special
casing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import lie

GRAVITY = 9.81
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)


class ImuCalib(NamedTuple):
    """Noise densities (discrete, per the reference's Calib 6x6 diagonals:
    include/ImuTypes.h:92-126): gyro/acc white noise sigma^2 and random-walk
    sigma^2, plus T_bc (body-from-camera) extrinsics."""

    sigma2_gyro: jax.Array      # scalar
    sigma2_acc: jax.Array       # scalar
    sigma2_gyro_walk: jax.Array
    sigma2_acc_walk: jax.Array
    R_bc: jax.Array             # (3, 3)
    t_bc: jax.Array             # (3,)

    @staticmethod
    def make(noise_gyro, noise_acc, walk_gyro, walk_acc, freq, R_bc=None, t_bc=None):
        """From continuous-time densities + rate, like the reference's
        Settings reader (sigma_discrete = sigma_cont * sqrt(freq))."""
        sf = float(freq)
        return ImuCalib(
            jnp.float32((noise_gyro**2) * sf),
            jnp.float32((noise_acc**2) * sf),
            jnp.float32((walk_gyro**2) / sf),
            jnp.float32((walk_acc**2) / sf),
            jnp.eye(3, dtype=jnp.float32) if R_bc is None else jnp.asarray(R_bc, jnp.float32),
            jnp.zeros(3, jnp.float32) if t_bc is None else jnp.asarray(t_bc, jnp.float32),
        )


class Preintegrated(NamedTuple):
    """Preintegrated deltas between two frames/keyframes, at linearization
    bias (bg0, ba0)."""

    dT: jax.Array        # scalar total time
    dR: jax.Array        # (3, 3)
    dV: jax.Array        # (3,)
    dP: jax.Array        # (3,)
    JRg: jax.Array       # (3, 3) d dR / d bg
    JVg: jax.Array       # (3, 3)
    JVa: jax.Array       # (3, 3)
    JPg: jax.Array       # (3, 3)
    JPa: jax.Array       # (3, 3)
    cov: jax.Array       # (9, 9) covariance of (phi, v, p)
    cov_walk: jax.Array  # (6, 6) bias random-walk covariance
    bg0: jax.Array       # (3,) linearization gyro bias
    ba0: jax.Array       # (3,) linearization acc bias

    @staticmethod
    def identity(bg0=None, ba0=None) -> "Preintegrated":
        eye = jnp.eye(3, dtype=jnp.float32)
        zero3 = jnp.zeros(3, jnp.float32)
        zero33 = jnp.zeros((3, 3), jnp.float32)
        return Preintegrated(
            jnp.float32(0.0), eye, zero3, zero3,
            zero33, zero33, zero33, zero33, zero33,
            jnp.zeros((9, 9), jnp.float32), jnp.zeros((6, 6), jnp.float32),
            zero3 if bg0 is None else bg0, zero3 if ba0 is None else ba0,
        )


def _step(state: Preintegrated, sample, calib: ImuCalib):
    """One midpoint-integration update (reference: IntegrateNewMeasurement)."""
    acc, gyro, dt = sample[:3], sample[3:6], sample[6]
    a = acc - state.ba0
    w = gyro - state.bg0

    dt2 = dt * dt
    # position/velocity first (using current dR, like the reference)
    dP = state.dP + state.dV * dt + 0.5 * (state.dR @ a) * dt2
    dV = state.dV + (state.dR @ a) * dt

    # covariance propagation (A/B blocks, reference :186-228)
    a_hat = lie.hat(a)
    dRi = lie.so3_exp(w * dt)
    Jr = lie.so3_right_jacobian(w * dt)

    A = jnp.eye(9, dtype=state.dR.dtype)
    A = A.at[0:3, 0:3].set(dRi.T)
    A = A.at[3:6, 0:3].set(-state.dR @ a_hat * dt)
    A = A.at[6:9, 0:3].set(-0.5 * state.dR @ a_hat * dt2)
    A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=state.dR.dtype) * dt)
    B = jnp.zeros((9, 6), state.dR.dtype)
    B = B.at[0:3, 0:3].set(Jr * dt)
    B = B.at[3:6, 3:6].set(state.dR * dt)
    B = B.at[6:9, 3:6].set(0.5 * state.dR * dt2)
    Nga = jnp.diag(
        jnp.concatenate([jnp.full(3, calib.sigma2_gyro), jnp.full(3, calib.sigma2_acc)])
    ).astype(state.dR.dtype)
    cov = A @ state.cov @ A.T + B @ Nga @ B.T
    cov_walk = state.cov_walk + jnp.diag(
        jnp.concatenate(
            [jnp.full(3, calib.sigma2_gyro_walk), jnp.full(3, calib.sigma2_acc_walk)]
        )
    ).astype(state.dR.dtype) * dt

    # bias Jacobians (first-order, reference order matters: JP before JV
    # before JR updates, all using pre-update dR)
    JPg = state.JPg + state.JVg * dt - 0.5 * state.dR @ a_hat @ state.JRg * dt2
    JPa = state.JPa + state.JVa * dt - 0.5 * state.dR * dt2
    JVg = state.JVg - state.dR @ a_hat @ state.JRg * dt
    JVa = state.JVa - state.dR * dt
    JRg = dRi.T @ state.JRg - Jr * dt

    dR = state.dR @ dRi
    dT = state.dT + dt
    return Preintegrated(
        dT, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, cov, cov_walk, state.bg0, state.ba0
    )


@jax.jit
def integrate(samples: jax.Array, bias_g: jax.Array, bias_a: jax.Array, calib: ImuCalib):
    """Integrate a window of IMU samples.

    samples: (N, 7) rows (ax, ay, az, gx, gy, gz, dt); padded rows must have
    dt = 0. bias_g/bias_a: (3,) linearization biases.
    """

    def f(state, sample):
        return _step(state, sample, calib), None

    init = Preintegrated.identity(bias_g, bias_a)
    out, _ = jax.lax.scan(f, init, samples)
    # renormalize accumulated rotation (reference normalizes each step)
    return out._replace(dR=lie.so3_normalize(out.dR))


def delta_rotation(p: Preintegrated, bg: jax.Array) -> jax.Array:
    """Bias-corrected dR (reference: GetDeltaRotation src/ImuTypes.cc:283)."""
    return p.dR @ lie.so3_exp(p.JRg @ (bg - p.bg0))


def delta_velocity(p: Preintegrated, bg: jax.Array, ba: jax.Array) -> jax.Array:
    return p.dV + p.JVg @ (bg - p.bg0) + p.JVa @ (ba - p.ba0)


def delta_position(p: Preintegrated, bg: jax.Array, ba: jax.Array) -> jax.Array:
    return p.dP + p.JPg @ (bg - p.bg0) + p.JPa @ (ba - p.ba0)


def merge(a: Preintegrated, b: Preintegrated) -> Preintegrated:
    """Concatenate two consecutive preintegrations (reference:
    MergePrevious src/ImuTypes.cc:237-261 — used when a keyframe is culled
    and its IMU segments are joined). Composes deltas and Jacobians at a's
    linearization bias; b is re-linearized to a's bias to first order."""
    dbg = a.bg0 - b.bg0
    dba = a.ba0 - b.ba0
    dRb = delta_rotation(b, a.bg0)
    dVb = delta_velocity(b, a.bg0, a.ba0)
    dPb = delta_position(b, a.bg0, a.ba0)
    dR = a.dR @ dRb
    dV = a.dV + a.dR @ dVb
    dP = a.dP + a.dV * b.dT + a.dR @ dPb
    # Jacobian composition (first order)
    JRg = dRb.T @ a.JRg + b.JRg
    JVg = a.JVg + a.dR @ b.JVg - a.dR @ lie.hat(dVb) @ a.JRg
    JVa = a.JVa + a.dR @ b.JVa
    JPg = a.JPg + a.JVg * b.dT + a.dR @ b.JPg - a.dR @ lie.hat(dPb) @ a.JRg
    JPa = a.JPa + a.JVa * b.dT + a.dR @ b.JPa
    # covariance: rotate b's into a's frame via the composition A matrix
    A = jnp.eye(9, dtype=a.cov.dtype)
    A = A.at[0:3, 0:3].set(dRb.T)
    A = A.at[3:6, 0:3].set(-a.dR @ lie.hat(dVb))
    A = A.at[6:9, 0:3].set(-a.dR @ lie.hat(dPb))
    A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=a.cov.dtype) * b.dT)
    Bm = jnp.zeros((9, 9), a.cov.dtype)
    Bm = Bm.at[0:3, 0:3].set(jnp.eye(3, dtype=a.cov.dtype))
    Bm = Bm.at[3:6, 3:6].set(a.dR)
    Bm = Bm.at[6:9, 6:9].set(a.dR)
    cov = A @ a.cov @ A.T + Bm @ b.cov @ Bm.T
    return Preintegrated(
        a.dT + b.dT, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, cov,
        a.cov_walk + b.cov_walk, a.bg0, a.ba0,
    )


def predict_state(R_wb, p_wb, v_w, bg, ba, pre: Preintegrated):
    """Dead-reckon the next body state from a preintegrated window
    (reference semantics: Tracking::PredictStateIMU src/Tracking.cc:1738-1786).

    Returns (R_wb2, p_wb2, v_w2).
    """
    dt = pre.dT
    dR = delta_rotation(pre, bg)
    dV = delta_velocity(pre, bg, ba)
    dP = delta_position(pre, bg, ba)
    R2 = R_wb @ dR
    v2 = v_w + GRAVITY_VEC.astype(v_w.dtype) * dt + R_wb @ dV
    p2 = p_wb + v_w * dt + 0.5 * GRAVITY_VEC.astype(v_w.dtype) * dt * dt + R_wb @ dP
    return lie.so3_normalize(R2), p2, v2
