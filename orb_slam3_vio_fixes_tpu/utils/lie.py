"""Lie groups SO(3)/SE(3)/Sim(3): exp/log maps, Jacobians, group ops.

TPU-native replacement for the reference's header-only Sophus dependency
(reference: Thirdparty/Sophus/sophus/{so3,se3,sim3}.hpp) and the ad-hoc
right-Jacobian helpers used by IMU preintegration
(reference: src/ImuTypes.cc:254-260, include/ImuTypes.h:129-140).

Representation choices (TPU-first):
  * rotations are 3x3 matrices (batched matmuls hit the MXU; quaternions only
    at the serialization boundary),
  * every function is shape-polymorphic over leading batch dims via plain
    broadcasting or `jax.vmap`,
  * small-angle branches use `jnp.where` (no data-dependent control flow so
    everything stays jittable).

All formulas are the standard closed forms (Barfoot, "State Estimation for
Robotics"); nothing here is translated code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of `hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _taylor_coeffs(theta_sq: jax.Array):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), Taylor-safe.

    These power the exp map: exp(w^) = I + A w^ + B w^^2, and
    left Jacobian J = I + B w^ + C w^^2.
    """
    theta = jnp.sqrt(theta_sq + _EPS * (theta_sq < _EPS))
    small = theta_sq < _EPS
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta))
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3). (..., 3) -> (..., 3, 3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _taylor_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Log map SO(3) -> so(3). (..., 3, 3) -> (..., 3).

    Robust to theta near 0 and near pi (uses the diagonal-based axis extraction
    in the near-pi region).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Clip strictly inside (-1, 1): arccos has infinite slope at +-1, which
    # turns autodiff (jacfwd of residuals through this log) into NaN at the
    # exact-identity point even though the VALUE there is 0 — the product
    # rule then sees inf * 0. With the margin, d(theta) stays finite and is
    # multiplied by vee(R - R^T) ~ 0, recovering the correct Jacobian I.
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # Generic branch: w = theta/(2 sin theta) * vee(R - R^T)
    sin_theta = jnp.sin(theta)
    generic_scale = jnp.where(
        theta < 1e-5,
        0.5 + theta * theta / 12.0,  # Taylor of theta/(2 sin theta)
        theta / (2.0 * jnp.maximum(sin_theta, 1e-20)),
    )
    w_generic = generic_scale[..., None] * vee(R - jnp.swapaxes(R, -1, -2))
    # Near-pi branch: axis from the largest diagonal element of (R + I)/2
    # R = I + sin(t) K + (1-cos t) K^2; at t≈pi, (R+I)/2 ≈ I + K^2 = aa^T.
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    # axis_i = sqrt(max(0, (S_ii + 1)/2)) pattern via gather.
    def _axis_from(S, k):
        col = jnp.take_along_axis(
            0.5 * (S + jnp.eye(3, dtype=S.dtype)), k[..., None, None].repeat(3, axis=-2), axis=-1
        )[..., 0]
        kk = jnp.take_along_axis(col, k[..., None], axis=-1)[..., 0]
        axis = col / jnp.sqrt(jnp.maximum(kk, 1e-12))[..., None]
        norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
        return axis / jnp.maximum(norm, 1e-12)

    axis = _axis_from(S, k)
    # Fix the sign of the axis using the off-diagonal antisymmetric part.
    w_small = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    sign = jnp.where(jnp.sum(w_small * axis, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    # The clipped arccos theta saturates ~4.5e-4 rad short of pi; recover an
    # accurate magnitude from sin(theta) = |vee(R-R^T)|/2 instead.
    sin_t = 0.5 * jnp.sqrt(jnp.sum(w_small * w_small, axis=-1) + 1e-24)
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(sin_t, 0.0, 1.0 - 1e-7))
    w_pi = theta_pi[..., None] * axis * sign
    # threshold must exceed the clip margin above (arccos(-1+1e-7) =
    # pi - ~4.5e-4), else clipped near-pi rotations fall into the generic
    # branch whose sin(theta) denominator no longer matches R
    near_pi = (jnp.pi - theta) < 5e-4
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian of SO(3): J_l(w) = I + B w^ + C w^^2."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, b, c = _taylor_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian: J_r(w) = J_l(-w). Used by IMU preintegration
    (reference semantics: src/ImuTypes.cc:254 RightJacobianSO3)."""
    return so3_left_jacobian(-w)


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse right Jacobian, closed form (reference: InverseRightJacobianSO3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS * (theta_sq < _EPS))
    W = hat(w)
    W2 = W @ W
    small = theta_sq < _EPS
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / theta_sq) - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta) + 1e-20),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + coef[..., None, None] * W2


def so3_normalize(R: jax.Array) -> jax.Array:
    """Re-orthonormalize a rotation matrix via SVD (drift control after
    many composed updates; the reference relies on Sophus' quaternion
    normalization for the same purpose)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]], axis=-1
    )
    return (u * fix[..., None, :]) @ vt


# ---------------------------------------------------------------------------
# SE(3): represented as (R: (...,3,3), t: (...,3)) pairs.
# ---------------------------------------------------------------------------


def se3_exp(xi: jax.Array):
    """Exp map se(3) -> SE(3). xi = (..., 6) ordered (rho, phi) = (trans, rot).

    Returns (R, t) with t = J_l(phi) @ rho.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), rho)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """Log map SE(3) -> se(3), ordered (rho, phi)."""
    phi = so3_log(R)
    theta_sq = jnp.sum(phi * phi, axis=-1)
    _, b, c = _taylor_coeffs(theta_sq)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    # J_l^{-1} = I - 1/2 W + (1/t^2)(1 - A/(2B)) W^2
    theta = jnp.sqrt(theta_sq + _EPS * (theta_sq < _EPS))
    small = theta_sq < _EPS
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / theta_sq) * (1.0 - (theta * jnp.sin(theta)) / (2.0 * (1.0 - jnp.cos(theta)) + 1e-20)),
    )
    Jl_inv = eye - 0.5 * W + coef[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Jl_inv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inverse(R: jax.Array, t: jax.Array):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, p):
    """Transform points p (..., 3) by (R, t)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


# ---------------------------------------------------------------------------
# Sim(3): (R, t, s). Used by loop closing / map merging
# (reference semantics: Thirdparty/Sophus/sophus/sim3.hpp, src/Sim3Solver.cc).
# ---------------------------------------------------------------------------


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), s_inv


def sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """(Ra,ta,sa) * (Rb,tb,sb): x -> sa Ra (sb Rb x + tb) + ta."""
    return Ra @ Rb, sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta, sa * sb


def sim3_exp(xi: jax.Array):
    """Exp map sim(3) -> Sim(3). xi = (..., 7) ordered (rho, phi, sigma).

    Uses the closed-form W matrix (Strasdat thesis); scale s = exp(sigma).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS * (theta_sq < _EPS))
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # W_sim = A I + B W + C W^2 with scale-aware coefficients.
    near_zero_theta = theta_sq < _EPS
    near_zero_sigma = jnp.abs(sigma) < 1e-5

    # Coefficients (see Sophus sim3 derivation — standard closed form):
    #   A = (s - 1)/sigma
    #   B = (sigma(s sin th) + (1 - s cos th) th) / (th (sigma^2 + th^2))
    #   C = (s - 1)/sigma/th^2 - ((s cos th - 1) sigma + s sin th * th)/(th^2 (sigma^2+th^2))
    sig_safe = jnp.where(near_zero_sigma, 1.0, sigma)
    th_safe = jnp.where(near_zero_theta, 1.0, theta)
    a_coef = jnp.where(near_zero_sigma, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)
    denom = sig_safe * sig_safe + th_safe * th_safe
    b_gen = (
        sig_safe * (s * jnp.sin(th_safe)) + (1.0 - s * jnp.cos(th_safe)) * th_safe
    ) / (th_safe * denom)
    c_gen = (
        (s - 1.0) / sig_safe / (th_safe * th_safe)
        - ((s * jnp.cos(th_safe) - 1.0) * sig_safe + s * jnp.sin(th_safe) * th_safe)
        / (th_safe * th_safe * denom)
    )
    _, b_rot, c_rot = _taylor_coeffs(theta_sq)
    b_coef = jnp.where(near_zero_sigma, b_rot, jnp.where(near_zero_theta, 0.5, b_gen))
    c_coef = jnp.where(near_zero_sigma, c_rot, jnp.where(near_zero_theta, 1.0 / 6.0, c_gen))
    Wmat = a_coef[..., None, None] * eye + b_coef[..., None, None] * W + c_coef[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", Wmat, rho)
    return R, t, s


def sim3_log(R, t, s):
    """Log map Sim(3) -> sim(3) via solving the W system (numerically, by
    constructing W from (phi, sigma) and solving W rho = t)."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    xi_rot = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    # Rebuild W with rho = I columns to get the matrix, then solve.
    eye3 = jnp.eye(3, dtype=R.dtype)

    def _w_col(col):
        xi = xi_rot.at[..., :3].set(jnp.broadcast_to(col, phi.shape))
        _, t_col, _ = sim3_exp(xi)
        return t_col

    cols = [_w_col(eye3[i]) for i in range(3)]
    Wmat = jnp.stack(cols, axis=-1)
    rho = jnp.linalg.solve(Wmat, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (serialization / trajectory export boundary; TUM format is
# tx ty tz qx qy qz qw — reference: src/System.cc:569+ trajectory writers).
# ---------------------------------------------------------------------------


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) quaternion (x, y, z, w), Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = m00 + m11 + m22

    def _case0():  # w largest
        w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + trace, 1e-12))
        inv = 0.25 / w
        return jnp.stack([(m21 - m12) * inv, (m02 - m20) * inv, (m10 - m01) * inv, w], axis=-1)

    def _case1():  # x largest
        x = 0.5 * jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12))
        inv = 0.25 / x
        return jnp.stack([x, (m01 + m10) * inv, (m02 + m20) * inv, (m21 - m12) * inv], axis=-1)

    def _case2():  # y largest
        y = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12))
        inv = 0.25 / y
        return jnp.stack([(m01 + m10) * inv, y, (m12 + m21) * inv, (m02 - m20) * inv], axis=-1)

    def _case3():  # z largest
        z = 0.5 * jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12))
        inv = 0.25 / z
        return jnp.stack([(m02 + m20) * inv, (m12 + m21) * inv, z, (m10 - m01) * inv], axis=-1)

    c0 = _case0()
    c1 = _case1()
    c2 = _case2()
    c3 = _case3()
    cond_w = trace > 0.0
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(
        cond_w[..., None], c0, jnp.where(cond_x[..., None], c1, jnp.where(cond_y[..., None], c2, c3))
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) (x, y, z, w) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
