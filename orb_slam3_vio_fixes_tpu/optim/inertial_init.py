"""Inertial-only optimization: gravity direction, scale, biases, velocities.

TPU-native replacement for the reference's IMU initialization solver
(reference: Optimizer::InertialOptimization src/Optimizer.cc:3042-3227 —
poses FIXED, per-KF velocities free, ONE shared gyro/acc bias, a 2-DoF
gravity-direction vertex VertexGDir and a scale vertex VertexScale (fixed for
stereo, :3123); EdgeInertialGS 8-vertex factors :3163-3176; 200 LM its :3045.
Also the bias-only overload :3230 and scale/gravity-only overload :3397).

Re-design: the whole problem is ONE flattened parameter vector
  x = [v_0..v_{K-1} (3K), bg (3), ba (3), theta_g (2), log_s (1)]
with residuals the 9-dim preintegration factors between consecutive keyframes
plus bias priors. Jacobians come from one vmapped jacfwd over the per-factor
residual; the normal equations are tiny (3K+9 square) and solved densely.
Everything is fixed-shape: pairs are padded with valid=False.

Residual (reference EdgeInertialGS, src/G2oTypes.cc:596+; SURVEY.md A.4):
  g   = Rwg(theta) @ (0,0,-G)
  er  = Log(dR(bg)^T R1^T R2)
  ev  = R1^T (s*v2 - s*v1 - g*dt) - dV(bg,ba)
  ep  = R1^T (s*(p2 - p1 - v1*dt)) - 0.5 R1^T g dt^2... (see _residual)
weighted by the inverse preintegration covariance (9x9, eigen-clamped
pseudo-inverse like src/G2oTypes.cc:500-508).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.utils import lie


class InertialInitFactors(NamedTuple):
    """Per consecutive-KF-pair preintegration data, padded to P pairs.

    idx_i/idx_j index keyframes (j = temporal successor of i).
    """

    idx_i: jax.Array     # (P,)
    idx_j: jax.Array     # (P,)
    dT: jax.Array        # (P,)
    dR: jax.Array        # (P,3,3)
    dV: jax.Array        # (P,3)
    dP: jax.Array        # (P,3)
    JRg: jax.Array       # (P,3,3)
    JVg: jax.Array       # (P,3,3)
    JVa: jax.Array       # (P,3,3)
    JPg: jax.Array       # (P,3,3)
    JPa: jax.Array       # (P,3,3)
    info: jax.Array      # (P,9,9) information (inverse covariance)
    bg0: jax.Array       # (P,3) linearization biases
    ba0: jax.Array       # (P,3)
    valid: jax.Array     # (P,)


def information_from_cov(cov: jax.Array, eig_floor: float = 1e-12) -> jax.Array:
    """Symmetrize + pseudo-invert with eigenvalue clamping (reference:
    EdgeInertial ctor src/G2oTypes.cc:500-508)."""
    sym = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    eigval, eigvec = jnp.linalg.eigh(sym)
    inv = jnp.where(eigval > eig_floor, 1.0 / jnp.maximum(eigval, eig_floor), 0.0)
    return jnp.einsum("...ij,...j,...kj->...ik", eigvec, inv, eigvec)


def factors_from_preintegrations(idx_i, idx_j, pres: pre.Preintegrated, valid):
    """Build the factor batch from a stacked (vmapped) Preintegrated pytree."""
    return InertialInitFactors(
        idx_i=jnp.asarray(idx_i, jnp.int32),
        idx_j=jnp.asarray(idx_j, jnp.int32),
        dT=pres.dT, dR=pres.dR, dV=pres.dV, dP=pres.dP,
        JRg=pres.JRg, JVg=pres.JVg, JVa=pres.JVa, JPg=pres.JPg, JPa=pres.JPa,
        info=information_from_cov(pres.cov),
        bg0=pres.bg0, ba0=pres.ba0,
        valid=jnp.asarray(valid, bool),
    )


def _gravity(theta: jax.Array) -> jax.Array:
    """2-DoF gravity direction: g = exp([tx, ty, 0]^) @ gI (reference:
    VertexGDir's Rwg update, include/G2oTypes.h:274)."""
    Rwg = lie.so3_exp(jnp.concatenate([theta, jnp.zeros(1, theta.dtype)]))
    return Rwg @ jnp.array([0.0, 0.0, -pre.GRAVITY], theta.dtype)


def _pair_residual(
    v1, v2, bg, ba, theta, log_s,
    R1, p1, R2, p2,
    f_dT, f_dR, f_dV, f_dP, f_JRg, f_JVg, f_JVa, f_JPg, f_JPa, f_bg0, f_ba0,
):
    """9-dim residual (er, ev, ep) of one preintegration factor."""
    g = _gravity(theta)
    s = jnp.exp(log_s)
    dbg = bg - f_bg0
    dba = ba - f_ba0
    dR = f_dR @ lie.so3_exp(f_JRg @ dbg)
    dV = f_dV + f_JVg @ dbg + f_JVa @ dba
    dP = f_dP + f_JPg @ dbg + f_JPa @ dba
    dt = f_dT
    er = lie.so3_log(dR.T @ R1.T @ R2)
    ev = R1.T @ (s * (v2 - v1) - g * dt) - dV
    ep = R1.T @ (s * (p2 - p1 - v1 * dt) - 0.5 * g * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


class InertialInitConfig(NamedTuple):
    n_iters: int = 30
    prior_gyro: float = 1e2     # priorG (reference: InitializeIMU call sites)
    prior_acc: float = 1e10    # priorA
    fix_scale: bool = True      # stereo/RGBD: scale not optimized
    lambda0: float = 1e-4
    # scale/gravity-only mode (reference: the InertialOptimization overload
    # used by LocalMapping::ScaleRefinement, src/Optimizer.cc:3397 — biases
    # and velocities FIXED, only Rwg + s free)
    fix_bias: bool = False
    fix_vel: bool = False
    # Visual-noise floor for the whitening (errors-in-variables guard).
    # The preintegration covariance alone (sigma ~1e-3) lets VISUAL pose
    # noise dominate the chi2 and — because the position/rotation errors
    # enter the residual scaled by s — biases the scale estimate toward
    # small s (measured: a 7x-understated mono map beat the true scale).
    # sigma_vis_rot: keyframe relative-rotation noise (rad) added to the er
    # rows; sigma_vis_pos: keyframe position noise in MAP units (the ep rows
    # get s * sigma_vis_pos, tracking the estimate). 0 = exact reference
    # weighting (EdgeInertialGS info, src/G2oTypes.h:548).
    sigma_vis_rot: float = 0.0
    sigma_vis_pos: float = 0.0


@functools.partial(jax.jit, static_argnames=("cfg",))
def inertial_optimization(
    R_wb: jax.Array,      # (K,3,3) body-in-world rotations (FIXED)
    p_wb: jax.Array,      # (K,3) body positions (FIXED)
    v0: jax.Array,        # (K,3) initial velocities
    factors: InertialInitFactors,
    cfg: InertialInitConfig = InertialInitConfig(),
    bg_init: jax.Array | None = None,   # (3,) shared-bias start (default 0)
    ba_init: jax.Array | None = None,
    scale_init: jax.Array | None = None,  # scalar scale start (default 1)
):
    """Returns (v, bg, ba, Rwg, scale, chi2_history).

    Gravity starts at -Z; the caller typically pre-rotates the world so the
    mean acceleration points down (reference: the dirG bootstrap in
    LocalMapping::InitializeIMU src/LocalMapping.cc:1228-1253) — that is the
    caller's job; here theta=0 is the linearization point.
    """
    K = R_wb.shape[0]
    n_params = 3 * K + 3 + 3 + 2 + 1

    def unpack(x):
        v = x[: 3 * K].reshape(K, 3)
        bg = x[3 * K: 3 * K + 3]
        ba = x[3 * K + 3: 3 * K + 6]
        theta = x[3 * K + 6: 3 * K + 8]
        log_s = x[3 * K + 8]
        return v, bg, ba, theta, log_s

    def residual_of_pair(x, k):
        v, bg, ba, theta, log_s = unpack(x)
        i = factors.idx_i[k]
        j = factors.idx_j[k]
        return _pair_residual(
            v[i], v[j], bg, ba, theta, log_s,
            R_wb[i], p_wb[i], R_wb[j], p_wb[j],
            factors.dT[k], factors.dR[k], factors.dV[k], factors.dP[k],
            factors.JRg[k], factors.JVg[k], factors.JVa[k],
            factors.JPg[k], factors.JPa[k], factors.bg0[k], factors.ba0[k],
        )

    P = factors.idx_i.shape[0]
    ks = jnp.arange(P)

    # whitened residual stack: L^T r with info = L L^T (use eigen sqrt)
    eigval, eigvec = jnp.linalg.eigh(factors.info)
    sqrt_info = jnp.einsum(
        "pij,pj,pkj->pik", eigvec, jnp.sqrt(jnp.maximum(eigval, 0.0)), eigvec
    )

    # diagonal preintegration variances (for the EIV-aware whitening mode)
    diag_cov = jnp.diagonal(
        jnp.linalg.inv(factors.info + 1e-12 * jnp.eye(9)[None]),
        axis1=-2, axis2=-1)                                          # (P,9)

    def full_residual(x):
        res = jax.vmap(lambda k: residual_of_pair(x, k))(ks)        # (P,9)
        v, bg, ba, theta, log_s = unpack(x)
        if cfg.sigma_vis_rot > 0.0 or cfg.sigma_vis_pos > 0.0:
            # componentwise whitening with the visual-noise floor: er rows
            # carry 2*sigma_r^2; ep rows carry 2*(s*sigma_p)^2 (positions
            # enter scaled by s, so the floor must track the estimate)
            s = jnp.exp(log_s)
            var = diag_cov + jnp.concatenate([
                jnp.full(3, 2.0 * cfg.sigma_vis_rot ** 2),
                jnp.zeros(3),
                jnp.full(3, 2.0) * (s * cfg.sigma_vis_pos) ** 2,
            ])[None, :]
            res = res / jnp.sqrt(var)
        else:
            res = jnp.einsum("pij,pj->pi", sqrt_info, res)
        res = jnp.where(factors.valid[:, None], res, 0.0)
        # bias priors (reference: EdgePriorGyro/Acc with priorG/priorA infos)
        r_bg = jnp.sqrt(cfg.prior_gyro) * bg
        r_ba = jnp.sqrt(cfg.prior_acc) * ba
        return jnp.concatenate([res.reshape(-1), r_bg, r_ba])

    # DoF mask: scale frozen for stereo; velocity/bias blocks frozen in
    # scale/gravity-only refinement mode
    dof = jnp.ones(n_params)
    if cfg.fix_scale:
        dof = dof.at[-1].set(0.0)
    if cfg.fix_vel:
        dof = dof.at[: 3 * K].set(0.0)
    if cfg.fix_bias:
        dof = dof.at[3 * K : 3 * K + 6].set(0.0)

    bg0x = jnp.zeros(3) if bg_init is None else bg_init
    ba0x = jnp.zeros(3) if ba_init is None else ba_init
    ls0 = (jnp.zeros(1) if scale_init is None
           else jnp.log(jnp.maximum(jnp.atleast_1d(scale_init), 1e-6)))
    x0 = jnp.concatenate([v0.reshape(-1), bg0x, ba0x, jnp.zeros(2), ls0])

    def lm_step(carry, _):
        x, lam = carry
        r = full_residual(x)
        J = jax.jacfwd(full_residual)(x) * dof[None, :]
        H = J.T @ J
        b = -J.T @ r
        damp = lam * jnp.maximum(jnp.diag(H), 1e-6)
        damp = jnp.where(dof > 0, damp, 1.0)
        dx = jax.scipy.linalg.solve(H + jnp.diag(damp), b, assume_a="pos")
        dx = dx * dof
        x_new = x + dx
        c_old = jnp.sum(r * r)
        r_new = full_residual(x_new)
        c_new = jnp.sum(r_new * r_new)
        ok = c_new < c_old
        x2 = jnp.where(ok, x_new, x)
        lam2 = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 8.0, 1e6))
        return (x2, lam2), c_old

    (x, _), chi2 = jax.lax.scan(
        lm_step, (x0, jnp.float32(cfg.lambda0)), None, length=cfg.n_iters
    )
    v, bg, ba, theta, log_s = unpack(x)
    Rwg = lie.so3_exp(jnp.concatenate([theta, jnp.zeros(1, theta.dtype)]))
    return v, bg, ba, Rwg, jnp.exp(log_s), chi2


def visual_inertial_alignment(R_wb, p_wb, factors: InertialInitFactors):
    """Closed-form linear alignment: velocities, gravity and scale from the
    preintegration constraints (zero bias), solved as one least-squares
    system on the host.

    With biases fixed the two preintegration equations are LINEAR in
    x = [v_0..v_{K-1} (metric), g (3), s]:
        R1ᵀ (v_j - v_i - g dt)                    = dV
        R1ᵀ (s (p_j - p_i) - v_i dt - 0.5 g dt²)  = dP
    (VINS-Mono-style initialization). The reference instead runs a 200-it LM
    from s=1 after its gravity bootstrap (src/LocalMapping.cc:1228-1267,
    src/Optimizer.cc:3045) — a monocular map whose true scale is far from 1
    can strand that LM in a wrong basin; the linear seed lands in the right
    one, and the nonlinear refinement then polishes with bias estimation.

    Returns (v (K,3), g (3), s: float) as numpy arrays.
    """
    import numpy as np

    R = np.asarray(R_wb, np.float64)
    p = np.asarray(p_wb, np.float64)
    K = R.shape[0]
    idx_i = np.asarray(factors.idx_i)
    idx_j = np.asarray(factors.idx_j)
    valid = np.asarray(factors.valid)
    dT = np.asarray(factors.dT, np.float64)
    dV = np.asarray(factors.dV, np.float64)
    dP = np.asarray(factors.dP, np.float64)
    n = 3 * K + 4
    rows, rhs = [], []
    for k in range(idx_i.shape[0]):
        if not valid[k]:
            continue
        i, j = int(idx_i[k]), int(idx_j[k])
        R1T = R[i].T
        dt = dT[k]
        # velocity equation
        a = np.zeros((3, n))
        a[:, 3 * i : 3 * i + 3] = -R1T
        a[:, 3 * j : 3 * j + 3] = R1T
        a[:, 3 * K : 3 * K + 3] = -R1T * dt
        rows.append(a)
        rhs.append(dV[k])
        # position equation
        a = np.zeros((3, n))
        a[:, 3 * i : 3 * i + 3] = -R1T * dt
        a[:, 3 * K : 3 * K + 3] = -0.5 * R1T * dt * dt
        a[:, 3 * K + 3] = R1T @ (p[j] - p[i])
        rows.append(a)
        rhs.append(dP[k])
    A = np.concatenate(rows, axis=0)
    b = np.concatenate(rhs, axis=0)
    x, *_ = np.linalg.lstsq(A, b, rcond=None)
    v = x[: 3 * K].reshape(K, 3)
    g = x[3 * K : 3 * K + 3]
    s = float(x[3 * K + 3])
    return v.astype(np.float32), g.astype(np.float32), s


def gravity_bootstrap(R_wb: jax.Array, dV: jax.Array, valid: jax.Array):
    """Initial world rotation aligning accumulated velocity-deltas with -Z
    gravity (reference: LocalMapping::InitializeIMU src/LocalMapping.cc:
    1228-1253 — dirG = -sum(R_i dV_i), then Rwg from the axis-angle between
    dirG and gI). Returns R_wg such that rotating the world by R_wg^T makes
    gravity point to (0,0,-G)."""
    dirG = -jnp.sum(
        jnp.where(valid[:, None], jnp.einsum("kij,kj->ki", R_wb, dV), 0.0), axis=0
    )
    dirG = dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI = jnp.array([0.0, 0.0, -1.0], dirG.dtype)
    v = jnp.cross(gI, dirG)
    cosg = jnp.dot(gI, dirG)
    nv = jnp.linalg.norm(v)
    ang = jnp.arctan2(nv, cosg)
    axis = v / jnp.maximum(nv, 1e-9)
    return lie.so3_exp(axis * ang)


@jax.jit
def apply_scaled_rotation(
    kf_R, kf_t, kf_vel, lm_pos, R_gw: jax.Array, scale: jax.Array,
):
    """Rotate + rescale the whole map into the gravity-aligned frame
    (reference: Map::ApplyScaledRotation src/Map.cc:252-284 — T_cw' =
    T_cw * [R_gw^T | 0]^-1 with translation scaling, velocities v' = s R_gw v,
    points x' = s R_gw x).

    R_gw rotates old-world vectors into the new (gravity-aligned) world.
    Returns (kf_R, kf_t, kf_vel, lm_pos).
    """
    # camera pose: x_c = R_cw x_w + t_cw; new world x_w' = s R_gw x_w
    # => R_cw' = R_cw R_gw^T, t_cw' = s t_cw
    new_R = kf_R @ R_gw.T
    new_t = kf_t * scale
    new_vel = scale * jnp.einsum("ij,kj->ki", R_gw, kf_vel)
    new_lm = scale * jnp.einsum("ij,kj->ki", R_gw, lm_pos)
    return new_R, new_t, new_vel, new_lm
