"""Full-map visual-inertial bundle adjustment, matrix-free CG Schur.

TPU-native equivalent of the reference's FullInertialBA
(reference: src/Optimizer.cc:392-812 — 15-DoF vertices per keyframe
(VertexPose/Velocity/GyroBias/AccBias), EdgeInertial + EdgeGyroRW + EdgeAccRW
chain :532-563, Huber delta = sqrt(16.92) :542), which the reference runs as
  * the global BA after an inertial loop correction
    (src/LoopClosing.cc:2284-2286),
  * the full-map BA right after IMU initialization
    (src/LocalMapping.cc:1304-1310), and
  * (window-restricted) MergeInertialBA after an inertial map merge
    (src/Optimizer.cc:3956-4497) — here expressed with a pose_fixed mask
    over the non-window keyframes instead of a separate optimizer.

Re-design: one 15-DoF state per keyframe slot (so3+translation, velocity,
gyro/acc bias, body frame). Landmarks are Schur-eliminated exactly like the
visual CG path (optim/ba_core.schur_cg_solve); the reduced camera system
additionally carries the IMU chain's 15x15 diagonal and off-diagonal blocks,
applied factor-wise inside the CG matvec — S is never materialized, memory
stays O(F + K + L).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.optim import vi_ba
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


class VIGBAConfig(NamedTuple):
    n_rounds: int = 2
    n_iters: int = 6
    cg_iters: int = 40
    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    huber_inertial: float = 16.92
    lambda0: float = 1e-4
    bias_prior: float = 1e2   # per-KF prior pulling gyro/acc biases toward
                              # their entry values (reference: init-mode
                              # FullInertialBA shares ONE bias + adds priors,
                              # src/Optimizer.cc:456-466,570+ — a fresh map's
                              # biases are barely observable per-keyframe)


def _body_states(state: ms.MapState, R_cb, t_cb):
    """kf T_cw -> body (R_wb, p_wb) — exact inverse of _cam_states.

    With x_c = R_cb x_b + t_cb (body->camera) and kf pose T_cw:
    R_wb = R_wc R_cb, p_wb = t_wc + R_wc t_cb. Delegates to the shared
    batched helper so the convention can't drift from the tracking path."""
    from orb_slam3_vio_fixes_tpu.frontend.inertial_tracking import body_from_cam
    return body_from_cam(state.kf_R, state.kf_t, R_cb, t_cb)


def _cam_states(R_wb, p_wb, R_cb, t_cb):
    """body -> kf T_cw: T_cw = T_cb * T_bw."""
    R_bw = jnp.swapaxes(R_wb, -1, -2)
    kf_R = jnp.einsum("ij,kjl->kil", R_cb, R_bw)
    kf_t = -jnp.einsum("kij,kj->ki", kf_R, p_wb) \
        + jnp.zeros_like(p_wb) + t_cb
    return kf_R, kf_t


def _reproj_blocks(R_wb, p_wb, lm, factors, cam, bf, R_cb, t_cb,
                   pose_fixed, lm_fixed, inlier, cfg: VIGBAConfig):
    """Per-factor Gauss-Newton blocks of the reprojection term in BODY-state
    perturbation coordinates (matching vi_ba._apply_eps).

    Returns (Hpl_f (F,6,3), Hpp (K,6,6), Hll (L,3,3), bp (K,6), bl (L,3),
    chi2 (F,))."""
    K = R_wb.shape[0]
    L = lm.shape[0]
    pidx = factors.state_idx
    lidx = factors.lm_idx
    uvr = factors.uvr
    is_stereo = uvr[:, 2] >= 0.0

    def res(eps6, dlm, Rk, pk, X, uvr_f):
        r = vi_ba._reproj_residual(
            jnp.concatenate([eps6, jnp.zeros(9)]), dlm, Rk, pk,
            jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), X, uvr_f,
            cam, bf, R_cb, t_cb)
        return r

    z6 = jnp.zeros(6)
    z3 = jnp.zeros(3)
    Rk = R_wb[pidx]
    pk = p_wb[pidx]
    X = lm[lidx]
    r0 = jax.vmap(lambda R_, p_, X_, u_: res(z6, z3, R_, p_, X_, u_))(
        Rk, pk, X, uvr)
    Jp = jax.vmap(lambda R_, p_, X_, u_: jax.jacfwd(
        lambda e: res(e, z3, R_, p_, X_, u_))(z6))(Rk, pk, X, uvr)
    Jl = jax.vmap(lambda R_, p_, X_, u_: jax.jacfwd(
        lambda d: res(z6, d, R_, p_, X_, u_))(z3))(Rk, pk, X, uvr)
    # mono: zero the right-coordinate row
    row_w = jnp.where(is_stereo[:, None],
                      jnp.ones((1, 3)), jnp.array([[1.0, 1.0, 0.0]]))
    r0 = r0 * row_w
    Jp = Jp * row_w[:, :, None]
    Jl = Jl * row_w[:, :, None]
    chi2 = factors.inv_sigma2 * jnp.sum(r0 * r0, -1)
    delta2 = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    w = factors.inv_sigma2 * vi_ba._huber_w(chi2, delta2)
    w = jnp.where(factors.valid & inlier, w, 0.0)
    Jp = jnp.where(pose_fixed[pidx][:, None, None], 0.0, Jp)
    Jl = jnp.where(lm_fixed[lidx][:, None, None], 0.0, Jl)
    Jp = jnp.where((w > 0)[:, None, None], Jp, 0.0)
    Jl = jnp.where((w > 0)[:, None, None], Jl, 0.0)
    r0 = jnp.where((w > 0)[:, None], r0, 0.0)
    wJp = w[:, None, None] * Jp
    wJl = w[:, None, None] * Jl
    Hpp = jnp.zeros((K, 6, 6)).at[pidx].add(jnp.einsum("fri,frj->fij", wJp, Jp))
    Hll = jnp.zeros((L, 3, 3)).at[lidx].add(jnp.einsum("fri,frj->fij", wJl, Jl))
    Hpl_f = jnp.einsum("fri,frj->fij", wJp, Jl)
    bp = jnp.zeros((K, 6)).at[pidx].add(-jnp.einsum("fri,fr->fi", wJp, r0))
    bl = jnp.zeros((L, 3)).at[lidx].add(-jnp.einsum("fri,fr->fi", wJl, r0))
    return Hpl_f, Hpp, Hll, bp, bl, chi2


def _imu_blocks(R_wb, p_wb, v, bg, ba, inertial: vi_ba.VIInertialFactors,
                pose_fixed, cfg: VIGBAConfig):
    """IMU chain + bias-RW Gauss-Newton blocks in 15-DoF state space.

    Returns (Hii (P,15,15), Hjj (P,15,15), Hij (P,15,15), bi (P,15),
    bj (P,15)); fixed states' rows/cols are zeroed."""
    ii, jj = inertial.idx_i, inertial.idx_j

    def one(k):
        z = jnp.zeros(15)

        def r_imu(ei, ej):
            return vi_ba._inertial_residual(
                ei, ej,
                R_wb[ii[k]], p_wb[ii[k]], v[ii[k]], bg[ii[k]], ba[ii[k]],
                R_wb[jj[k]], p_wb[jj[k]], v[jj[k]], bg[jj[k]], ba[jj[k]],
                inertial.dT[k], inertial.dR[k], inertial.dV[k],
                inertial.dP[k], inertial.JRg[k], inertial.JVg[k],
                inertial.JVa[k], inertial.JPg[k], inertial.JPa[k],
                inertial.bg0[k], inertial.ba0[k])

        def r_rw(ei, ej):
            return vi_ba._bias_rw_residual(
                ei, ej, bg[ii[k]], ba[ii[k]], bg[jj[k]], ba[jj[k]])

        r9 = r_imu(z, z)
        Ji = jax.jacfwd(lambda e: r_imu(e, z))(z)       # (9,15)
        Jj = jax.jacfwd(lambda e: r_imu(z, e))(z)
        W9 = inertial.info[k]
        chi2 = r9 @ W9 @ r9
        hw = vi_ba._huber_w(chi2, cfg.huber_inertial)
        W9 = hw * W9
        rw = r_rw(z, z)
        Jri = jax.jacfwd(lambda e: r_rw(e, z))(z)       # (6,15)
        Jrj = jax.jacfwd(lambda e: r_rw(z, e))(z)
        W6 = inertial.info_rw[k]
        ok = inertial.valid[k]
        fi = pose_fixed[ii[k]]
        fj = pose_fixed[jj[k]]
        Ji = jnp.where(ok & ~fi, Ji, 0.0)
        Jj = jnp.where(ok & ~fj, Jj, 0.0)
        Jri = jnp.where(ok & ~fi, Jri, 0.0)
        Jrj = jnp.where(ok & ~fj, Jrj, 0.0)
        r9 = jnp.where(ok, r9, 0.0)
        rw = jnp.where(ok, rw, 0.0)
        Hii = Ji.T @ W9 @ Ji + Jri.T @ W6 @ Jri
        Hjj = Jj.T @ W9 @ Jj + Jrj.T @ W6 @ Jrj
        Hij = Ji.T @ W9 @ Jj + Jri.T @ W6 @ Jrj
        bi = -(Ji.T @ W9 @ r9 + Jri.T @ W6 @ rw)
        bj = -(Jj.T @ W9 @ r9 + Jrj.T @ W6 @ rw)
        return Hii, Hjj, Hij, bi, bj, chi2 * ok

    return jax.vmap(one)(jnp.arange(ii.shape[0]))


def _vi_gba_solve(x, factors: vi_ba.VIReprojFactors,
                  inertial: vi_ba.VIInertialFactors,
                  pose_fixed, lm_fixed, bg_ref, ba_ref,
                  cam, bf, R_cb, t_cb, cfg: VIGBAConfig, axis=None):
    """The LM/CG solve loop shared by the single-device and the
    landmark-sharded (shard_map) paths.

    x = (R_wb (K), p_wb, v, bg, ba, lm (L or local shard)). With `axis` set
    the factor/landmark arrays are this shard's block and every
    keyframe-sized reduction crosses the mesh as a psum: the (K,6) Schur
    partials per CG iteration, the (K,6,6)+(K,6) camera blocks and the chi2
    scalar per LM iteration — bytes independent of L and F (the same
    communication shape as parallel/sharded_ba). Returns (x', inlier)."""
    K = x[0].shape[0]
    L = x[5].shape[0]
    pose_idx = factors.state_idx
    lm_idx = factors.lm_idx
    is_stereo_f = factors.uvr[:, 2] >= 0.0
    delta2_f = jnp.where(is_stereo_f, cfg.chi2_stereo, cfg.chi2_mono)
    inlier = jnp.ones(pose_idx.shape[0], bool)

    def ps(v):
        return v if axis is None else jax.lax.psum(v, axis)

    def tree_where(c, a, b):
        return jax.tree_util.tree_map(
            lambda u, w: jnp.where(c, u, w), a, b)

    def lm_round(carry, _):
        x, inlier = carry
        lam0 = jnp.float32(cfg.lambda0)

        def lm_iter(carry2, _):
            # chi2-guarded LM: a step that worsens the (robustified) total
            # error is rejected — the state reverts to the best seen and the
            # damping rises (plain always-accept GN can diverge on real maps)
            x, x_best, chi2_best, lam = carry2
            R_wb, p_wb, v, bg, ba, lm = x
            Hpl_f, Hpp6, Hll, bp6, bl, chi2_f = _reproj_blocks(
                R_wb, p_wb, lm, factors, cam, bf, R_cb, t_cb,
                pose_fixed, lm_fixed, inlier, cfg)
            Hii, Hjj, Hij, bi, bj, chi2_imu = _imu_blocks(
                R_wb, p_wb, v, bg, ba, inertial, pose_fixed, cfg)
            Hpp6 = ps(Hpp6)
            bp6 = ps(bp6)
            chi2_x = ps(jnp.sum(jnp.where(
                factors.valid & inlier,
                jnp.minimum(chi2_f, 4.0 * delta2_f), 0.0))) \
                + jnp.sum(jnp.minimum(chi2_imu, 4.0 * cfg.huber_inertial))
            good = chi2_x <= chi2_best
            x_best = tree_where(good, x, x_best)
            chi2_best = jnp.minimum(chi2_x, chi2_best)
            lam = jnp.where(good, lam * 0.7, lam * 4.0)
            # assemble 15-DoF diagonal blocks + gradient
            Hpp = jnp.zeros((K, 15, 15))
            Hpp = Hpp.at[:, :6, :6].set(Hpp6)
            Hpp = Hpp.at[inertial.idx_i].add(Hii)
            Hpp = Hpp.at[inertial.idx_j].add(Hjj)
            bp = jnp.zeros((K, 15)).at[:, :6].set(bp6)
            bp = bp.at[inertial.idx_i].add(bi)
            bp = bp.at[inertial.idx_j].add(bj)
            # bias prior toward the entry estimate (init-mode safeguard)
            if cfg.bias_prior > 0:
                wb = jnp.float32(cfg.bias_prior)
                eye6b = jnp.eye(6) * wb
                Hpp = Hpp.at[:, 9:15, 9:15].add(eye6b[None])
                bp = bp.at[:, 9:12].add(-wb * (bg - bg_ref))
                bp = bp.at[:, 12:15].add(-wb * (ba - ba_ref))
            # damping + landmark-block inversion
            eye15 = jnp.eye(15)
            Hpp_d = Hpp + lam * Hpp * eye15 + 1e-8 * eye15
            eye3 = jnp.eye(3)
            Hll_d = Hll + lam * Hll * eye3
            lm_active = jnp.abs(Hll_d).sum((-1, -2)) > 1e-12
            Hll_d = jnp.where(lm_active[:, None, None], Hll_d, eye3)
            mu = 1e-3 * jnp.trace(Hll_d, axis1=-2, axis2=-1) / 3.0 + 1e-8
            Hll_inv = jnp.linalg.inv(Hll_d + mu[:, None, None] * eye3)
            free = ~pose_fixed

            def hpl_hinv_hplT(v6):
                u = jnp.einsum("fij,fi->fj", Hpl_f, v6[pose_idx])
                y = jnp.zeros((L, 3)).at[lm_idx].add(u)
                z = jnp.einsum("lij,lj->li", Hll_inv, y)
                q = jnp.einsum("fij,fj->fi", Hpl_f, z[lm_idx])
                return ps(jnp.zeros((K, 6)).at[pose_idx].add(q))

            def matvec(vv):
                vv = jnp.where(free[:, None], vv, 0.0)
                Sv = jnp.einsum("kij,kj->ki", Hpp_d, vv)
                Sv = Sv.at[:, :6].add(-hpl_hinv_hplT(vv[:, :6]))
                # IMU off-diagonal coupling
                Sv = Sv.at[inertial.idx_i].add(
                    jnp.einsum("pij,pj->pi", Hij, vv[inertial.idx_j]))
                Sv = Sv.at[inertial.idx_j].add(
                    jnp.einsum("pji,pj->pi", Hij, vv[inertial.idx_i]))
                return jnp.where(free[:, None], Sv, 0.0)

            # rhs = bp - [Hpl Hll^-1 bl; 0]
            z0 = jnp.einsum("lij,lj->li", Hll_inv, bl)
            q0 = jnp.einsum("fij,fj->fi", Hpl_f, z0[lm_idx])
            rhs = bp.at[:, :6].add(
                -ps(jnp.zeros((K, 6)).at[pose_idx].add(q0)))
            rhs = jnp.where(free[:, None], rhs, 0.0)

            diag_ok = (jnp.abs(Hpp_d).sum((-1, -2)) > 1e-9) & free
            M = jnp.where(diag_ok[:, None, None], Hpp_d, eye15)
            Minv = jnp.linalg.inv(M)

            def precond(r):
                return jnp.einsum("kij,kj->ki", Minv, r)

            xx = jnp.zeros_like(rhs)
            r = rhs
            z = precond(r)
            p = z
            rz = jnp.sum(r * z)

            def cg_body(c, _):
                xx, r, p, rz = c
                Ap = matvec(p)
                pAp = jnp.sum(p * Ap)
                ok = (pAp > 1e-20) & (rz > 1e-20)
                alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
                xx = xx + alpha * p
                r = r - alpha * Ap
                z = precond(r)
                rz_new = jnp.sum(r * z)
                beta = jnp.where(ok, rz_new / jnp.where(rz > 1e-20, rz, 1.0), 0.0)
                p = z + beta * p
                return (xx, r, p, rz_new), None

            (dx, _, _, _), _ = jax.lax.scan(
                cg_body, (xx, r, z, rz), None, length=cfg.cg_iters)
            dx = jnp.where(free[:, None], dx, 0.0)
            # landmark back-substitution
            u = jnp.einsum("fij,fi->fj", Hpl_f, dx[pose_idx, :6])
            y = jnp.zeros((L, 3)).at[lm_idx].add(u)
            dlm = jnp.einsum("lij,lj->li", Hll_inv, bl - y)
            dlm = jnp.where((lm_fixed | ~lm_active)[:, None], 0.0, dlm)

            # apply
            def apply_one(R_, p_, v_, bg_, ba_, e):
                return vi_ba._apply_eps(R_, p_, v_, bg_, ba_, e)

            R2, p2, v2, bg2, ba2 = jax.vmap(apply_one)(
                R_wb, p_wb, v, bg, ba, dx)
            x2 = (R2, p2, v2, bg2, ba2, lm + dlm)
            # rejected step: restart from the best state (the step direction
            # was computed at a diverged point)
            x_next = tree_where(good, x2, x_best)
            return (x_next, x_best, chi2_best, lam), None

        big = jnp.float32(1e30)
        (x_last, x_best, chi2_best, _), _ = jax.lax.scan(
            lm_iter, (x, x, big, lam0), None, length=cfg.n_iters)
        # the final candidate state was stepped but never chi2-evaluated —
        # evaluate and keep whichever is better
        R_wb, p_wb, v, bg, ba, lm = x_last
        _, _, _, _, _, chi2_f = _reproj_blocks(
            R_wb, p_wb, lm, factors, cam, bf, R_cb, t_cb,
            pose_fixed, lm_fixed, inlier, cfg)
        _, _, _, _, _, chi2_imu = _imu_blocks(
            R_wb, p_wb, v, bg, ba, inertial, pose_fixed, cfg)
        chi2_last = ps(jnp.sum(jnp.where(
            factors.valid & inlier,
            jnp.minimum(chi2_f, 4.0 * delta2_f), 0.0))) \
            + jnp.sum(jnp.minimum(chi2_imu, 4.0 * cfg.huber_inertial))
        x = tree_where(chi2_last <= chi2_best, x_last, x_best)
        # chi2 gate for next round
        R_wb, p_wb, v, bg, ba, lm = x
        _, _, _, _, _, chi2 = _reproj_blocks(
            R_wb, p_wb, lm, factors, cam, bf, R_cb, t_cb,
            pose_fixed, lm_fixed, inlier, cfg)
        inlier = chi2 <= delta2_f
        return (x, inlier), None

    (x, inlier), _ = jax.lax.scan(
        lm_round, (x, inlier), None, length=cfg.n_rounds)
    return x, inlier


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_levels", "scale", "f_budget",
                                    "lm_budget"),
                   donate_argnums=(0,))
def run_global_vi_ba(
    state: ms.MapState,
    inertial: vi_ba.VIInertialFactors,   # full-map chain (P slots)
    inv_sigma2_oct: jax.Array,
    cam: Camera,
    bf,
    calib: pre.ImuCalib,
    pose_fixed_in: jax.Array,            # (K,) bool — gauge + window masks
    cfg: VIGBAConfig = VIGBAConfig(),
    n_levels: int = 8,
    scale: float = 1.2,
    f_budget: int | None = None,
    lm_budget: int | None = None,
):
    """Joint 15-DoF keyframe + landmark optimization over the whole map.

    Returns (state', n_inlier_factors). The caller controls which keyframes
    adjust via pose_fixed_in — all-free = FullInertialBA; welding-window-free
    = MergeInertialBA (src/Optimizer.cc:3956).

    f_budget / lm_budget (static; callers tier them to powers of two of the
    LIVE counts) compact the factor table and landmark axis before the LM/CG
    loop: at map capacity the padded table is K*N rows, but a young map has
    10-20x fewer live observations — the post-IMU-init FullInertialBA
    (reference src/LocalMapping.cc:1304) runs on a ~10-KF map and measured
    ~13 s at the 256-KF/32k-LM tier without compaction."""
    from orb_slam3_vio_fixes_tpu.optim import ba_core

    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    R_cb = calib.R_bc.T
    t_cb = -calib.R_bc.T @ calib.t_bc

    window = jnp.arange(K, dtype=jnp.int32)
    pose_idx, lm_idx, uvr, inv_s2, valid = ms.ba_factors_from_map(
        state, window, inv_sigma2_oct)
    n_obs = ms.landmark_obs_count(state)
    valid = valid & (n_obs[lm_idx] >= 2)
    F_full = pose_idx.shape[0]
    order = None
    if f_budget is not None and f_budget < F_full:
        order, order_ok = ba_core.compact_indices(valid, f_budget)
        pose_idx, lm_idx = pose_idx[order], lm_idx[order]
        uvr, inv_s2 = uvr[order], inv_s2[order]
        valid = valid[order] & order_ok
    pose_fixed = pose_fixed_in | ~state.kf_valid
    lm_fixed_full = (n_obs < 2) | ~state.lm_valid
    sub_idx = None
    if lm_budget is not None and lm_budget < L:
        used = jnp.zeros(L, bool).at[jnp.clip(lm_idx, 0, L - 1)].max(valid)
        sub_idx, sub_ok = ba_core.compact_indices(used, lm_budget)
        remap = jnp.full(L + 1, -1, jnp.int32).at[
            jnp.where(sub_ok, sub_idx, L)].set(
            jnp.arange(lm_budget, dtype=jnp.int32))[:L]
        lm_local = remap[jnp.clip(lm_idx, 0, L - 1)]
        valid = valid & (lm_local >= 0)
        lm_idx = jnp.clip(lm_local, 0, lm_budget - 1)
        lm_fixed = lm_fixed_full[sub_idx] | ~sub_ok
        lm0 = state.lm_pos[sub_idx]
    else:
        lm_fixed = lm_fixed_full
        lm0 = state.lm_pos
    factors = vi_ba.VIReprojFactors(pose_idx, lm_idx, uvr, inv_s2, valid)

    R_wb, p_wb = _body_states(state, R_cb, t_cb)
    x = (R_wb, p_wb, state.kf_vel, state.kf_bg, state.kf_ba, lm0)
    x, inlier = _vi_gba_solve(
        x, factors, inertial, pose_fixed, lm_fixed,
        state.kf_bg, state.kf_ba, cam, bf, R_cb, t_cb, cfg)
    R_wb, p_wb, v, bg, ba, lm = x
    kf_R, kf_t = _cam_states(R_wb, p_wb, R_cb, t_cb)
    upd = state.kf_valid & ~pose_fixed
    if sub_idx is not None:
        lm_write = jnp.where(lm_fixed[:, None], state.lm_pos[sub_idx], lm)
        new_lm_pos = state.lm_pos.at[sub_idx].set(lm_write)
    else:
        new_lm_pos = jnp.where(lm_fixed[:, None], state.lm_pos, lm)
    new_state = state._replace(
        kf_R=jnp.where(upd[:, None, None], kf_R, state.kf_R),
        kf_t=jnp.where(upd[:, None], kf_t, state.kf_t),
        kf_vel=jnp.where(upd[:, None], v, state.kf_vel),
        kf_bg=jnp.where(upd[:, None], bg, state.kf_bg),
        kf_ba=jnp.where(upd[:, None], ba, state.kf_ba),
        lm_pos=new_lm_pos,
        epoch=state.epoch + 1,
    )
    n_inl = jnp.sum((valid & inlier).astype(jnp.int32))
    if order is not None:
        # un-compact the outlier mask back to the (K*N) table layout
        inlier_full = jnp.ones(F_full + 1, bool).at[
            jnp.where(order_ok, order, F_full)].set(inlier | ~valid)[:F_full]
        valid_full = jnp.zeros(F_full + 1, bool).at[
            jnp.where(order_ok, order, F_full)].set(valid)[:F_full]
        drop = (valid_full & ~inlier_full).reshape(K, N)
    else:
        drop = (valid & ~inlier).reshape(K, N)
    new_state = new_state._replace(
        kf_obs=jnp.where(drop, -1, new_state.kf_obs))
    new_state = ms.update_landmark_stats(new_state, n_levels, scale)
    return new_state, n_inl


@functools.lru_cache(maxsize=None)
def _sharded_vi_gba_fn(mesh, axis: str, block: int, cfg: "VIGBAConfig"):
    """Module-level memoized jit of the sharded VI-GBA program: keyed on
    (mesh, axis, landmark-block size, cfg) so repeated loop/merge GBAs at the
    same capacity tier reuse one compilation instead of retracing the whole
    shard_map LM/CG program per call (advisor round-4 finding)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def body(R_wb, p_wb, vel, bg, ba, lm_loc, lm_fixed_loc, pose_fixed,
             f_pose, f_lm, f_uvr, f_is2, f_valid, inertial, cam, bf,
             R_cb, t_cb, bg_ref, ba_ref):
        shard = jax.lax.axis_index(axis)
        factors = vi_ba.VIReprojFactors(
            f_pose, f_lm - shard * block, f_uvr, f_is2, f_valid)
        x0 = (R_wb, p_wb, vel, bg, ba, lm_loc)
        x, inlier = _vi_gba_solve(
            x0, factors, inertial, pose_fixed, lm_fixed_loc,
            bg_ref, ba_ref, cam, bf, R_cb, t_cb, cfg, axis=axis)
        n_inl = jax.lax.psum(
            jnp.sum((f_valid & inlier).astype(jnp.int32)), axis)
        return x[0], x[1], x[2], x[3], x[4], x[5], inlier, n_inl

    @jax.jit
    def _run(R_wb, p_wb, vel, bg, ba, lm_pad, lm_fixed_pad, pose_fixed,
             f_pose, f_lm, f_uvr, f_is2, f_valid, inertial, cam, bf,
             R_cb, t_cb, bg_ref, ba_ref):
        return shard_map(
            body, mesh=mesh,
            in_specs=(
                P(), P(), P(), P(), P(),           # body states (replicated)
                P(axis), P(axis),                  # lm block, lm_fixed block
                P(),                               # pose_fixed
                P(axis), P(axis), P(axis), P(axis), P(axis),  # factors
                P(), P(), P(), P(), P(), P(), P(),  # inertial/cam/bf/ext/refs
            ),
            out_specs=(P(), P(), P(), P(), P(), P(axis), P(axis), P()),
            check_vma=False,
        )(R_wb, p_wb, vel, bg, ba, lm_pad, lm_fixed_pad, pose_fixed,
          f_pose, f_lm, f_uvr, f_is2, f_valid, inertial, cam, bf,
          R_cb, t_cb, bg_ref, ba_ref)

    return _run


def run_global_vi_ba_sharded(
    state: ms.MapState,
    inertial: vi_ba.VIInertialFactors,
    inv_sigma2_oct: jax.Array,
    cam: Camera,
    bf,
    calib: pre.ImuCalib,
    pose_fixed_in,
    mesh,                                # jax.sharding.Mesh with axis `axis`
    cfg: VIGBAConfig = VIGBAConfig(),
    n_levels: int = 8,
    scale: float = 1.2,
    axis: str = "lm",
):
    """Landmark-sharded FullInertialBA over a device mesh.

    Same solve as run_global_vi_ba (the shared _vi_gba_solve), but landmark
    blocks and their reprojection factors live on shards; the O(K) IMU chain
    replicates (it is tiny); keyframe-sized reductions cross the mesh as
    psums. This is the multi-chip GBA the inertial loop-closing path calls
    when a mesh is available (the visual twin is
    parallel/sharded_ba.distributed_global_ba).

    Returns (state', n_inlier_factors)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    n_dev = mesh.shape[axis]
    R_cb = calib.R_bc.T
    t_cb = -calib.R_bc.T @ calib.t_bc

    window = jnp.arange(K, dtype=jnp.int32)
    pose_idx, lm_idx, uvr, inv_s2, valid = ms.ba_factors_from_map(
        state, window, inv_sigma2_oct)
    n_obs = ms.landmark_obs_count(state)
    valid = valid & (n_obs[lm_idx] >= 2)
    pose_fixed = jnp.asarray(pose_fixed_in) | ~state.kf_valid
    lm_fixed = (n_obs < 2) | ~state.lm_valid

    # --- host-side partition: pad L to a multiple of shards; group factors
    # by the shard owning their landmark (same layout as sharded_ba) ---
    Lp = ((L + n_dev - 1) // n_dev) * n_dev
    block = Lp // n_dev
    pad_l = Lp - L

    def pad_lm(a, fill=0):
        a = np.asarray(a)
        if not pad_l:
            return a
        padv = np.full((pad_l,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, padv])

    lm_np = pad_lm(state.lm_pos)
    lm_fixed_np = pad_lm(lm_fixed, fill=True)
    lm_idx_np = np.asarray(lm_idx)
    valid_np = np.asarray(valid)
    shard_of = lm_idx_np // block
    order = np.argsort(shard_of, kind="stable")
    counts = np.bincount(shard_of[order], minlength=n_dev)
    per = max(int(counts.max()) if counts.size else 1, 1)
    F_new = per * n_dev
    idx_out = np.zeros(F_new, np.int64)
    valid_out = np.zeros(F_new, bool)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for s in range(n_dev):
        sel = order[starts[s]: starts[s] + counts[s]]
        idx_out[s * per: s * per + counts[s]] = sel
        valid_out[s * per: s * per + counts[s]] = valid_np[sel]

    f_pose = jnp.asarray(np.asarray(pose_idx)[idx_out])
    f_lm = jnp.asarray(lm_idx_np[idx_out])
    f_uvr = jnp.asarray(np.asarray(uvr)[idx_out])
    f_is2 = jnp.asarray(np.asarray(inv_s2)[idx_out])
    f_valid = jnp.asarray(valid_out)

    R_wb, p_wb = _body_states(state, R_cb, t_cb)

    _run = _sharded_vi_gba_fn(mesh, axis, block, cfg)

    R_wb2, p_wb2, v2, bg2, ba2, lm2, _, n_inl = _run(
        R_wb, p_wb, state.kf_vel, state.kf_bg, state.kf_ba,
        jnp.asarray(lm_np), jnp.asarray(lm_fixed_np), pose_fixed,
        f_pose, f_lm, f_uvr, f_is2, f_valid, inertial, cam, bf,
        R_cb, t_cb, state.kf_bg, state.kf_ba)

    kf_R, kf_t = _cam_states(R_wb2, p_wb2, R_cb, t_cb)
    upd = state.kf_valid & ~pose_fixed
    new_state = state._replace(
        kf_R=jnp.where(upd[:, None, None], kf_R, state.kf_R),
        kf_t=jnp.where(upd[:, None], kf_t, state.kf_t),
        kf_vel=jnp.where(upd[:, None], v2, state.kf_vel),
        kf_bg=jnp.where(upd[:, None], bg2, state.kf_bg),
        kf_ba=jnp.where(upd[:, None], ba2, state.kf_ba),
        lm_pos=jnp.where(lm_fixed[:, None], state.lm_pos, lm2[:L]),
        epoch=state.epoch + 1,
    )
    # outlier unbinding in the ORIGINAL (K, N) factor order: re-evaluate the
    # reprojection chi2 on the corrected state (the partitioned order is a
    # permutation — same approach as sharded_ba.distributed_global_ba)
    R_wb3, p_wb3 = _body_states(new_state, R_cb, t_cb)
    factors_orig = vi_ba.VIReprojFactors(pose_idx, lm_idx, uvr, inv_s2, valid)
    _, _, _, _, _, chi2 = _reproj_blocks(
        R_wb3, p_wb3, new_state.lm_pos, factors_orig, cam, bf, R_cb, t_cb,
        pose_fixed, lm_fixed, jnp.ones(valid.shape[0], bool), cfg)
    is_stereo_f = uvr[:, 2] >= 0.0
    delta2_f = jnp.where(is_stereo_f, cfg.chi2_stereo, cfg.chi2_mono)
    inlier = chi2 <= delta2_f
    drop = (valid & ~inlier).reshape(K, N)
    new_state = new_state._replace(
        kf_obs=jnp.where(drop, -1, new_state.kf_obs))
    new_state = ms.update_landmark_stats(new_state, n_levels, scale)
    return new_state, jnp.sum((valid & inlier).astype(jnp.int32))
