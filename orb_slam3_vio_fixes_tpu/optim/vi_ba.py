"""Visual-inertial bundle adjustment: 15-DoF keyframe states, Schur landmarks.

TPU-native replacement for the reference's inertial optimizers
(reference: Optimizer::FullInertialBA src/Optimizer.cc:392-812,
LocalInertialBA :2383-2958, PoseInertialOptimizationLastKeyFrame :4499 and
...LastFrame :4883-5298, generic Marginalize :2960-3040; factor definitions
EdgeInertial/EdgeGyroRW/EdgeAccRW/EdgePriorPoseImu in src/G2oTypes.cc and
SURVEY.md A.4).

Re-design (SURVEY.md §7 stage 4/6): each window keyframe/frame carries one
15-DoF state (phi, p, v, bg, ba); all factor groups are fixed-capacity SoA
batches whose residuals AND Jacobians come from vmapped forward-mode autodiff
of the factor functions at zero perturbation — no per-edge virtual dispatch,
no analytic-Jacobian transcription errors. Landmarks are Schur-eliminated
exactly as the visual-only solver does; the reduced (15W x 15W) camera system
is dense and tiny, solved with one Cholesky.

Perturbation convention (matches the reference's ImuCamPose::Update —
right-multiplicative rotation, body-frame translation increment):
  R' = R exp(eps[0:3]^)     p' = p + R eps[3:6]
  v' = v + eps[6:9]         bg' = bg + eps[9:12]     ba' = ba + eps[12:15]
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.optim.inertial_init import information_from_cov
from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

D = 15  # per-state DoF


class VIStates(NamedTuple):
    """Window of body states. W static."""

    R_wb: jax.Array   # (W,3,3)
    p_wb: jax.Array   # (W,3)
    v: jax.Array      # (W,3)
    bg: jax.Array     # (W,3)
    ba: jax.Array     # (W,3)
    fixed: jax.Array  # (W,) bool — anchor states (entire 15 DoF frozen)
    valid: jax.Array  # (W,) bool


class VIReprojFactors(NamedTuple):
    """Monocular/stereo reprojection factors against window states.

    uvr[:, 2] < 0 means mono (right coordinate unused).
    """

    state_idx: jax.Array   # (F,)
    lm_idx: jax.Array      # (F,)
    uvr: jax.Array         # (F,3)
    inv_sigma2: jax.Array  # (F,)
    valid: jax.Array       # (F,)


class VIInertialFactors(NamedTuple):
    """Preintegration factors between window states i -> j (consecutive)."""

    idx_i: jax.Array   # (P,)
    idx_j: jax.Array   # (P,)
    dT: jax.Array
    dR: jax.Array
    dV: jax.Array
    dP: jax.Array
    JRg: jax.Array
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    info: jax.Array       # (P,9,9) whitening information of (er, ev, ep)
    info_rw: jax.Array    # (P,6,6) bias random-walk information
    bg0: jax.Array        # (P,3)
    ba0: jax.Array        # (P,3)
    valid: jax.Array      # (P,)

    @staticmethod
    def from_preintegrations(idx_i, idx_j, pres: pre.Preintegrated, valid):
        return VIInertialFactors(
            idx_i=jnp.asarray(idx_i, jnp.int32),
            idx_j=jnp.asarray(idx_j, jnp.int32),
            dT=pres.dT, dR=pres.dR, dV=pres.dV, dP=pres.dP,
            JRg=pres.JRg, JVg=pres.JVg, JVa=pres.JVa,
            JPg=pres.JPg, JPa=pres.JPa,
            info=information_from_cov(pres.cov),
            info_rw=information_from_cov(pres.cov_walk),
            bg0=pres.bg0, ba0=pres.ba0,
            valid=jnp.asarray(valid, bool),
        )


class VIPrior(NamedTuple):
    """15-DoF marginal prior on ONE window state (reference:
    ConstraintPoseImu include/G2oTypes.h:706 + EdgePriorPoseImu)."""

    state_idx: jax.Array  # scalar
    R_wb: jax.Array       # (3,3) linearization point
    p_wb: jax.Array
    v: jax.Array
    bg: jax.Array
    ba: jax.Array
    H: jax.Array          # (15,15) information
    valid: jax.Array      # scalar bool

    @staticmethod
    def none() -> "VIPrior":
        return VIPrior(
            jnp.int32(0), jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3), jnp.zeros((15, 15)), jnp.asarray(False),
        )


class VIProblem(NamedTuple):
    """NOTE: `lm` must be a COMPACTED array of just the window's landmarks
    (a few thousand), not the full map — the Schur buckets allocate a
    (W, L, 15, 3) buffer. Callers gather/scatter via their own index map."""

    states: VIStates
    lm: jax.Array          # (L,3) world points
    lm_valid: jax.Array    # (L,)
    lm_fixed: jax.Array    # (L,) — True for motion-only use
    reproj: VIReprojFactors
    inertial: VIInertialFactors
    prior: VIPrior
    cam: Camera
    bf: jax.Array
    R_cb: jax.Array        # (3,3) camera-from-body extrinsics
    t_cb: jax.Array        # (3,)


class VIBAConfig(NamedTuple):
    n_rounds: int = 2
    n_iters: int = 5
    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    huber_inertial: float = 16.92   # delta^2 (reference: sqrt(16.92) Huber)
    lambda0: float = 1e-4


# ---------------------------------------------------------------------------
# factor residuals (at perturbation eps; autodiff evaluates at eps = 0)
# ---------------------------------------------------------------------------


def _apply_eps(R, p, v, bg, ba, eps):
    R2 = R @ lie.so3_exp(eps[0:3])
    p2 = p + R @ eps[3:6]
    return R2, p2, v + eps[6:9], bg + eps[9:12], ba + eps[12:15]


def _reproj_residual(eps, dlm, R, p, v, bg, ba, lm, uvr,
                     cam: Camera, bf, R_cb, t_cb):
    """(3,) residual; third component zeroed for mono factors outside."""
    R2, p2, *_ = _apply_eps(R, p, v, bg, ba, eps)
    X = lm + dlm
    Xb = R2.T @ (X - p2)
    Xc = R_cb @ Xb + t_cb
    uv = project(cam, Xc)
    ur = uv[0] - bf / jnp.maximum(Xc[2], 1e-6)
    return jnp.concatenate([uv - uvr[:2], (ur - uvr[2])[None]])


def _inertial_residual(eps_i, eps_j, Ri, pi, vi, bgi, bai, Rj, pj, vj, bgj, baj,
                       dT, dR0, dV0, dP0, JRg, JVg, JVa, JPg, JPa, bg0, ba0):
    """(9,) preintegration residual between states i and j (SURVEY.md A.4)."""
    R1, p1, v1, bg1, ba1 = _apply_eps(Ri, pi, vi, bgi, bai, eps_i)
    R2, p2, v2, _, _ = _apply_eps(Rj, pj, vj, bgj, baj, eps_j)
    g = jnp.array([0.0, 0.0, -pre.GRAVITY], R1.dtype)
    dbg = bg1 - bg0
    dba = ba1 - ba0
    dR = dR0 @ lie.so3_exp(JRg @ dbg)
    dV = dV0 + JVg @ dbg + JVa @ dba
    dP = dP0 + JPg @ dbg + JPa @ dba
    er = lie.so3_log(dR.T @ R1.T @ R2)
    ev = R1.T @ (v2 - v1 - g * dT) - dV
    ep = R1.T @ (p2 - p1 - v1 * dT - 0.5 * g * dT * dT) - dP
    return jnp.concatenate([er, ev, ep])


def _bias_rw_residual(eps_i, eps_j, bgi, bai, bgj, baj):
    """(6,) random-walk residual (reference: EdgeGyroRW/EdgeAccRW)."""
    dbg = (bgj + eps_j[9:12]) - (bgi + eps_i[9:12])
    dba = (baj + eps_j[12:15]) - (bai + eps_i[12:15])
    return jnp.concatenate([dbg, dba])


def _prior_residual(eps, R, p, v, bg, ba, prior: VIPrior):
    """(15,) residual vs. the marginal prior's linearization point."""
    R2, p2, v2, bg2, ba2 = _apply_eps(R, p, v, bg, ba, eps)
    er = lie.so3_log(prior.R_wb.T @ R2)
    ep = R2.T @ (p2 - prior.p_wb)  # body-frame, matching _apply_eps's dp
    ev = v2 - prior.v
    ebg = bg2 - prior.bg
    eba = ba2 - prior.ba
    return jnp.concatenate([er, ep, ev, ebg, eba])


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------


def _huber_w(chi2, delta2):
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def _sqrt_psd(M):
    val, vec = jnp.linalg.eigh(0.5 * (M + jnp.swapaxes(M, -1, -2)))
    return jnp.einsum("...ij,...j,...kj->...ik", vec,
                      jnp.sqrt(jnp.maximum(val, 0.0)), vec)


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve_vi_ba(problem: VIProblem, cfg: VIBAConfig = VIBAConfig()):
    """Run the LM schedule with per-round chi2 outlier gating.

    Returns (problem with updated states/landmarks, reproj_inlier mask,
    H_full (W*15, W*15) Gauss-Newton information of the FINAL linearization —
    used by callers for marginalization).
    """
    st = problem.states
    W = st.R_wb.shape[0]
    F = problem.reproj.state_idx.shape[0]
    P = problem.inertial.idx_i.shape[0]
    L = problem.lm.shape[0]

    is_stereo = problem.reproj.uvr[:, 2] >= 0
    chi2_th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    sqrt_info_in = _sqrt_psd(problem.inertial.info)
    sqrt_info_rw = _sqrt_psd(problem.inertial.info_rw)
    sqrt_info_prior = _sqrt_psd(problem.prior.H)

    si = problem.reproj.state_idx
    li = problem.reproj.lm_idx
    ii = problem.inertial.idx_i
    ij = problem.inertial.idx_j

    def reproj_chi2(states: VIStates, lm, include3):
        r = jax.vmap(
            lambda k: _reproj_residual(
                jnp.zeros(D), jnp.zeros(3),
                states.R_wb[si[k]], states.p_wb[si[k]], states.v[si[k]],
                states.bg[si[k]], states.ba[si[k]],
                lm[li[k]], problem.reproj.uvr[k], problem.cam, problem.bf,
                problem.R_cb, problem.t_cb,
            )
        )(jnp.arange(F))
        r = jnp.where(include3[:, None].repeat(3, 1).at[:, :2].set(True), r, 0.0)
        return jnp.sum(r * r, axis=-1) * problem.reproj.inv_sigma2

    def linearize(states: VIStates, lm, inlier):
        """Return (H (W,15,W,15), b (W,15), Hll (L,3,3), Hpl terms, bl)."""
        zero_eps = jnp.zeros(D)
        zero_lm = jnp.zeros(3)

        # ---- reprojection: J wrt (eps of state, dlm) -------------------
        def rp(k):
            args = (
                states.R_wb[si[k]], states.p_wb[si[k]], states.v[si[k]],
                states.bg[si[k]], states.ba[si[k]],
                lm[li[k]], problem.reproj.uvr[k], problem.cam, problem.bf,
                problem.R_cb, problem.t_cb,
            )
            r = _reproj_residual(zero_eps, zero_lm, *args)
            Js, Jl = jax.jacfwd(_reproj_residual, argnums=(0, 1))(
                zero_eps, zero_lm, *args
            )
            return r, Js, Jl

        r_f, Js_f, Jl_f = jax.vmap(rp)(jnp.arange(F))
        mono = ~is_stereo
        r_f = r_f.at[:, 2].set(jnp.where(mono, 0.0, r_f[:, 2]))
        Js_f = Js_f.at[:, 2, :].set(jnp.where(mono[:, None], 0.0, Js_f[:, 2, :]))
        Jl_f = Jl_f.at[:, 2, :].set(jnp.where(mono[:, None], 0.0, Jl_f[:, 2, :]))
        chi2_f = jnp.sum(r_f * r_f, -1) * problem.reproj.inv_sigma2
        w_f = (
            problem.reproj.inv_sigma2
            * _huber_w(chi2_f, chi2_th)
            * problem.reproj.valid
            * inlier
            * st.valid[si]
            * problem.lm_valid[li]
        )
        sfree = ~st.fixed[si]
        Js_f = Js_f * sfree[:, None, None]
        lfree = ~problem.lm_fixed[li]
        Jl_f = Jl_f * lfree[:, None, None]

        H = jnp.zeros((W, D, W, D))
        b = jnp.zeros((W, D))
        H = H.at[si, :, si, :].add(jnp.einsum("fra,frb,f->fab", Js_f, Js_f, w_f))
        b = b.at[si].add(-jnp.einsum("fra,fr,f->fa", Js_f, r_f, w_f))
        Hll = jnp.zeros((L, 3, 3)).at[li].add(
            jnp.einsum("fra,frb,f->fab", Jl_f, Jl_f, w_f)
        )
        bl = jnp.zeros((L, 3)).at[li].add(-jnp.einsum("fra,fr,f->fa", Jl_f, r_f, w_f))

        # ---- inertial (whitened residuals; Huber on total chi2) --------
        def ine(k):
            args = (
                states.R_wb[ii[k]], states.p_wb[ii[k]], states.v[ii[k]],
                states.bg[ii[k]], states.ba[ii[k]],
                states.R_wb[ij[k]], states.p_wb[ij[k]], states.v[ij[k]],
                states.bg[ij[k]], states.ba[ij[k]],
                problem.inertial.dT[k], problem.inertial.dR[k],
                problem.inertial.dV[k], problem.inertial.dP[k],
                problem.inertial.JRg[k], problem.inertial.JVg[k],
                problem.inertial.JVa[k], problem.inertial.JPg[k],
                problem.inertial.JPa[k], problem.inertial.bg0[k],
                problem.inertial.ba0[k],
            )
            r = _inertial_residual(zero_eps, zero_eps, *args)
            Ji, Jj = jax.jacfwd(_inertial_residual, argnums=(0, 1))(
                zero_eps, zero_eps, *args
            )
            return r, Ji, Jj

        r_p, Ji_p, Jj_p = jax.vmap(ine)(jnp.arange(P))
        r_pw = jnp.einsum("pij,pj->pi", sqrt_info_in, r_p)
        Ji_pw = jnp.einsum("pij,pjd->pid", sqrt_info_in, Ji_p)
        Jj_pw = jnp.einsum("pij,pjd->pid", sqrt_info_in, Jj_p)
        chi2_p = jnp.sum(r_pw * r_pw, -1)
        w_p = (
            _huber_w(chi2_p, jnp.float32(cfg.huber_inertial))
            * problem.inertial.valid
            * st.valid[ii] * st.valid[ij]
        )
        ifree = ~st.fixed[ii]
        jfree = ~st.fixed[ij]
        Ji_pw = Ji_pw * ifree[:, None, None]
        Jj_pw = Jj_pw * jfree[:, None, None]

        H = H.at[ii, :, ii, :].add(jnp.einsum("pra,prb,p->pab", Ji_pw, Ji_pw, w_p))
        H = H.at[ij, :, ij, :].add(jnp.einsum("pra,prb,p->pab", Jj_pw, Jj_pw, w_p))
        Hx = jnp.einsum("pra,prb,p->pab", Ji_pw, Jj_pw, w_p)
        H = H.at[ii, :, ij, :].add(Hx)
        H = H.at[ij, :, ii, :].add(jnp.swapaxes(Hx, 1, 2))
        b = b.at[ii].add(-jnp.einsum("pra,pr,p->pa", Ji_pw, r_pw, w_p))
        b = b.at[ij].add(-jnp.einsum("pra,pr,p->pa", Jj_pw, r_pw, w_p))

        # ---- bias random walk ------------------------------------------
        def brw(k):
            args = (states.bg[ii[k]], states.ba[ii[k]],
                    states.bg[ij[k]], states.ba[ij[k]])
            r = _bias_rw_residual(zero_eps, zero_eps, *args)
            Ji, Jj = jax.jacfwd(_bias_rw_residual, argnums=(0, 1))(
                zero_eps, zero_eps, *args
            )
            return r, Ji, Jj

        r_b, Ji_b, Jj_b = jax.vmap(brw)(jnp.arange(P))
        r_bw = jnp.einsum("pij,pj->pi", sqrt_info_rw, r_b)
        Ji_bw = jnp.einsum("pij,pjd->pid", sqrt_info_rw, Ji_b) * ifree[:, None, None]
        Jj_bw = jnp.einsum("pij,pjd->pid", sqrt_info_rw, Jj_b) * jfree[:, None, None]
        w_b = problem.inertial.valid * st.valid[ii] * st.valid[ij]
        H = H.at[ii, :, ii, :].add(jnp.einsum("pra,prb,p->pab", Ji_bw, Ji_bw, w_b))
        H = H.at[ij, :, ij, :].add(jnp.einsum("pra,prb,p->pab", Jj_bw, Jj_bw, w_b))
        Hy = jnp.einsum("pra,prb,p->pab", Ji_bw, Jj_bw, w_b)
        H = H.at[ii, :, ij, :].add(Hy)
        H = H.at[ij, :, ii, :].add(jnp.swapaxes(Hy, 1, 2))
        b = b.at[ii].add(-jnp.einsum("pra,pr,p->pa", Ji_bw, r_bw, w_b))
        b = b.at[ij].add(-jnp.einsum("pra,pr,p->pa", Jj_bw, r_bw, w_b))

        # ---- marginal prior --------------------------------------------
        pk = problem.prior.state_idx
        r_q = _prior_residual(
            zero_eps, states.R_wb[pk], states.p_wb[pk], states.v[pk],
            states.bg[pk], states.ba[pk], problem.prior,
        )
        Jq = jax.jacfwd(_prior_residual)(
            zero_eps, states.R_wb[pk], states.p_wb[pk], states.v[pk],
            states.bg[pk], states.ba[pk], problem.prior,
        )
        r_qw = sqrt_info_prior @ r_q
        Jq_w = sqrt_info_prior @ Jq
        w_q = problem.prior.valid.astype(r_qw.dtype) * (~st.fixed[pk])
        H = H.at[pk, :, pk, :].add(w_q * Jq_w.T @ Jq_w)
        b = b.at[pk].add(-w_q * Jq_w.T @ r_qw)

        # cross terms pose<->landmark for Schur
        Hpl_f = jnp.einsum("fra,frb,f->fab", Js_f, Jl_f, w_f)  # (F,15,3)
        return H, b, Hll, bl, Hpl_f

    def total_chi2(states: VIStates, lm, inlier):
        """Acceptance metric: robustified reproj + inertial + bias-RW +
        prior chi2 (all factor groups — a reproj-only metric would reject
        every step in prior/inertial-only problems)."""
        c_f = reproj_chi2(states, lm, is_stereo)
        c = jnp.sum(jnp.where(problem.reproj.valid & inlier,
                              jnp.minimum(c_f, chi2_th * 4), 0.0))

        zero_eps = jnp.zeros(D)
        r_p = jax.vmap(
            lambda k: _inertial_residual(
                zero_eps, zero_eps,
                states.R_wb[ii[k]], states.p_wb[ii[k]], states.v[ii[k]],
                states.bg[ii[k]], states.ba[ii[k]],
                states.R_wb[ij[k]], states.p_wb[ij[k]], states.v[ij[k]],
                states.bg[ij[k]], states.ba[ij[k]],
                problem.inertial.dT[k], problem.inertial.dR[k],
                problem.inertial.dV[k], problem.inertial.dP[k],
                problem.inertial.JRg[k], problem.inertial.JVg[k],
                problem.inertial.JVa[k], problem.inertial.JPg[k],
                problem.inertial.JPa[k], problem.inertial.bg0[k],
                problem.inertial.ba0[k],
            )
        )(jnp.arange(P))
        r_pw = jnp.einsum("pij,pj->pi", sqrt_info_in, r_p)
        w_in = problem.inertial.valid & st.valid[ii] & st.valid[ij]
        c += jnp.sum(jnp.where(w_in, jnp.sum(r_pw * r_pw, -1), 0.0))

        r_b = jax.vmap(
            lambda k: _bias_rw_residual(
                zero_eps, zero_eps, states.bg[ii[k]], states.ba[ii[k]],
                states.bg[ij[k]], states.ba[ij[k]],
            )
        )(jnp.arange(P))
        r_bw = jnp.einsum("pij,pj->pi", sqrt_info_rw, r_b)
        c += jnp.sum(jnp.where(w_in, jnp.sum(r_bw * r_bw, -1), 0.0))

        pk = problem.prior.state_idx
        r_q = _prior_residual(
            zero_eps, states.R_wb[pk], states.p_wb[pk], states.v[pk],
            states.bg[pk], states.ba[pk], problem.prior,
        )
        c += problem.prior.valid * (r_q @ problem.prior.H @ r_q)
        return c

    def apply_dx(states: VIStates, dx):
        dx = dx * (~states.fixed)[:, None]
        R2 = jax.vmap(lambda R, e: lie.so3_normalize(R @ lie.so3_exp(e[0:3])))(
            states.R_wb, dx
        )
        p2 = states.p_wb + jnp.einsum("wij,wj->wi", states.R_wb, dx[:, 3:6])
        return states._replace(
            R_wb=R2, p_wb=p2, v=states.v + dx[:, 6:9],
            bg=states.bg + dx[:, 9:12], ba=states.ba + dx[:, 12:15],
        )

    def lm_iteration(carry, _):
        states, lm, inlier, lam = carry
        H, b, Hll, bl, Hpl_f = linearize(states, lm, inlier)

        # Schur complement of landmarks (reference: the BlockSolver's
        # landmark elimination; explicit form in Marginalize :2960)
        eye3 = jnp.eye(3)
        lm_act = problem.lm_valid & ~problem.lm_fixed
        Hll_d = Hll + eye3[None] * 1e-6 + (~lm_act)[:, None, None] * eye3[None]
        Hll_inv = jnp.linalg.inv(Hll_d) * lm_act[:, None, None]

        # H_red -= sum_l Hpl[l] Hll_inv[l] Hpl[l]^T, with Hpl aggregated per
        # (state, landmark) pair via factor list
        Ct = jnp.einsum("fab,fbc->fac", Hpl_f, Hll_inv[li])     # (F,15,3)
        # pairwise reduction over factors sharing (state_i, lm) x (state_j, lm):
        # since each lm couples few states, accumulate via (W, L) buckets
        A = jnp.zeros((W, L, D, 3)).at[si, li].add(Hpl_f)       # W_pl blocks
        B = jnp.einsum("wlab,lbc->wlac", A, Hll_inv)
        H_red = H - jnp.einsum("wlac,vlec->wave", B, A)
        b_red = b - jnp.einsum("wlab,lb->wa", B, bl)

        Hd = H_red.reshape(W * D, W * D)
        hdiag = jnp.diag(Hd)
        free = jnp.repeat(~st.fixed & st.valid, D)
        damp = jnp.where(free, lam * jnp.maximum(hdiag, 1e-3), 1.0)
        dx = jax.scipy.linalg.solve(Hd + jnp.diag(damp), b_red.reshape(-1),
                                    assume_a="pos").reshape(W, D)
        dx = dx * (st.valid & ~st.fixed)[:, None]

        # back-substitute landmarks: dl = Hll_inv (bl - Hlp dx)
        Hlp_dx = jnp.einsum("wlab,wa->lb", A, dx)
        dlm = jnp.einsum("lab,lb->la", Hll_inv, bl - Hlp_dx)
        dlm = dlm * lm_act[:, None]

        states2 = apply_dx(states, dx)
        lm2 = lm + dlm
        c_old = total_chi2(states, lm, inlier)
        c_new = total_chi2(states2, lm2, inlier)
        ok = c_new < c_old
        states3 = jax.tree.map(lambda a, b_: jnp.where(ok, b_, a), states, states2)
        lm3 = jnp.where(ok, lm2, lm)
        lam2 = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-8),
                         jnp.minimum(lam * 10.0, 1e6))
        return (states3, lm3, inlier, lam2), c_old

    def one_round(carry, _):
        states, lm, inlier = carry
        (states, lm, inlier, _), _ = jax.lax.scan(
            lm_iteration, (states, lm, inlier, jnp.float32(cfg.lambda0)),
            None, length=cfg.n_iters,
        )
        chi2_f = reproj_chi2(states, lm, is_stereo)
        inlier = chi2_f <= chi2_th
        return (states, lm, inlier), None

    inlier0 = jnp.ones(F, bool)
    (states, lm, inlier), _ = jax.lax.scan(
        one_round, (st, problem.lm, inlier0), None, length=cfg.n_rounds
    )

    # final-linearization information for marginalization
    H_fin, _, _, _, _ = linearize(states, lm, inlier)
    out = problem._replace(states=states, lm=lm)
    return out, inlier, H_fin.reshape(W * D, W * D)


def marginalize(H: jax.Array, keep: slice, marg: slice) -> jax.Array:
    """Schur-complement marginalization of a block (reference:
    Optimizer::Marginalize src/Optimizer.cc:2960-3040 — SVD pseudo-inverse).

    H is (n, n); `keep` and `marg` are contiguous index ranges.
    Returns the (k, k) marginal information on the kept block.
    """
    Hkk = H[keep, keep]
    Hkm = H[keep, marg]
    Hmm = H[marg, marg]
    # eigen pseudo-inverse (robust to rank deficiency, like the reference)
    val, vec = jnp.linalg.eigh(0.5 * (Hmm + Hmm.T))
    inv = jnp.where(val > 1e-8, 1.0 / jnp.maximum(val, 1e-8), 0.0)
    Hmm_inv = (vec * inv[None, :]) @ vec.T
    return Hkk - Hkm @ Hmm_inv @ Hkm.T
