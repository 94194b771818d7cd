"""Batched Levenberg-Marquardt bundle adjustment with landmark Schur complement.

This is the TPU-native replacement for the reference's entire g2o stack
(reference: Thirdparty/g2o + src/Optimizer.cc's 20 entry points + the custom
vertices/edges in include/G2oTypes.h and include/OptimizableTypes.h).

Design (SURVEY.md §7 stage 4):
  * one generic problem layout: fixed-capacity factor arrays with validity
    masks; every residual type is evaluated for ALL factors in one vmapped
    pass (VPU/MXU friendly), invalid slots contribute zero;
  * analytic Jacobians for reprojection (the closed forms the reference
    hand-codes in src/OptimizableTypes.cpp / src/G2oTypes.cc follow from the
    same chain rule; we derive them directly, and cross-check vs autodiff in
    tests);
  * landmark blocks eliminated by Schur complement (the reference exposes the
    same pattern in Optimizer::Marginalize src/Optimizer.cc:2960-3040 and in
    g2o's BlockSolver_6_3); the reduced camera system is assembled densely —
    local windows are <=10^2 poses so a dense (6P, 6P) solve is tiny and maps
    straight onto the MXU;
  * robust Huber weights and the reference's chi^2 outlier gating between
    rounds (src/Optimizer.cc:999-1104: 4 rounds x 10 iterations, mono
    chi2=5.991 / stereo 7.815);
  * LM damping on the diagonal with multiplicative accept/reject schedule,
    carried through `lax.scan` — fixed iteration count, no data-dependent
    Python control flow.

Pose convention: poses are T_cw (world->camera), matching the reference's
g2o::VertexSE3Expmap estimates; updates are left-multiplicative
T_cw <- exp(xi) T_cw with xi = (rho, phi).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.linalg import (  # noqa: F401 — the
    # small-block closed forms are re-exported: callers historically
    # import them from ba_core
    compact_indices, inv3, inv6, solve6)
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project, project_jac

# chi^2 thresholds at 95% for 2/3 DoF (reference: src/Optimizer.cc:1001-1002)
CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def _full_f32(fn):
    """Trace `fn` under highest matmul precision: TPU matmuls default to
    bfloat16 passes, which is fine for the image front end but loses ~3
    decimal digits in Jacobian/Hessian assembly — enough to stall LM
    convergence. These are tiny (3x3/6x6) contractions; full f32 is free."""

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped


class ReprojFactors(NamedTuple):
    """Reprojection factors, mono and stereo unified.

    pose_idx: (F,) int32 — index into pose arrays
    lm_idx:   (F,) int32 — index into landmark array
    uvr:      (F, 3) float32 — observed (u, v, u_right); u_right < 0 => mono
    inv_sigma2: (F,) float32 — information scale (1/sigma^2 of the octave)
    valid:    (F,) bool
    """

    pose_idx: jax.Array
    lm_idx: jax.Array
    uvr: jax.Array
    inv_sigma2: jax.Array
    valid: jax.Array

    @staticmethod
    def empty(f: int) -> "ReprojFactors":
        return ReprojFactors(
            jnp.zeros(f, jnp.int32),
            jnp.zeros(f, jnp.int32),
            jnp.full((f, 3), -1.0, jnp.float32),
            jnp.ones(f, jnp.float32),
            jnp.zeros(f, bool),
        )


class BAProblem(NamedTuple):
    """Visual BA problem over fixed-capacity arrays.

    R, t: (P, 3, 3), (P, 3) — T_cw per pose
    pose_fixed: (P,) bool — gauge/anchor poses (reference: setFixed)
    lm: (L, 3) world points;  lm_valid: (L,) bool; lm_fixed: (L,) bool
    factors: ReprojFactors
    cam: Camera; bf: scalar stereo baseline*fx (0 for mono-only)
    """

    R: jax.Array
    t: jax.Array
    pose_fixed: jax.Array
    lm: jax.Array
    lm_valid: jax.Array
    lm_fixed: jax.Array
    factors: ReprojFactors
    cam: Camera
    bf: jax.Array


def _huber_weight(chi2: jax.Array, delta2: jax.Array) -> jax.Array:
    """Huber IRLS weight as a function of the squared error chi2 = e^T W e.
    w = 1 inside the basin, delta/sqrt(chi2) outside (g2o's rho'(e))."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


@_full_f32
def reproj_residuals(problem: BAProblem, R=None, t=None, lm=None):
    """Residuals + per-factor chi2 + depth for all reprojection factors.

    Returns (err (F,3), chi2 (F,), depth (F,), is_stereo (F,)).
    Mono factors have err[...,2] = 0.
    """
    R = problem.R if R is None else R
    t = problem.t if t is None else t
    lm = problem.lm if lm is None else lm
    f = problem.factors
    Rp = R[f.pose_idx]
    tp = t[f.pose_idx]
    X = lm[f.lm_idx]
    Xc = jnp.einsum("fij,fj->fi", Rp, X) + tp
    uv = project(problem.cam, Xc)
    depth = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(depth) < 1e-9, 1e-9, depth)
    ur_pred = uv[..., 0] - problem.bf * inv_z
    is_stereo = f.uvr[:, 2] >= 0.0
    e2 = jnp.where(is_stereo, ur_pred - f.uvr[:, 2], 0.0)
    err = jnp.stack([uv[..., 0] - f.uvr[:, 0], uv[..., 1] - f.uvr[:, 1], e2], axis=-1)
    chi2 = jnp.sum(err * err, axis=-1) * f.inv_sigma2
    return err, chi2, depth, is_stereo


@_full_f32
def reproj_jacobians(problem: BAProblem, R=None, t=None, lm=None):
    """Analytic Jacobians for every factor.

    Returns (err (F,3), Jp (F,3,6), Jl (F,3,3), chi2 (F,), depth (F,)).
    Row layout: [du, dv, dur]; mono rows 0:2 only (row 2 zeroed).
    Pose tangent ordering: (rho, phi), left-multiplicative on T_cw.
    """
    R_ = problem.R if R is None else R
    t_ = problem.t if t is None else t
    lm_ = problem.lm if lm is None else lm
    f = problem.factors
    Rp = R_[f.pose_idx]
    tp = t_[f.pose_idx]
    X = lm_[f.lm_idx]
    Xc = jnp.einsum("fij,fj->fi", Rp, X) + tp
    err, chi2, depth, is_stereo = reproj_residuals(problem, R_, t_, lm_)

    Jproj = project_jac(problem.cam, Xc)  # (F, 2, 3) d(uv)/dXc
    inv_z = 1.0 / jnp.where(jnp.abs(depth) < 1e-9, 1e-9, depth)
    inv_z2 = inv_z * inv_z
    # d(ur)/dXc = d(u)/dXc + bf/z^2 * dz/dXc
    dur_dXc = Jproj[:, 0, :] + problem.bf * inv_z2[:, None] * jnp.stack(
        [jnp.zeros_like(inv_z), jnp.zeros_like(inv_z), jnp.ones_like(inv_z)], axis=-1
    )
    Jfull = jnp.concatenate([Jproj, dur_dXc[:, None, :]], axis=1)  # (F, 3, 3) d(u,v,ur)/dXc
    # Mono factors have no third row.
    row_mask = jnp.stack(
        [jnp.ones_like(depth), jnp.ones_like(depth), is_stereo.astype(depth.dtype)], axis=-1
    )
    Jfull = Jfull * row_mask[:, :, None]
    # dXc/dxi = [I | -hat(Xc)]  (left-mult update on T_cw)
    dXc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3)), -lie.hat(Xc)],
        axis=-1,
    )  # (F, 3, 6)
    Jp = jnp.einsum("fij,fjk->fik", Jfull, dXc_dxi)  # (F, 3, 6)
    Jl = jnp.einsum("fij,fjk->fik", Jfull, Rp)  # (F, 3, 3)
    return err, Jp, Jl, chi2, depth


class LMConfig(NamedTuple):
    n_rounds: int = 4          # outlier-gating rounds (reference: 4)
    n_iters: int = 10          # LM iterations per round (reference: 10)
    init_lambda: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    huber_mono: float = CHI2_MONO**0.5
    huber_stereo: float = CHI2_STEREO**0.5
    chi2_mono: float = CHI2_MONO
    chi2_stereo: float = CHI2_STEREO
    min_depth: float = 1e-2
    # motion-only (all landmarks fixed): skip the landmark/Schur algebra
    # entirely — the reference has a dedicated PoseOptimization for the same
    # reason (src/Optimizer.cc:814)
    motion_only: bool = False
    # "dense": materialize the (P, L) Hpl table and solve the reduced camera
    #   system with a dense factorization — right for local windows (P<=16);
    # "cg": matrix-free Schur — S·v evaluated factor-wise (never forming
    #   P x L anything), solved by preconditioned conjugate gradients with a
    #   block-Jacobi (pose-diagonal) preconditioner. This is what makes
    #   GLOBAL BA over a full map (P=256, L=32k, F~400k) fit: memory is
    #   O(F + P + L) instead of O(P*L). The reference runs its GBA through
    #   g2o's sparse Cholesky (src/Optimizer.cc:60-390); on TPU the
    #   matrix-free matvec is the idiomatic equivalent (all gathers/scatters
    #   + small-block einsums, no sparse factorization).
    solver: str = "dense"
    cg_iters: int = 40
    # dense path: cap on observations per landmark inside the window (the
    # per-landmark observer-list layout below). Typical in-window landmarks
    # carry 2-8 observations; factors beyond the cap drop out of the
    # landmark/cross blocks only (their pose information is kept), which
    # slightly over-trusts the landmark position for ultra-covered points —
    # a 2x smaller table measured ~25% off the whole solve.
    dense_max_obs: int = 16
    # dense path reduced-camera solve: "cg" = block-Jacobi-preconditioned
    # CG on the explicit S (a 144x144 LU on TPU costs ~2 ms of pure
    # latency; ~cg_iters tiny matvecs cost ~0.3 ms); "lu" = exact solve
    dense_solve: str = "cg"


def _rho_total(problem, chi2, is_stereo, inlier, cfg: LMConfig):
    """Robustified (Huber rho) total cost from per-factor chi2 — the same
    quantity _total_chi2 computes, but from values the Jacobian pass already
    produced, so the LM loop needs NO second residual evaluation per
    iteration (single-evaluation LM; see bundle_adjust)."""
    delta2 = jnp.where(is_stereo, cfg.huber_stereo**2, cfg.huber_mono**2)
    rho = jnp.where(
        chi2 <= delta2, chi2,
        2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2)
    act = (problem.factors.valid & inlier
           & problem.lm_valid[problem.factors.lm_idx])
    return jnp.sum(jnp.where(act, rho, 0.0))


def _factor_weights(problem, chi2, is_stereo, inlier, cfg: LMConfig):
    delta2 = jnp.where(is_stereo, cfg.huber_stereo**2, cfg.huber_mono**2)
    w_rob = _huber_weight(chi2, delta2)
    w = problem.factors.inv_sigma2 * w_rob
    act = problem.factors.valid & inlier
    act &= problem.lm_valid[problem.factors.lm_idx]
    return jnp.where(act, w, 0.0)


def _assemble_and_solve_motion(problem: BAProblem, inlier, lam, cfg: LMConfig):
    """Motion-only step: landmarks fixed, so the normal equations collapse
    to one damped 6x6 solve per pose — no Hll/Hpl/Schur work."""
    P = problem.R.shape[0]
    err, Jp, Jl, chi2, depth = reproj_jacobians(problem)
    is_stereo = problem.factors.uvr[:, 2] >= 0.0
    rho = _rho_total(problem, chi2, is_stereo, inlier, cfg)
    w = _factor_weights(problem, chi2, is_stereo, inlier, cfg)
    act = w > 0.0
    err = jnp.where(act[:, None], err, 0.0)
    Jp = jnp.where(act[:, None, None], Jp, 0.0)
    Jp = jnp.where(problem.pose_fixed[problem.factors.pose_idx][:, None, None], 0.0, Jp)
    wJp = w[:, None, None] * Jp
    Hpp_f = jnp.einsum("fri,frj->fij", wJp, Jp)
    bp_f = -jnp.einsum("fri,fr->fi", wJp, err)
    pidx = problem.factors.pose_idx
    Hpp = jnp.zeros((P, 6, 6)).at[pidx].add(Hpp_f)
    bp = jnp.zeros((P, 6)).at[pidx].add(bp_f)
    eye6 = jnp.eye(6)
    Hd = Hpp + lam * Hpp * eye6 + 1e-8 * eye6
    free = ~problem.pose_fixed
    Hd = jnp.where(free[:, None, None], Hd, eye6)
    bp = jnp.where(free[:, None], bp, 0.0)
    dx_pose = solve6(Hd, bp)
    return dx_pose, jnp.zeros_like(problem.lm), rho


def _factor_blocks(problem: BAProblem, inlier, cfg: LMConfig):
    """Shared per-factor Hessian blocks for both Schur solvers.

    Returns (Hpl_f (F,6,3), Hpp (P,6,6), Hll (L,3,3), bp (P,6), bl (L,3),
    rho_total).
    Invalid/fixed blocks are hard-zeroed (0*inf=NaN guard — see the dense
    path's comment)."""
    P = problem.R.shape[0]
    L = problem.lm.shape[0]
    err, Jp, Jl, chi2, depth = reproj_jacobians(problem)
    is_stereo = problem.factors.uvr[:, 2] >= 0.0
    rho = _rho_total(problem, chi2, is_stereo, inlier, cfg)
    w = _factor_weights(problem, chi2, is_stereo, inlier, cfg)
    act = w > 0.0
    err = jnp.where(act[:, None], err, 0.0)
    Jp = jnp.where(act[:, None, None], Jp, 0.0)
    Jl = jnp.where(act[:, None, None], Jl, 0.0)
    Jp = jnp.where(problem.pose_fixed[problem.factors.pose_idx][:, None, None], 0.0, Jp)
    Jl = jnp.where(problem.lm_fixed[problem.factors.lm_idx][:, None, None], 0.0, Jl)
    wJp = w[:, None, None] * Jp
    wJl = w[:, None, None] * Jl
    Hpp_f = jnp.einsum("fri,frj->fij", wJp, Jp)
    Hll_f = jnp.einsum("fri,frj->fij", wJl, Jl)
    Hpl_f = jnp.einsum("fri,frj->fij", wJp, Jl)
    bp_f = -jnp.einsum("fri,fr->fi", wJp, err)
    bl_f = -jnp.einsum("fri,fr->fi", wJl, err)
    pidx = problem.factors.pose_idx
    lidx = problem.factors.lm_idx
    Hpp = jnp.zeros((P, 6, 6)).at[pidx].add(Hpp_f)
    Hll = jnp.zeros((L, 3, 3)).at[lidx].add(Hll_f)
    bp = jnp.zeros((P, 6)).at[pidx].add(bp_f)
    bl = jnp.zeros((L, 3)).at[lidx].add(bl_f)
    return Hpl_f, Hpp, Hll, bp, bl, rho


def _damped_blocks(Hpp, Hll, pose_fixed, lam):
    """LM-damp the diagonal blocks; invert the landmark blocks.

    Returns (Hpp_d, Hll_inv, lm_active, free)."""
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    Hpp_d = Hpp + lam * Hpp * eye6 + 1e-10 * eye6
    Hll_d = Hll + lam * Hll * eye3
    lm_active = jnp.abs(Hll_d).sum((-1, -2)) > 1e-12
    Hll_d = jnp.where(lm_active[:, None, None], Hll_d, eye3)
    # relative Tikhonov floor (see the dense path's comment: f32 conditioning)
    mu = 1e-3 * (Hll_d[..., 0, 0] + Hll_d[..., 1, 1] + Hll_d[..., 2, 2]) / 3.0 + 1e-8
    Hll_inv = inv3(Hll_d + mu[:, None, None] * eye3)
    free = ~pose_fixed
    return Hpp_d, Hll_inv, lm_active, free


class SchurStruct(NamedTuple):
    """Static factor structure for the scatter-free dense Schur path.

    Built once per `bundle_adjust` call (the factor graph topology is
    constant across LM iterations/rounds; only residual VALUES change):
      T:    (L, O) int32 — factor index of the o-th observation of landmark l
      m:    (L, O) bool  — slot occupied
      oh_t: (L, O, P) f32 — one-hot pose of that factor (pre-masked)
      oh_p: (F, P) f32    — one-hot pose per factor (for Hpp/bp matmuls)

    TPU rationale: every `.at[].add` scatter costs ~1.3 ms at 12k updates
    (serialized on conflicts); gathers and one-hot matmuls replace them at
    ~0.1 ms each. The (L, O) observer-list layout is the dense-array form of
    g2o's per-landmark edge lists."""

    T: jax.Array
    m: jax.Array
    oh_t: jax.Array
    oh_p: jax.Array


def _build_schur_struct(factors: ReprojFactors, L: int, P: int,
                        max_obs: int) -> SchurStruct:
    F = factors.lm_idx.shape[0]
    lidx = jnp.where(factors.valid, factors.lm_idx, L)
    ordf = jnp.argsort(lidx)                      # one F-sized sort per call
    sl = lidx[ordf]
    start = jnp.searchsorted(sl, jnp.arange(L, dtype=sl.dtype))
    rank = (jnp.arange(F, dtype=jnp.int32)
            - start[jnp.clip(sl, 0, L - 1)].astype(jnp.int32))
    ok = (sl < L) & (rank < max_obs)
    tgt = jnp.where(ok, sl * max_obs + rank, L * max_obs)
    T = jnp.zeros(L * max_obs + 1, jnp.int32).at[tgt].set(
        ordf.astype(jnp.int32))[: L * max_obs].reshape(L, max_obs)
    m = jnp.zeros(L * max_obs + 1, bool).at[tgt].set(ok)[
        : L * max_obs].reshape(L, max_obs)
    oh_t = jax.nn.one_hot(factors.pose_idx[T], P,
                          dtype=jnp.float32) * m[..., None]
    oh_p = jax.nn.one_hot(factors.pose_idx, P, dtype=jnp.float32)
    return SchurStruct(T=T, m=m, oh_t=oh_t, oh_p=oh_p)


def _dense_pcg(S, rhs, free, Hpp_d, iters: int):
    """Block-Jacobi preconditioned CG on the explicit reduced system
    S (P,P,6,6); rhs (P,6). Fixed poses pinned to zero."""
    Minv = inv6(jnp.where(free[:, None, None], Hpp_d, jnp.eye(6)))

    def matvec(v):
        v = jnp.where(free[:, None], v, 0.0)
        Sv = jnp.einsum("pqij,qj->pi", S, v)
        return jnp.where(free[:, None], Sv, 0.0)

    def precond(r):
        return jnp.einsum("pij,pj->pi", Minv, r)

    rhs = jnp.where(free[:, None], rhs, 0.0)
    x = jnp.zeros_like(rhs)
    r = rhs
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        okc = (pAp > 1e-20) & (rz > 1e-20)
        alpha = jnp.where(okc, rz / jnp.where(okc, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(okc, rz_new / jnp.where(rz > 1e-20, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters,
                                   unroll=4)
    return jnp.where(free[:, None], x, 0.0)


def _assemble_and_solve_dense_struct(problem: BAProblem, inlier, lam,
                                     cfg: LMConfig, struct: SchurStruct):
    """Scatter-free dense Schur LM step using the per-landmark observer-list
    structure (see SchurStruct). Identical math to the legacy dense path."""
    P = problem.R.shape[0]
    err, Jp, Jl, chi2, depth = reproj_jacobians(problem)
    is_stereo = problem.factors.uvr[:, 2] >= 0.0
    rho = _rho_total(problem, chi2, is_stereo, inlier, cfg)
    w = _factor_weights(problem, chi2, is_stereo, inlier, cfg)
    act = w > 0.0
    err = jnp.where(act[:, None], err, 0.0)
    Jp = jnp.where(act[:, None, None], Jp, 0.0)
    Jl = jnp.where(act[:, None, None], Jl, 0.0)
    Jp = jnp.where(
        problem.pose_fixed[problem.factors.pose_idx][:, None, None], 0.0, Jp)
    Jl = jnp.where(
        problem.lm_fixed[problem.factors.lm_idx][:, None, None], 0.0, Jl)
    wJp = w[:, None, None] * Jp
    wJl = w[:, None, None] * Jl
    Hpp_f = jnp.einsum("fri,frj->fij", wJp, Jp)
    Hll_f = jnp.einsum("fri,frj->fij", wJl, Jl)
    Hpl_f = jnp.einsum("fri,frj->fij", wJp, Jl)
    bp_f = -jnp.einsum("fri,fr->fi", wJp, err)
    bl_f = -jnp.einsum("fri,fr->fi", wJl, err)

    # pose-space accumulation: one-hot matmuls instead of scatters
    Hpp = jnp.einsum("fp,fij->pij", struct.oh_p, Hpp_f)
    bp = jnp.einsum("fp,fi->pi", struct.oh_p, bp_f)
    # landmark-space accumulation: gathers over the observer lists
    mk = struct.m[..., None, None]
    T0 = struct.T
    Hll = jnp.sum(jnp.where(mk, Hll_f[T0], 0.0), axis=1)         # (L,3,3)
    bl = jnp.sum(jnp.where(struct.m[..., None], bl_f[T0], 0.0), axis=1)
    A = jnp.where(mk, Hpl_f[T0], 0.0)                            # (L,O,6,3)

    Hpp_d, Hll_inv, lm_active, free = _damped_blocks(
        Hpp, Hll, problem.pose_fixed, lam)

    # D[l,p,6,3] = sum_o [pose(T[l,o]) == p] * Hpl_f[T[l,o]]
    D = jnp.einsum("lop,loij->lpij", struct.oh_t, A)
    E = jnp.einsum("lpij,ljk->lpik", D, Hll_inv)
    S_off = jnp.einsum("lpik,lqjk->pqij", E, D)
    S = -S_off
    S = S.at[jnp.arange(P), jnp.arange(P)].add(Hpp_d)
    z0 = jnp.einsum("lij,lj->li", Hll_inv, bl)
    rhs = bp - jnp.einsum("lpij,lj->pi", D, z0)

    if cfg.dense_solve == "cg":
        dx_pose = _dense_pcg(S, rhs, free, Hpp_d, cfg.cg_iters)
    else:
        Sd = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
        freef = free[:, None].repeat(6, 1).reshape(-1)
        Sd = jnp.where(freef[:, None] & freef[None, :], Sd, 0.0)
        Sd = Sd + jnp.diag(jnp.where(freef, 0.0, 1.0))
        rhs_flat = jnp.where(freef, rhs.reshape(-1), 0.0)
        d = jnp.sqrt(jnp.clip(jnp.diag(Sd), 1e-12, None))
        Sd_n = Sd / d[:, None] / d[None, :]
        dx = jnp.linalg.solve(Sd_n + 1e-8 * jnp.eye(P * 6), rhs_flat / d) / d
        dx_pose = dx.reshape(P, 6)

    # back-substitute landmarks: dl = Hll^-1 (bl - D^T dx)
    y = jnp.einsum("lpij,pi->lj", D, dx_pose)
    dlm = jnp.einsum("lij,lj->li", Hll_inv, bl - y)
    dlm = jnp.where((problem.lm_fixed | ~lm_active)[:, None], 0.0, dlm)
    return dx_pose, dlm, rho


def schur_cg_solve(
    Hpl_f, Hpp_d, Hll_inv, bp, bl, pidx, lidx, free,
    cg_iters: int, psum_axis: str | None = None,
):
    """Solve the Schur-reduced camera system S dx = rhs by preconditioned CG
    without ever materializing S or the (P, L) cross table.

    S v  = Hpp_d v - Hpl Hll^-1 Hpl^T v, evaluated factor-wise:
      u_f = Hpl_f^T v[pose(f)]         (gather + (F,3) einsum)
      y_l = scatter-add_f u_f          (landmark-space accumulation)
      z_l = Hll_inv y_l
      q_f = Hpl_f z[lm(f)]
      w_p = scatter-add_f q_f          [psum over `psum_axis` when factors
                                        are sharded across a device mesh]
    Preconditioner: block-Jacobi M = Hpp_d (P damped 6x6 inverses).

    Returns dx_pose (P, 6). Fixed poses stay at zero.
    """
    Pn = Hpp_d.shape[0]
    L = Hll_inv.shape[0]

    def psum(x):
        return jax.lax.psum(x, psum_axis) if psum_axis is not None else x

    def hpl_hinv_hplT(v):
        u = jnp.einsum("fij,fi->fj", Hpl_f, v[pidx])     # (F, 3)
        y = jnp.zeros((L, 3)).at[lidx].add(u)
        z = jnp.einsum("lij,lj->li", Hll_inv, y)
        q = jnp.einsum("fij,fj->fi", Hpl_f, z[lidx])     # (F, 6)
        return psum(jnp.zeros((Pn, 6)).at[pidx].add(q))

    def matvec(v):
        v = jnp.where(free[:, None], v, 0.0)
        Sv = jnp.einsum("pij,pj->pi", Hpp_d, v) - hpl_hinv_hplT(v)
        return jnp.where(free[:, None], Sv, 0.0)

    # rhs = bp - Hpl Hll^-1 bl
    z0 = jnp.einsum("lij,lj->li", Hll_inv, bl)
    q0 = jnp.einsum("fij,fj->fi", Hpl_f, z0[lidx])
    rhs = bp - psum(jnp.zeros((Pn, 6)).at[pidx].add(q0))
    rhs = jnp.where(free[:, None], rhs, 0.0)

    # block-Jacobi preconditioner; empty/fixed pose blocks -> identity
    diag_ok = (jnp.abs(Hpp_d).sum((-1, -2)) > 1e-9) & free
    M = jnp.where(diag_ok[:, None, None], Hpp_d, jnp.eye(6))
    Minv = inv6(M)

    def precond(r):
        return jnp.einsum("pij,pj->pi", Minv, r)

    x = jnp.zeros_like(rhs)
    r = rhs
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        # freeze the iteration once converged (alpha=0) instead of dividing
        # by ~0 — fixed trip count keeps this a single compiled scan
        ok = (pAp > 1e-20) & (rz > 1e-20)
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(ok, rz_new / jnp.where(rz > 1e-20, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None,
                                   length=cg_iters, unroll=4)
    return jnp.where(free[:, None], x, 0.0)


def backsub_landmarks(Hpl_f, Hll_inv, bl, dx_pose, pidx, lidx, lm_dead):
    """dl = Hll^-1 (bl - Hpl^T dx) — factor-wise scatter, no (P, L) table."""
    L = Hll_inv.shape[0]
    u = jnp.einsum("fij,fi->fj", Hpl_f, dx_pose[pidx])
    y = jnp.zeros((L, 3)).at[lidx].add(u)
    dlm = jnp.einsum("lij,lj->li", Hll_inv, bl - y)
    return jnp.where(lm_dead[:, None], 0.0, dlm)


def _assemble_and_solve_cg(problem: BAProblem, inlier, lam, cfg: LMConfig):
    """Matrix-free LM step (solver="cg") — scales to full-map GBA."""
    Hpl_f, Hpp, Hll, bp, bl, rho = _factor_blocks(problem, inlier, cfg)
    Hpp_d, Hll_inv, lm_active, free = _damped_blocks(
        Hpp, Hll, problem.pose_fixed, lam)
    pidx = problem.factors.pose_idx
    lidx = problem.factors.lm_idx
    dx_pose = schur_cg_solve(
        Hpl_f, Hpp_d, Hll_inv, bp, bl, pidx, lidx, free, cfg.cg_iters)
    dlm = backsub_landmarks(
        Hpl_f, Hll_inv, bl, dx_pose, pidx, lidx,
        problem.lm_fixed | ~lm_active)
    return dx_pose, dlm, rho


def _assemble_and_solve(problem: BAProblem, inlier, lam, cfg: LMConfig,
                        struct: "SchurStruct | None" = None):
    """One Gauss-Newton/LM step: build the Schur-reduced camera system and
    solve for pose + landmark updates."""
    if cfg.motion_only:
        return _assemble_and_solve_motion(problem, inlier, lam, cfg)
    if cfg.solver == "cg":
        return _assemble_and_solve_cg(problem, inlier, lam, cfg)
    if struct is not None:
        return _assemble_and_solve_dense_struct(problem, inlier, lam, cfg,
                                                struct)
    P = problem.R.shape[0]
    L = problem.lm.shape[0]
    err, Jp, Jl, chi2, depth = reproj_jacobians(problem)
    is_stereo = problem.factors.uvr[:, 2] >= 0.0
    rho = _rho_total(problem, chi2, is_stereo, inlier, cfg)
    w = _factor_weights(problem, chi2, is_stereo, inlier, cfg)
    # HARD-mask inactive factors before forming any product: invalid slots can
    # carry near-singular depths whose Jacobians overflow f32 in J^T J, and
    # 0 * inf = NaN would poison the whole Hessian.
    act = w > 0.0
    err = jnp.where(act[:, None], err, 0.0)
    Jp = jnp.where(act[:, None, None], Jp, 0.0)
    Jl = jnp.where(act[:, None, None], Jl, 0.0)
    # zero jacobians of fixed blocks
    Jp = jnp.where(problem.pose_fixed[problem.factors.pose_idx][:, None, None], 0.0, Jp)
    Jl = jnp.where(problem.lm_fixed[problem.factors.lm_idx][:, None, None], 0.0, Jl)

    wJp = w[:, None, None] * Jp
    wJl = w[:, None, None] * Jl
    # Per-factor blocks
    Hpp_f = jnp.einsum("fri,frj->fij", wJp, Jp)        # (F, 6, 6)
    Hll_f = jnp.einsum("fri,frj->fij", wJl, Jl)        # (F, 3, 3)
    Hpl_f = jnp.einsum("fri,frj->fij", wJp, Jl)        # (F, 6, 3)
    bp_f = -jnp.einsum("fri,fr->fi", wJp, err)          # (F, 6)
    bl_f = -jnp.einsum("fri,fr->fi", wJl, err)          # (F, 3)

    pidx = problem.factors.pose_idx
    lidx = problem.factors.lm_idx
    Hpp = jnp.zeros((P, 6, 6)).at[pidx].add(Hpp_f)
    Hll = jnp.zeros((L, 3, 3)).at[lidx].add(Hll_f)
    bp = jnp.zeros((P, 6)).at[pidx].add(bp_f)
    bl = jnp.zeros((L, 3)).at[lidx].add(bl_f)
    # Cross blocks into dense (P*L) table
    key = pidx * L + lidx
    Hpl = jnp.zeros((P * L, 6, 3)).at[key].add(Hpl_f).reshape(P, L, 6, 3)

    # Damping (LM): scale diagonals
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    Hpp_d = Hpp + lam * jnp.einsum("pij,ij->pij", Hpp, eye6) + 1e-10 * eye6
    Hll_d = Hll + lam * jnp.einsum("lij,ij->lij", Hll, eye3)
    # Fixed/unobserved landmark blocks -> identity (their W columns are zero)
    lm_active = (jnp.abs(Hll_d).sum((-1, -2)) > 1e-12)
    Hll_d = jnp.where(lm_active[:, None, None], Hll_d, eye3)
    # Relative Tikhonov floor: far landmarks seen by few views have a
    # near-singular depth direction; in f32 the raw inverse sprays garbage
    # into the Schur complement (the reference gets away with it because g2o
    # runs in double). mu ~ 1e-3 * mean diagonal bounds the condition number
    # at ~10^3 while biasing updates negligibly.
    mu = 1e-3 * (Hll_d[..., 0, 0] + Hll_d[..., 1, 1] + Hll_d[..., 2, 2]) / 3.0 + 1e-8
    Hll_inv = inv3(Hll_d + mu[:, None, None] * eye3)

    # Schur: S = Hpp - sum_l Hpl Hll^-1 Hlp ; rhs = bp - sum_l Hpl Hll^-1 bl
    HplHinv = jnp.einsum("plij,ljk->plik", Hpl, Hll_inv)  # (P, L, 6, 3)
    S_off = jnp.einsum("plik,qljk->pqij", HplHinv, Hpl)   # (P, Q, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(P), jnp.arange(P)].add(Hpp_d)
    rhs = bp - jnp.einsum("plik,lk->pi", HplHinv, bl)

    # Fixed poses: identity rows/cols
    Sd = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    free = (~problem.pose_fixed)[:, None].repeat(6, 1).reshape(-1)
    Sd = jnp.where(free[:, None] & free[None, :], Sd, 0.0)
    Sd = Sd + jnp.diag(jnp.where(free, 0.0, 1.0))
    rhs_flat = jnp.where(free, rhs.reshape(-1), 0.0)
    # Jacobi equilibration for f32 conditioning
    d = jnp.sqrt(jnp.clip(jnp.diag(Sd), 1e-12, None))
    Sd_n = Sd / d[:, None] / d[None, :]
    dx = jnp.linalg.solve(Sd_n + 1e-8 * jnp.eye(P * 6), rhs_flat / d) / d
    dx_pose = dx.reshape(P, 6)

    # Back-substitute landmarks: dl = Hll^-1 (bl - Hlp^T dx)
    Hlp_dx = jnp.einsum("plij,pi->lj", Hpl, dx_pose)
    dlm = jnp.einsum("lij,lj->li", Hll_inv, bl - Hlp_dx)
    dlm = jnp.where((problem.lm_fixed | ~lm_active)[:, None], 0.0, dlm)
    return dx_pose, dlm, rho


def _apply_step(problem: BAProblem, dx_pose, dlm):
    dR, dt = lie.se3_exp(dx_pose)
    # Re-orthonormalize after the product: each f32 compose drifts R off SO(3)
    # by ~1e-7, and the tracker's velocity model (dR = R_cur R_prev^T, applied
    # forward every frame) AMPLIFIES any deviation geometrically — observed
    # x2.4/frame growth that destroyed tracking after ~15 frames. The
    # reference never hits this because Sophus stores unit quaternions.
    R_new = lie.so3_normalize(dR @ problem.R)
    t_new = jnp.einsum("pij,pj->pi", dR, problem.t) + dt
    lm_new = problem.lm + dlm
    return problem._replace(R=R_new, t=t_new, lm=lm_new)


def _total_chi2(problem: BAProblem, inlier, cfg: LMConfig):
    err, chi2, depth, is_stereo = reproj_residuals(problem)
    delta2 = jnp.where(is_stereo, cfg.huber_stereo**2, cfg.huber_mono**2)
    # robustified cost (Huber rho), matching g2o's activeRobustChi2
    rho = jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0)) - delta2
    )
    act = problem.factors.valid & inlier & problem.lm_valid[problem.factors.lm_idx]
    return jnp.sum(jnp.where(act, rho, 0.0))


@functools.partial(jax.jit, static_argnames=("cfg",))
@_full_f32
def bundle_adjust(problem: BAProblem, cfg: LMConfig = LMConfig()):
    """Run LM with chi^2 outlier gating rounds.

    Returns (problem', inlier_mask (F,), chi2_final (F,)).
    Semantics follow PoseOptimization/LocalBundleAdjustment: after each round,
    factors with chi2 above the threshold (or non-positive depth) are
    deactivated for subsequent rounds (reference: src/Optimizer.cc:999-1104).
    """
    F = problem.factors.valid.shape[0]
    inlier = jnp.ones(F, bool)
    # factor-graph topology is constant across rounds/iterations — build the
    # scatter-free dense structure once (see SchurStruct)
    struct = None
    if cfg.solver == "dense" and not cfg.motion_only:
        struct = _build_schur_struct(
            problem.factors, problem.lm.shape[0], problem.R.shape[0],
            min(cfg.dense_max_obs, problem.R.shape[0] + 8))

    def one_round(carry, _):
        problem, inlier = carry

        # Single-evaluation LM: the Jacobian pass at the current iterate
        # yields its cost for free (_rho_total), so each iteration costs ONE
        # residual/Jacobian sweep instead of two (solve + separate accept
        # evaluation). Accept/reject happens one iteration LATE: if the cost
        # at the current iterate regressed vs the best seen, the iterate is
        # discarded, the state restarts from the best with raised damping
        # (classic LM rejection, deferred), and the final answer is the
        # best-cost state ever visited — monotone non-increasing like the
        # two-pass loop, ~40% cheaper per iteration.
        def lm_iter(state, _):
            best, chi_best, cur, lam = state
            dxp, dlm, chi_cur = _assemble_and_solve(
                problem._replace(R=cur[0], t=cur[1], lm=cur[2]),
                inlier, lam, cfg, struct)
            better = chi_cur < chi_best
            best = tuple(
                jnp.where(better, c, b) for c, b in zip(cur, best))
            chi_best = jnp.minimum(chi_cur, chi_best)
            lam = jnp.where(better, lam * cfg.lambda_down,
                            lam * cfg.lambda_up)
            stepped = _apply_step(
                problem._replace(R=cur[0], t=cur[1], lm=cur[2]), dxp, dlm)
            cand = (stepped.R, stepped.t, stepped.lm)
            # regressed iterate: restart from the best instead of stepping on
            cur = tuple(
                jnp.where(better, c, b) for c, b in zip(cand, best))
            return (best, chi_best, cur, lam), chi_cur

        x0 = (problem.R, problem.t, problem.lm)
        init = (x0, jnp.float32(jnp.inf), x0,
                jnp.float32(cfg.init_lambda))
        (best, chi_best, cur, _), _ = jax.lax.scan(
            lm_iter, init, None, length=cfg.n_iters, unroll=True)
        # the last iterate's cost was never evaluated — compare explicitly
        chi_fin = _total_chi2(
            problem._replace(R=cur[0], t=cur[1], lm=cur[2]), inlier, cfg)
        take_cur = chi_fin < chi_best
        problem = problem._replace(
            R=jnp.where(take_cur, cur[0], best[0]),
            t=jnp.where(take_cur, cur[1], best[1]),
            lm=jnp.where(take_cur, cur[2], best[2]),
        )
        # gate outliers for the next round
        _, chi2, depth, is_stereo = reproj_residuals(problem)
        th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
        inlier = (chi2 <= th) & (depth > cfg.min_depth)
        return (problem, inlier), None

    (problem, inlier), _ = jax.lax.scan(
        one_round, (problem, inlier), None, length=cfg.n_rounds,
        unroll=True)
    _, chi2, _, _ = reproj_residuals(problem)
    return problem, inlier, chi2


class PoseOptResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inlier: jax.Array
    n_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("cfg",))
@_full_f32
def pose_optimize(
    R, t, points_w, uvr, inv_sigma2, valid, cam: Camera, bf, cfg: LMConfig = LMConfig()
) -> PoseOptResult:
    """Motion-only pose optimization: one pose, landmarks fixed.

    The reference's Optimizer::PoseOptimization (src/Optimizer.cc:814-1114):
    4 rounds x 10 iterations with chi^2 gating; landmarks constant. Here it
    is just `bundle_adjust` specialized to P=1 with all landmarks fixed —
    one solver, many graphs (the whole point of the re-design).

    points_w: (N, 3); uvr: (N, 3) with ur<0 for mono rows; valid: (N,) bool.
    """
    n = points_w.shape[0]
    factors = ReprojFactors(
        pose_idx=jnp.zeros(n, jnp.int32),
        lm_idx=jnp.arange(n, dtype=jnp.int32),
        uvr=uvr,
        inv_sigma2=inv_sigma2,
        valid=valid,
    )
    problem = BAProblem(
        R=R[None], t=t[None],
        pose_fixed=jnp.zeros(1, bool),
        lm=points_w,
        lm_valid=jnp.ones(n, bool),
        lm_fixed=jnp.ones(n, bool),
        factors=factors,
        cam=cam, bf=bf,
    )
    out, inlier, chi2 = bundle_adjust(
        problem, cfg._replace(motion_only=True))
    return PoseOptResult(
        out.R[0], out.t[0], inlier & valid, jnp.sum((inlier & valid).astype(jnp.int32))
    )
