"""Distributed bundle adjustment: landmark-sharded Schur reduction on a mesh.

The reference has no distributed backend at all (SURVEY.md §2.3 — its
parallelism is 4 pthreads + mutexes on one shared map). This module is the
designed-fresh TPU scaling path (BASELINE.md north star): shard the landmark
blocks (and their reprojection factors) across a device mesh, form each
device's partial Schur complement of the reduced camera system, `psum` the
(6P, 6P) reduced system over ICI, solve it replicated, and back-substitute
landmark updates locally on the owning shard.

Why landmarks: the reduced camera system is tiny (P keyframes), while
landmark blocks and factors dominate memory/compute. Communication per LM
iteration is exactly one psum of (6P)^2 + 6P floats — independent of L and F.
This is the SLAM analogue of data-parallel gradient psum.

Factor partitioning: `partition_problem` reorders factors so factor f lives
on the shard owning landmark lm_idx[f] (contiguous landmark blocks), padding
each shard to the max shard size. Pose arrays are replicated.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.utils import lie


def partition_problem(problem: ba_core.BAProblem, n_shards: int) -> ba_core.BAProblem:
    """Host-side prep: pad L to a multiple of shards and group factors by the
    shard that owns their landmark. Returns a new problem whose factor arrays
    are laid out as [shard0 | shard1 | ...] with equal shard sizes."""
    L = int(problem.lm.shape[0])
    Lp = ((L + n_shards - 1) // n_shards) * n_shards
    block = Lp // n_shards
    pad_l = Lp - L
    lm = np.asarray(problem.lm)
    lm_valid = np.asarray(problem.lm_valid)
    lm_fixed = np.asarray(problem.lm_fixed)
    if pad_l:
        lm = np.concatenate([lm, np.zeros((pad_l, 3), lm.dtype)])
        lm_valid = np.concatenate([lm_valid, np.zeros(pad_l, bool)])
        lm_fixed = np.concatenate([lm_fixed, np.ones(pad_l, bool)])

    f = problem.factors
    lm_idx = np.asarray(f.lm_idx)
    valid = np.asarray(f.valid)
    shard_of = lm_idx // block
    order = np.argsort(shard_of, kind="stable")
    counts = np.bincount(shard_of[order], minlength=n_shards)
    per = int(counts.max()) if counts.size else 1
    per = max(per, 1)
    F_new = per * n_shards
    idx_out = np.zeros(F_new, np.int64)
    valid_out = np.zeros(F_new, bool)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for s in range(n_shards):
        sel = order[starts[s] : starts[s] + counts[s]]
        idx_out[s * per : s * per + counts[s]] = sel
        valid_out[s * per : s * per + counts[s]] = valid[sel]

    def take(a):
        return jnp.asarray(np.asarray(a)[idx_out])

    factors = ba_core.ReprojFactors(
        pose_idx=take(f.pose_idx),
        lm_idx=take(f.lm_idx),
        uvr=take(f.uvr),
        inv_sigma2=take(f.inv_sigma2),
        valid=jnp.asarray(valid_out),
    )
    return problem._replace(
        lm=jnp.asarray(lm), lm_valid=jnp.asarray(lm_valid),
        lm_fixed=jnp.asarray(lm_fixed), factors=factors,
    )


def _shard_step_cg(problem: ba_core.BAProblem, inlier, lam, cfg, axis: str):
    """Matrix-free distributed Schur step (cfg.solver == "cg"): no (P, L)
    table on any shard, so this scales to full-map GBA sizes. Communication:
    one psum of (P,6,6)+(P,6) for the camera-block assembly, then one (P,6)
    psum per CG iteration (the factor-side scatter partials) — bytes per
    iteration independent of L and F, and ~50x smaller than the dense path's
    (6P)^2 psum at P=256."""
    Hpl_f, Hpp, Hll, bp, bl, _rho = ba_core._factor_blocks(
        problem, inlier, cfg)
    Hpp = jax.lax.psum(Hpp, axis)
    bp = jax.lax.psum(bp, axis)
    Hpp_d, Hll_inv, lm_active, free = ba_core._damped_blocks(
        Hpp, Hll, problem.pose_fixed, lam)
    pidx = problem.factors.pose_idx
    lidx = problem.factors.lm_idx
    dx_pose = ba_core.schur_cg_solve(
        Hpl_f, Hpp_d, Hll_inv, bp, bl, pidx, lidx, free,
        cfg.cg_iters, psum_axis=axis)
    dlm = ba_core.backsub_landmarks(
        Hpl_f, Hll_inv, bl, dx_pose, pidx, lidx,
        problem.lm_fixed | ~lm_active)
    return dx_pose, dlm


def _shard_step(problem: ba_core.BAProblem, inlier, lam, cfg, axis: str):
    """Inside shard_map: factor/landmark arrays are the LOCAL shard; pose
    arrays replicated. Returns (dx_pose replicated, dlm local shard)."""
    if cfg.solver == "cg":
        return _shard_step_cg(problem, inlier, lam, cfg, axis)
    P_ = problem.R.shape[0]
    L_loc = problem.lm.shape[0]
    err, Jp, Jl, chi2, depth = ba_core.reproj_jacobians(problem)
    is_stereo = problem.factors.uvr[:, 2] >= 0.0
    w = ba_core._factor_weights(problem, chi2, is_stereo, inlier, cfg)
    # hard-mask inactive factors (see ba_core._assemble_and_solve: 0*inf=NaN)
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
    lidx = problem.factors.lm_idx  # local indices (caller rebases)
    Hpp = jnp.zeros((P_, 6, 6)).at[pidx].add(Hpp_f)
    Hll = jnp.zeros((L_loc, 3, 3)).at[lidx].add(Hll_f)
    bp = jnp.zeros((P_, 6)).at[pidx].add(bp_f)
    bl = jnp.zeros((L_loc, 3)).at[lidx].add(bl_f)
    key = pidx * L_loc + lidx
    Hpl = jnp.zeros((P_ * L_loc, 6, 3)).at[key].add(Hpl_f).reshape(P_, L_loc, 6, 3)

    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    Hll_d = Hll + lam * Hll * eye3
    lm_active = jnp.abs(Hll_d).sum((-1, -2)) > 1e-12
    Hll_d = jnp.where(lm_active[:, None, None], Hll_d, eye3)
    # relative Tikhonov floor for f32 conditioning (see ba_core)
    mu = 1e-3 * (Hll_d[..., 0, 0] + Hll_d[..., 1, 1] + Hll_d[..., 2, 2]) / 3.0 + 1e-8
    Hll_inv = jnp.linalg.inv(Hll_d + mu[:, None, None] * eye3)
    HplHinv = jnp.einsum("plij,ljk->plik", Hpl, Hll_inv)
    S_part = -jnp.einsum("plik,qljk->pqij", HplHinv, Hpl)
    Hpp_d = Hpp + lam * Hpp * eye6
    S_part = S_part.at[jnp.arange(P_), jnp.arange(P_)].add(Hpp_d)
    rhs_part = bp - jnp.einsum("plik,lk->pi", HplHinv, bl)

    # THE collective: reduce the camera system over ICI
    S = jax.lax.psum(S_part, axis)
    rhs = jax.lax.psum(rhs_part, axis)

    Sd = S.transpose(0, 2, 1, 3).reshape(P_ * 6, P_ * 6)
    free = (~problem.pose_fixed)[:, None].repeat(6, 1).reshape(-1)
    Sd = jnp.where(free[:, None] & free[None, :], Sd, 0.0)
    Sd = Sd + jnp.diag(jnp.where(free, 0.0, 1.0))
    rhs_flat = jnp.where(free, rhs.reshape(-1), 0.0)
    d = jnp.sqrt(jnp.clip(jnp.diag(Sd), 1e-12, None))
    dx = jnp.linalg.solve(Sd / d[:, None] / d[None, :] + 1e-8 * jnp.eye(P_ * 6), rhs_flat / d) / d
    dx_pose = dx.reshape(P_, 6)

    Hlp_dx = jnp.einsum("plij,pi->lj", Hpl, dx_pose)
    dlm = jnp.einsum("lij,lj->li", Hll_inv, bl - Hlp_dx)
    dlm = jnp.where((problem.lm_fixed | ~lm_active)[:, None], 0.0, dlm)
    return dx_pose, dlm


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def distributed_bundle_adjust(
    problem: ba_core.BAProblem,
    mesh: Mesh,
    cfg: ba_core.LMConfig = ba_core.LMConfig(n_rounds=2, n_iters=5),
    axis: str = "lm",
):
    """LM loop with the WHOLE solve inside one shard_map program.

    `problem` must come from `partition_problem(problem, mesh.shape[axis])`.
    Returns (problem', inlier, chi2) like ba_core.bundle_adjust (inlier/chi2
    in the partitioned factor order).

    Round-3 shape (shard_map per STEP, LM loop outside) left every
    between-step op — chi2 evaluation, step application, the scan carries,
    all O(F + L) — to GSPMD's guesswork, and the replicated portion
    dominated (measured 1.10x speedup at 8 shards). Here every landmark/
    factor-sized op provably stays shard-local for the entire solve; the
    only cross-device traffic is pose-sized psums: (P,6,6)+(P,6) blocks per
    LM iteration, one (P,6) partial per CG iteration, and one scalar chi2
    per acceptance test — bytes independent of L and F."""
    n_dev = mesh.shape[axis]
    L = problem.lm.shape[0]
    block = L // n_dev
    f = problem.factors
    from jax import shard_map

    def body(R, t, pose_fixed, lm, lm_valid, lm_fixed, f_pose, f_lm, f_uvr,
             f_is2, f_valid, cam, bf):
        shard = jax.lax.axis_index(axis)
        local0 = ba_core.BAProblem(
            R=R, t=t, pose_fixed=pose_fixed,
            lm=lm, lm_valid=lm_valid, lm_fixed=lm_fixed,
            factors=ba_core.ReprojFactors(
                f_pose, f_lm - shard * block, f_uvr, f_is2, f_valid),
            cam=cam, bf=bf,
        )
        F_loc = f_pose.shape[0]

        def tot_chi2(prob, inl):
            return jax.lax.psum(ba_core._total_chi2(prob, inl, cfg), axis)

        def one_round(carry, _):
            prob, inlier = carry

            def lm_iter(st, _):
                prob, lam, best = st
                dxp, dlm = _shard_step(prob, inlier, lam, cfg, axis)
                cand = ba_core._apply_step(prob, dxp, dlm)
                new_chi2 = tot_chi2(cand, inlier)
                accept = new_chi2 < best
                prob = prob._replace(
                    R=jnp.where(accept, cand.R, prob.R),
                    t=jnp.where(accept, cand.t, prob.t),
                    lm=jnp.where(accept, cand.lm, prob.lm),
                )
                lam = jnp.where(accept, lam * cfg.lambda_down,
                                lam * cfg.lambda_up)
                best = jnp.where(accept, new_chi2, best)
                return (prob, lam, best), None

            chi0 = tot_chi2(prob, inlier)
            (prob, _, _), _ = jax.lax.scan(
                lm_iter, (prob, jnp.float32(cfg.init_lambda), chi0), None,
                length=cfg.n_iters,
            )
            _, chi2, depth, is_stereo = ba_core.reproj_residuals(prob)
            th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
            inlier = (chi2 <= th) & (depth > cfg.min_depth)
            return (prob, inlier), None

        (probf, inlier), _ = jax.lax.scan(
            one_round, (local0, jnp.ones(F_loc, bool)), None,
            length=cfg.n_rounds)
        _, chi2, _, _ = ba_core.reproj_residuals(probf)
        return probf.R, probf.t, probf.lm, inlier, chi2

    R, t, lm, inlier, chi2 = shard_map(
        body, mesh=mesh,
        in_specs=(
            P(), P(), P(),              # R, t, pose_fixed (replicated)
            P(axis), P(axis), P(axis),  # lm blocks
            P(axis), P(axis), P(axis), P(axis), P(axis),  # factors
            P(), P(),                   # cam, bf (replicated)
        ),
        out_specs=(P(), P(), P(axis), P(axis), P(axis)),
        check_vma=False,
    )(
        problem.R, problem.t, problem.pose_fixed,
        problem.lm, problem.lm_valid, problem.lm_fixed,
        f.pose_idx, f.lm_idx, f.uvr, f.inv_sigma2, f.valid,
        problem.cam, problem.bf,
    )
    return problem._replace(R=R, t=t, lm=lm), inlier, chi2


def distributed_global_ba(
    state,
    inv_sigma2_oct,
    cam,
    bf,
    mesh: Mesh,
    fixed_kf: int = 0,
    cfg: ba_core.LMConfig = ba_core.LMConfig(
        n_rounds=2, n_iters=8, solver="cg", cg_iters=40),
    axis: str = "lm",
    n_levels: int = 8,
    scale: float = 1.2,
):
    """Global bundle adjustment of a whole MapState across a device mesh.

    The multi-chip twin of optim/global_ba.run_global_ba: same factor
    extraction, same LM schedule, but landmark blocks + their factors live on
    shards and the reduced camera system is assembled with psum over ICI
    (matrix-free CG when cfg.solver == "cg"). This is the entry point the
    pipeline's loop-closing GBA calls when a mesh is available.

    Returns (state', n_inlier_factors).
    """
    import jax.numpy as jnp

    from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms

    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    window = jnp.arange(K, dtype=jnp.int32)
    pose_idx, lm_idx, uvr, inv_s2, valid = ms.ba_factors_from_map(
        state, window, inv_sigma2_oct)
    # exclude factors of <2-view landmarks (see optim/global_ba.run_global_ba)
    n_obs = ms.landmark_obs_count(state)
    valid = valid & (n_obs[lm_idx] >= 2)
    factors = ba_core.ReprojFactors(pose_idx, lm_idx, uvr, inv_s2, valid)
    pose_fixed = (~state.kf_valid).at[fixed_kf].set(True)
    problem = ba_core.BAProblem(
        R=state.kf_R, t=state.kf_t, pose_fixed=pose_fixed,
        lm=state.lm_pos, lm_valid=state.lm_valid, lm_fixed=n_obs < 2,
        factors=factors, cam=cam, bf=bf,
    )
    part = partition_problem(problem, mesh.shape[axis])
    out, _, _ = distributed_bundle_adjust(part, mesh, cfg, axis)

    upd = state.kf_valid & ~pose_fixed
    new_state = state._replace(
        kf_R=jnp.where(upd[:, None, None], out.R, state.kf_R),
        kf_t=jnp.where(upd[:, None], out.t, state.kf_t),
        lm_pos=out.lm[:L],
        epoch=state.epoch + 1,
    )
    # outlier unbinding in the ORIGINAL (K, N) factor order — the partitioned
    # problem's factors are landmark-reordered, so re-evaluate residuals on
    # the corrected state instead of unscrambling the permutation
    final = problem._replace(R=new_state.kf_R, t=new_state.kf_t,
                             lm=new_state.lm_pos)
    _, chi2, depth, is_stereo = ba_core.reproj_residuals(final)
    th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    inlier = (chi2 <= th) & (depth > cfg.min_depth)
    drop = (valid & ~inlier).reshape(K, N)
    new_state = new_state._replace(
        kf_obs=jnp.where(drop, -1, new_state.kf_obs))
    new_state = ms.update_landmark_stats(new_state, n_levels, scale)
    return new_state, jnp.sum((valid & inlier).astype(jnp.int32))
