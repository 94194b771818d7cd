"""Pose-graph (essential-graph) optimization over Sim3 / SE3 / 4-DoF states.

TPU-native replacement for the reference's essential-graph optimizers
(reference: Optimizer::OptimizeEssentialGraph src/Optimizer.cc:1501-1783 —
g2o VertexSim3Expmap + EdgeSim3 over spanning-tree + loop + strong-covisible
edges; Optimizer::OptimizeEssentialGraph4DoF src/Optimizer.cc:5300+ with
VertexPose4DoF/Edge4DoF for the inertial case where roll/pitch and scale are
observable and must stay fixed).

Re-design: instead of a sparse graph with per-edge virtual dispatch, all
edges live in one fixed-capacity SoA batch; residuals and their 7x7 (or 4x4)
Jacobians are evaluated with vmap'ed autodiff; the Gauss-Newton normal
equations are assembled by scatter-add into a dense (K*D, K*D) matrix and
solved with one Cholesky. For the reference's typical graph sizes
(K <= a few hundred keyframes) the dense reduced system is small (< 2k x 2k)
and maps straight onto the MXU — no sparse bookkeeping.

Vertex parametrization (left perturbation):
  sim3:  S_i' = exp(xi) * S_i, xi = (rho, phi, sigma) in R^7
  se3:   same with sigma frozen (D effectively 6)
  4dof:  R_i' = Rz(psi) * R_i, t_i' = t_i + dt  (yaw + translation only)

Edge residual (matches g2o EdgeSim3 convention):
  r_ij = log(S_ji * S_i * S_j^{-1})   where S_ji is the measurement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import lie


class PoseGraphEdges(NamedTuple):
    """Fixed-capacity batch of relative-pose constraints."""

    idx_i: jax.Array    # (E,) int32
    idx_j: jax.Array    # (E,) int32
    R_ji: jax.Array     # (E,3,3) measurement S_ji = S_j * S_i^{-1}: residual
                        # log(S_ji * S_i * S_j^{-1}) vanishes at consistency
                        # (matches g2o EdgeSim3 as used at src/Optimizer.cc:1588+)
    t_ji: jax.Array     # (E,3)
    s_ji: jax.Array     # (E,)
    weight: jax.Array   # (E,) information scale (loop edges >= covisibility)
    valid: jax.Array    # (E,) bool

    @staticmethod
    def empty(e: int) -> "PoseGraphEdges":
        return PoseGraphEdges(
            idx_i=jnp.zeros(e, jnp.int32),
            idx_j=jnp.zeros(e, jnp.int32),
            R_ji=jnp.tile(jnp.eye(3, dtype=jnp.float32), (e, 1, 1)),
            t_ji=jnp.zeros((e, 3), jnp.float32),
            s_ji=jnp.ones(e, jnp.float32),
            weight=jnp.ones(e, jnp.float32),
            valid=jnp.zeros(e, bool),
        )


def relative_sim3(R_i, t_i, s_i, R_j, t_j, s_j):
    """Measurement S_ij = S_i * S_j^{-1} (for edge construction from current
    poses, as the reference does for spanning-tree/covisibility edges at
    src/Optimizer.cc:1663-1712)."""
    Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(R_j, t_j, s_j)
    return lie.sim3_compose(R_i, t_i, s_i, Rj_inv, tj_inv, sj_inv)


def _edge_residual(R_i, t_i, s_i, R_j, t_j, s_j, R_m, t_m, s_m):
    """r = log( S_m * S_i * S_j^{-1} ) in R^7."""
    Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(R_j, t_j, s_j)
    R_e, t_e, s_e = lie.sim3_compose(R_i, t_i, s_i, Rj_inv, tj_inv, sj_inv)
    R_e, t_e, s_e = lie.sim3_compose(R_m, t_m, s_m, R_e, t_e, s_e)
    return lie.sim3_log(R_e, t_e, s_e)


def _perturbed_residual(xi_i, xi_j, R_i, t_i, s_i, R_j, t_j, s_j, R_m, t_m, s_m):
    """Residual after left-perturbing both endpoints (autodiff point)."""
    dR_i, dt_i, ds_i = lie.sim3_exp(xi_i)
    dR_j, dt_j, ds_j = lie.sim3_exp(xi_j)
    Ri2, ti2, si2 = lie.sim3_compose(dR_i, dt_i, ds_i, R_i, t_i, s_i)
    Rj2, tj2, sj2 = lie.sim3_compose(dR_j, dt_j, ds_j, R_j, t_j, s_j)
    return _edge_residual(Ri2, ti2, si2, Rj2, tj2, sj2, R_m, t_m, s_m)


_res_and_jac = jax.vmap(
    lambda Ri, ti, si, Rj, tj, sj, Rm, tm, sm: (
        _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm),
        jax.jacfwd(_perturbed_residual, argnums=(0, 1))(
            jnp.zeros(7), jnp.zeros(7), Ri, ti, si, Rj, tj, sj, Rm, tm, sm
        ),
    )
)


class PoseGraphConfig(NamedTuple):
    n_iters: int = 10
    fix_scale: bool = False   # stereo / RGBD / inertial: scale drift = 0
    four_dof: bool = False    # inertial: only yaw + translation adjust
    lambda0: float = 1e-4     # initial LM damping (relative to diag(H))


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize_pose_graph(
    R: jax.Array,          # (K,3,3) T_cw rotations (world->camera, like kf_R)
    t: jax.Array,          # (K,3)
    s: jax.Array,          # (K,)   scales (1 for SE3 graphs)
    fixed: jax.Array,      # (K,) bool — gauge anchors (loop KF in reference)
    edges: PoseGraphEdges,
    cfg: PoseGraphConfig = PoseGraphConfig(),
):
    """Batched Gauss-Newton over the whole graph.

    Returns (R, t, s) optimized. All shapes static; `fixed` and `edges.valid`
    carry the dynamic structure.
    """
    K = R.shape[0]
    D = 7

    # DoF mask per vertex: columns of the local tangent that may move.
    dof = jnp.ones(D)
    if cfg.fix_scale:
        dof = dof.at[6].set(0.0)
    if cfg.four_dof:
        # tangent layout of sim3_exp: (rho[0:3], phi[3:6], sigma[6]);
        # 4-DoF keeps translation + yaw (phi_z ~ index 5), kills roll/pitch.
        dof = dof.at[3].set(0.0).at[4].set(0.0).at[6].set(0.0)

    w = jnp.where(edges.valid, edges.weight, 0.0)

    def chi2_of(R, t, s):
        res = jax.vmap(_edge_residual)(
            R[edges.idx_i], t[edges.idx_i], s[edges.idx_i],
            R[edges.idx_j], t[edges.idx_j], s[edges.idx_j],
            edges.R_ji, edges.t_ji, edges.s_ji,
        )
        return jnp.sum(w * jnp.sum(res * res, axis=-1))

    def lm_step(carry, _):
        R, t, s, lam = carry
        res, (J_i, J_j) = _res_and_jac(
            R[edges.idx_i], t[edges.idx_i], s[edges.idx_i],
            R[edges.idx_j], t[edges.idx_j], s[edges.idx_j],
            edges.R_ji, edges.t_ji, edges.s_ji,
        )
        free_i = ~fixed[edges.idx_i]
        free_j = ~fixed[edges.idx_j]
        J_i = J_i * (w[:, None, None] ** 0.5) * free_i[:, None, None] * dof[None, None, :]
        J_j = J_j * (w[:, None, None] ** 0.5) * free_j[:, None, None] * dof[None, None, :]
        r_w = res * (w[:, None] ** 0.5)
        chi2_cur = jnp.sum(r_w * r_w)

        # normal equations, scatter-added into dense (K*D, K*D)
        H = jnp.zeros((K, D, K, D))
        b = jnp.zeros((K, D))
        Hii = jnp.einsum("era,erb->eab", J_i, J_i)
        Hjj = jnp.einsum("era,erb->eab", J_j, J_j)
        Hij = jnp.einsum("era,erb->eab", J_i, J_j)
        H = H.at[edges.idx_i, :, edges.idx_i, :].add(Hii)
        H = H.at[edges.idx_j, :, edges.idx_j, :].add(Hjj)
        H = H.at[edges.idx_i, :, edges.idx_j, :].add(Hij)
        H = H.at[edges.idx_j, :, edges.idx_i, :].add(jnp.swapaxes(Hij, 1, 2))
        b = b.at[edges.idx_i].add(-jnp.einsum("erd,er->ed", J_i, r_w))
        b = b.at[edges.idx_j].add(-jnp.einsum("erd,er->ed", J_j, r_w))

        Hd = H.reshape(K * D, K * D)
        hdiag = jnp.diag(Hd)
        # frozen DoFs get an identity row to keep the system non-singular
        diag_mask = (jnp.tile(dof, K) > 0) & jnp.repeat(~fixed, D)
        damp = jnp.where(diag_mask, lam * jnp.maximum(hdiag, 1e-3), 1.0)
        dx = jax.scipy.linalg.solve(Hd + jnp.diag(damp), b.reshape(-1), assume_a="pos")
        dx = dx.reshape(K, D) * dof[None, :] * (~fixed)[:, None]

        dRs, dts, dss = jax.vmap(lie.sim3_exp)(dx)
        R2, t2, s2 = jax.vmap(lie.sim3_compose)(dRs, dts, dss, R, t, s)
        R2 = jax.vmap(lie.so3_normalize)(R2)

        # accept only improving steps (Levenberg-Marquardt schedule)
        chi2_new = chi2_of(R2, t2, s2)
        ok = chi2_new < chi2_cur
        R3 = jnp.where(ok, R2, R)
        t3 = jnp.where(ok, t2, t)
        s3 = jnp.where(ok, s2, s)
        lam2 = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 8.0, 1e6))
        return (R3, t3, s3, lam2), chi2_cur

    init = (R, t, s, jnp.float32(cfg.lambda0))
    (R, t, s, _), chi2 = jax.lax.scan(lm_step, init, None, length=cfg.n_iters)
    return R, t, s, chi2


def essential_edges_from_map(
    kf_R, kf_t, kf_valid, kf_prev, cov, max_edges: int,
    cov_threshold: int = 100,
):
    """Host-side edge assembly from the map snapshot (numpy in, arrays out).

    Reference semantics (src/Optimizer.cc:1588-1712): spanning-tree edges
    (here the temporal kf_prev chain), strong covisibility edges
    (weight >= 100), plus caller-appended loop edges. Measurements are the
    CURRENT relative poses (before correction), which is exactly how the
    reference builds non-loop edges.
    """
    import numpy as np

    K = kf_R.shape[0]
    ii, jj, ww = [], [], []
    for k in range(K):
        if not kf_valid[k]:
            continue
        p = int(kf_prev[k])
        if p >= 0 and kf_valid[p]:
            ii.append(k); jj.append(p); ww.append(1.0)
    cov_np = np.asarray(cov)
    for a in range(K):
        if not kf_valid[a]:
            continue
        for b_ in range(a + 1, K):
            if cov_np[a, b_] >= cov_threshold and kf_valid[b_]:
                ii.append(a); jj.append(b_); ww.append(1.0)
    n = min(len(ii), max_edges)
    edges = PoseGraphEdges.empty(max_edges)
    if n == 0:
        return edges
    ii = np.asarray(ii[:n], np.int32)
    jj = np.asarray(jj[:n], np.int32)
    R_i, t_i = jnp.asarray(kf_R[ii]), jnp.asarray(kf_t[ii])
    R_j, t_j = jnp.asarray(kf_R[jj]), jnp.asarray(kf_t[jj])
    ones = jnp.ones(n)
    # measurement S_ji = S_j * S_i^{-1} (see PoseGraphEdges docstring)
    R_m, t_m, s_m = jax.vmap(relative_sim3)(R_j, t_j, ones, R_i, t_i, ones)
    pad = max_edges - n
    f32 = jnp.float32
    return PoseGraphEdges(
        idx_i=jnp.concatenate([jnp.asarray(ii), jnp.zeros(pad, jnp.int32)]),
        idx_j=jnp.concatenate([jnp.asarray(jj), jnp.zeros(pad, jnp.int32)]),
        R_ji=jnp.concatenate([R_m, jnp.tile(jnp.eye(3, dtype=f32), (pad, 1, 1))]),
        t_ji=jnp.concatenate([t_m, jnp.zeros((pad, 3), f32)]),
        s_ji=jnp.concatenate([s_m, jnp.ones(pad, f32)]),
        weight=jnp.concatenate([jnp.asarray(ww[:n], f32), jnp.ones(pad, f32)]),
        valid=jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)]),
    )


def add_loop_edge(edges: PoseGraphEdges, slot: int, i: int, j: int,
                  R_ji, t_ji, s_ji, weight: float = 100.0) -> PoseGraphEdges:
    """Append one loop-closure constraint into a free slot (host-side)."""
    return edges._replace(
        idx_i=edges.idx_i.at[slot].set(i),
        idx_j=edges.idx_j.at[slot].set(j),
        R_ji=edges.R_ji.at[slot].set(R_ji),
        t_ji=edges.t_ji.at[slot].set(t_ji),
        s_ji=edges.s_ji.at[slot].set(s_ji),
        weight=edges.weight.at[slot].set(weight),
        valid=edges.valid.at[slot].set(True),
    )
