"""Closed-form Sim3/SE3 alignment (Horn) + batched-hypothesis RANSAC.

TPU-native replacement for the reference's Sim3Solver
(reference semantics: src/Sim3Solver.cc — ComputeSim3 :311 closed-form Horn
with optional fixed scale, RANSAC `iterate` :218 with reprojection-error
inlier gating in both cameras) and for evaluation-time Horn alignment
(evaluation/evaluate_ate_scale.py:49-97).

Re-design (SURVEY.md §7 hard part #4): instead of sequential RANSAC
iterations, sample ALL hypotheses at once (H, 3) index sets, solve all Horn
problems batched (closed form is pure linalg -> vmap), score all hypotheses
against all correspondences in one (H, N) pass, argmax inliers, refine once
on the winner's inliers. Deterministic under a fixed key.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project


def horn_alignment(src, dst, weight, fix_scale: bool = False):
    """Weighted closed-form similarity src -> dst: dst ~ s R src + t.

    src, dst: (..., N, 3); weight: (..., N) nonnegative.
    Returns (R (...,3,3), t (...,3), s (...,)).
    Quaternion-free formulation: SVD of the weighted cross-covariance
    (equivalent to Horn's method for this use)."""
    wsum = jnp.maximum(weight.sum(-1, keepdims=True), 1e-9)
    wn = weight / wsum
    mu_s = jnp.einsum("...n,...ni->...i", wn, src)
    mu_d = jnp.einsum("...n,...ni->...i", wn, dst)
    cs = src - mu_s[..., None, :]
    cd = dst - mu_d[..., None, :]
    W = jnp.einsum("...n,...ni,...nj->...ij", wn, cd, cs)  # dst x src
    U, S, Vt = jnp.linalg.svd(W)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
    if fix_scale:
        s = jnp.ones_like(det)
    else:
        var_s = jnp.einsum("...n,...ni,...ni->...", wn, cs, cs)
        s = jnp.einsum("...i,...i->...", S, D) / jnp.maximum(var_s, 1e-12)
    t = mu_d - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t, s


class Sim3Result(NamedTuple):
    R: jax.Array
    t: jax.Array
    s: jax.Array
    inliers: jax.Array   # (N,) bool
    n_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def sim3_ransac(
    key,
    pts1, pts2,            # (N, 3) matched 3D points in each KF's camera frame
    valid,                 # (N,) bool
    cam1: Camera, cam2: Camera,
    sigma2_1, sigma2_2,    # (N,) per-match pixel sigma^2 (octave-scaled)
    n_hyp: int = 128,
    fix_scale: bool = False,
    chi2_th: float = 9.21,  # 2-DoF 99% like the reference (th = 9.21 sigma^2)
):
    """Batched RANSAC Sim3 between two matched camera-frame point sets.

    Scoring projects pts2 transformed into cam1 and vice versa and gates both
    reprojection errors (reference: Sim3Solver::CheckInliers)."""
    n = pts1.shape[0]
    k1, k2 = jax.random.split(key)
    # sample 3 distinct-ish indices per hypothesis among valid slots: sample
    # from weighted categorical over valid mask
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(k1, logits[None, :], shape=(n_hyp, 3))
    s1 = pts1[idx]  # (H, 3, 3)
    s2 = pts2[idx]
    w = jnp.ones((n_hyp, 3))
    R, t, s = horn_alignment(s2, s1, w, fix_scale)  # maps pts2 -> pts1 frame

    # score all hypotheses: project transformed points
    p2in1 = s[:, None, None] * jnp.einsum("hij,nj->hni", R, pts2) + t[:, None, :]
    uv1 = project(cam1, p2in1)                      # (H, N, 2)
    obs1 = project(cam1, pts1)                      # (N, 2)
    e1 = jnp.sum((uv1 - obs1[None]) ** 2, -1) / sigma2_1[None]
    # inverse transform: pts1 -> 2
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    p1in2 = s_inv[:, None, None] * jnp.einsum("hij,hnj->hni", Rt, pts1[None] - t[:, None, :])
    uv2 = project(cam2, p1in2)
    obs2 = project(cam2, pts2)
    e2 = jnp.sum((uv2 - obs2[None]) ** 2, -1) / sigma2_2[None]
    good = (e1 < chi2_th) & (e2 < chi2_th) & valid[None]
    # positive depth + positive scale guards
    good &= (p2in1[..., 2] > 0) & (p1in2[..., 2] > 0)
    score = good.sum(-1)
    best = jnp.argmax(score)
    inl = good[best]
    # refine on winner's inliers (one weighted Horn pass)
    Rr, tr, sr = horn_alignment(pts2, pts1, inl.astype(jnp.float32), fix_scale)
    # recompute inliers at refined transform
    p2in1r = sr * (pts2 @ Rr.T) + tr
    uv1r = project(cam1, p2in1r)
    e1r = jnp.sum((uv1r - obs1) ** 2, -1) / sigma2_1
    p1in2r = (1.0 / sr) * ((pts1 - tr) @ Rr)
    uv2r = project(cam2, p1in2r)
    e2r = jnp.sum((uv2r - obs2) ** 2, -1) / sigma2_2
    inl_r = (e1r < chi2_th) & (e2r < chi2_th) & valid
    inl_r &= (p2in1r[..., 2] > 0) & (p1in2r[..., 2] > 0)
    return Sim3Result(Rr, tr, sr, inl_r, inl_r.sum())


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def sim3_refine(
    R, t, s,               # initial Sim3 mapping pts2-frame -> pts1-frame
    pts1, pts2,            # (N, 3) matched camera-frame points
    valid,
    cam1: Camera, cam2: Camera,
    sigma2_1, sigma2_2,
    n_iters: int = 8,
    fix_scale: bool = False,
    chi2_th: float = 9.21,
    huber2: float = 10.0,
):
    """Gauss-Newton refinement of a Sim3 over symmetric reprojection errors
    with Huber weighting (reference: Optimizer::OptimizeSim3
    src/Optimizer.cc:2115 — VertexSim3Expmap + paired forward/inverse
    EdgeSim3ProjectXYZ edges, Huber delta = sqrt(10), run between the RANSAC
    solution and loop acceptance at src/LoopClosing.cc:767).

    The 7-DoF update is a left-multiplicative perturbation
    x -> e^l Exp(w) (s R x + t) + v, linearized by forward-mode autodiff at
    zero. Returns a Sim3Result with re-evaluated inliers.
    """
    from orb_slam3_vio_fixes_tpu.utils import lie

    obs1 = project(cam1, pts1)
    obs2 = project(cam2, pts2)
    inv_sig1 = 1.0 / jnp.sqrt(jnp.maximum(sigma2_1, 1e-9))
    inv_sig2 = 1.0 / jnp.sqrt(jnp.maximum(sigma2_2, 1e-9))

    def apply_delta(params, d):
        R_, t_, s_ = params
        dR = lie.so3_exp(d[:3])
        ds = jnp.where(fix_scale, 1.0, jnp.exp(d[6]))
        return (dR @ R_, ds * (dR @ t_) + d[3:6], ds * s_)

    def residuals(params):
        R_, t_, s_ = params
        p2in1 = s_ * pts2 @ R_.T + t_
        r1 = (project(cam1, p2in1) - obs1) * inv_sig1[:, None]
        p1in2 = (1.0 / s_) * (pts1 - t_) @ R_
        r2 = (project(cam2, p1in2) - obs2) * inv_sig2[:, None]
        depth_ok = (p2in1[:, 2] > 1e-3) & (p1in2[:, 2] > 1e-3)
        return r1, r2, depth_ok

    def step(params, _):
        r1, r2, depth_ok = residuals(params)
        act = valid & depth_ok
        # Huber IRLS weights on per-edge chi2
        c1 = jnp.sum(r1 * r1, -1)
        c2 = jnp.sum(r2 * r2, -1)
        w1 = jnp.where(act, jnp.minimum(1.0, jnp.sqrt(huber2 / jnp.maximum(c1, 1e-12))), 0.0)
        w2 = jnp.where(act, jnp.minimum(1.0, jnp.sqrt(huber2 / jnp.maximum(c2, 1e-12))), 0.0)

        def f(d):
            p = apply_delta(params, d)
            a, b, _ = residuals(p)
            return jnp.concatenate([a.reshape(-1), b.reshape(-1)])

        d0 = jnp.zeros(7)
        J = jax.jacfwd(f)(d0)                       # (4N, 7)
        r = f(d0)
        w = jnp.concatenate([
            jnp.repeat(w1, 2), jnp.repeat(w2, 2)])
        JtW = J.T * w[None, :]
        H = JtW @ J + 1e-6 * jnp.eye(7)
        g = JtW @ r
        d = -jnp.linalg.solve(H, g)
        return apply_delta(params, d), None

    params, _ = jax.lax.scan(step, (R, t, s), None, length=n_iters)
    R_, t_, s_ = params
    r1, r2, depth_ok = residuals(params)
    inl = (jnp.sum(r1 * r1, -1) < chi2_th) & (jnp.sum(r2 * r2, -1) < chi2_th)
    inl &= valid & depth_ok
    return Sim3Result(R_, t_, s_, inl, inl.sum())
