"""Batched maximum-likelihood PnP RANSAC: camera pose from 3D-2D matches.

TPU-native replacement for the reference's MLPnPsolver
(reference: src/MLPnPsolver.cpp — maximum-likelihood PnP inside a RANSAC
loop, used only by Tracking::Relocalization src/Tracking.cc:3656-3658 with
parameters P(0.99), minInliers 10, maxIter 300, minSet 6; the ML machinery
is the bearing-vector nullspace formulation `computePose` :356 with
per-observation covariance and the Gauss-Newton polish `mlpnp_gn` :694).

Re-design (SURVEY.md §7 hard part #4): the sequential RANSAC loop becomes a
fixed batch of hypotheses — sample H 6-point sets, solve every DLT projection
matrix in one batched 12x12 eigendecomposition, score all hypotheses against
all points in one (H, N) reprojection pass. The reference's ML layer is kept
but batched: the top-K hypotheses are each polished by a vmapped Gauss-Newton
on BEARING-VECTOR NULLSPACE residuals — for each observed ray v_i with
tangent basis (r_i, s_i), the residual is [r_i, s_i]^T (R X_i + t)/|R X_i+t|,
weighted by the per-point information propagated from the octave's pixel
sigma^2 (sigma_bearing ~ sigma_px / fx) — then re-scored, and the best
refined pose wins. This matches MLPnP's statistical model while turning its
per-candidate sequential GN into one batched kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.linalg import solve6
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

CHI2_2D = 5.991  # chi2 2-DoF 95% (reference PoseOptimization mono threshold)


def _dlt_p(X, xn):
    """Batched 6-point DLT for the 3x4 projection matrix.

    X: (H, 6, 3) world points; xn: (H, 6, 2) normalized image coords.
    Returns (H, 3, 4).
    """
    H = X.shape[0]
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], -1)                    # (H, 6, 4)
    zero = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    r1 = jnp.concatenate([Xh, zero, -u * Xh], -1)          # (H, 6, 12)
    r2 = jnp.concatenate([zero, Xh, -v * Xh], -1)
    A = jnp.concatenate([r1, r2], -2)                      # (H, 12, 12)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., 0].reshape(H, 3, 4)


def _extract_rt(P):
    """Orthogonal Procrustes: P[:, :3] ~ sR -> nearest rotation + scale.

    Returns (R (H,3,3), t (H,3))."""
    M = P[:, :, :3]
    u, s, vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.einsum("hij,hjk->hik", u, vt))
    fix = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = jnp.einsum("hij,hj,hjk->hik", u, fix, vt)
    scale = jnp.mean(s, -1) * jnp.sign(det)  # det<0 -> mirror: flip scale
    t = P[:, :, 3] / jnp.where(
        jnp.abs(scale[:, None]) > 1e-9, scale[:, None], 1e-9)
    return R, t


def bearing_tangent_basis(v):
    """Orthonormal tangent basis (r, s) for unit bearings v (N, 3)
    (reference: the nullspace basis of each bearing vector that MLPnP's
    residuals live in, src/MLPnPsolver.cpp:356-420)."""
    # pick the world axis least aligned with v for a stable cross product
    ax = jnp.where(jnp.abs(v[:, 0:1]) < 0.9,
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape),
                   jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), v.shape))
    r = jnp.cross(v, ax)
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)
    s = jnp.cross(v, r)
    return r, s


def _mlpnp_gn(R0, t0, X, r_b, s_b, w, iters: int = 8):
    """Gauss-Newton on bearing nullspace residuals for ONE hypothesis
    (vmapped over hypotheses by the caller; reference: mlpnp_gn
    src/MLPnPsolver.cpp:694-780).

    R0,t0: initial pose; X: (N,3) points; r_b,s_b: (N,3) tangent bases of
    the observed bearings; w: (N,) residual information (0 = excluded).
    """
    def body(carry, _):
        R, t = carry
        q = jnp.einsum("ij,nj->ni", R, X)               # (N, 3) rotated point
        u = q + t
        un = jnp.linalg.norm(u, axis=-1, keepdims=True)
        uh = u / jnp.maximum(un, 1e-9)
        res = jnp.stack([jnp.sum(r_b * uh, -1),
                         jnp.sum(s_b * uh, -1)], -1)    # (N, 2)
        # d uh/d u = (I - uh uh^T)/|u|; d u/d tau = I;
        # left perturbation R <- exp(w) R: d u/d w (dw) = dw x q = -[q]x dw.
        # Row k of (J_u @ -[q]x) is -J_u.(q x e_k) = -e_k.(J_u x q)
        #   = (q x J_u)_k  (scalar triple product), so J_w = cross(q, J_u).
        P = (jnp.eye(3)[None] - uh[:, :, None] * uh[:, None, :]) / jnp.maximum(
            un[:, :, None], 1e-9)
        Jr = jnp.einsum("ni,nij->nj", r_b, P)           # (N, 3) d res_r / d u
        Js = jnp.einsum("ni,nij->nj", s_b, P)
        Jr_w = jnp.cross(q, Jr)
        Js_w = jnp.cross(q, Js)
        J = jnp.stack([jnp.concatenate([Jr_w, Jr], -1),
                       jnp.concatenate([Js_w, Js], -1)], 1)  # (N, 2, 6)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nri,nrj->ij", Jw, J)
        b = jnp.einsum("nri,nr->i", Jw, res)
        dx = solve6((H + 1e-8 * jnp.eye(6))[None], -b[None])[0]
        R_new = lie.so3_normalize(lie.so3_exp(dx[:3]) @ R)
        t_new = t + dx[3:]
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(body, (R0, t0), None, length=iters)
    return R, t


class PnPResult(NamedTuple):
    success: jax.Array    # bool
    R: jax.Array          # (3,3) world->camera
    t: jax.Array          # (3,)
    inliers: jax.Array    # (N,) bool
    n_inliers: jax.Array  # int32


@functools.partial(jax.jit,
                   static_argnames=("n_hyp", "min_inliers", "n_refine",
                                    "gn_iters"))
def pnp_ransac(
    key,
    X,            # (N, 3) world points
    uv,           # (N, 2) observed pixels
    valid,        # (N,) bool
    inv_sigma2,   # (N,) per-observation information (octave-dependent)
    cam: Camera,
    n_hyp: int = 256,
    min_inliers: int = 10,
    n_refine: int = 4,
    gn_iters: int = 8,
) -> PnPResult:
    """All-hypothesis ML-PnP RANSAC. Hypothesis sign is disambiguated by
    cheirality (most points in front of the camera); the top n_refine
    hypotheses get the covariance-weighted bearing-space Gauss-Newton polish
    on their inliers (vmapped) before the final selection."""
    n = X.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits[None], shape=(n_hyp, 6))
    Xs = X[idx]
    # normalized coordinates
    xn_all = jnp.stack(
        [(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], -1)
    xs = xn_all[idx]

    P = _dlt_p(Xs, xs)
    R, t = _extract_rt(P)

    def score(R, t):
        Xc = jnp.einsum("hij,nj->hni", R, X) + t[:, None, :]
        z = Xc[..., 2]
        front = (z > 0.05) & valid[None, :]
        uvp = jnp.stack(
            [cam.fx * Xc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx,
             cam.fy * Xc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy], -1)
        err2 = jnp.sum((uvp - uv[None]) ** 2, -1) * inv_sigma2[None]
        inl = front & (err2 < CHI2_2D)
        return inl, jnp.sum(inl.astype(jnp.int32), -1)

    # cheirality vote: flip (R, t) sign cannot fix a projective DLT sign —
    # the scale sign already handled it; count in-front points
    inl, n_inl = score(R, t)

    # ML polish of the top hypotheses: bearing nullspace GN weighted by the
    # octave information mapped to bearing space (sigma_b = sigma_px / f, so
    # w = inv_sigma2 * f^2; the common f^2 only matters relative to the GN
    # damping, so it is kept for conditioning fidelity)
    _, top = jax.lax.top_k(n_inl, n_refine)
    bear = jnp.concatenate([xn_all, jnp.ones((n, 1), xn_all.dtype)], -1)
    bear = bear / jnp.linalg.norm(bear, axis=-1, keepdims=True)
    r_b, s_b = bearing_tangent_basis(bear)
    f2 = cam.fx * cam.fy
    w_all = inv_sigma2 * f2 * valid.astype(jnp.float32)
    R_ref, t_ref = jax.vmap(
        lambda Ri, ti, inli: _mlpnp_gn(
            Ri, ti, X, r_b, s_b, w_all * inli.astype(jnp.float32),
            iters=gn_iters)
    )(R[top], t[top], inl[top])
    inl_ref, n_ref = score(R_ref, t_ref)
    ib = jnp.argmax(n_ref)
    best_unref = jnp.argmax(n_inl)
    use_ref = n_ref[ib] >= n_inl[best_unref]
    n_best = jnp.where(use_ref, n_ref[ib], n_inl[best_unref])
    return PnPResult(
        success=n_best >= min_inliers,
        R=jnp.where(use_ref, R_ref[ib], R[best_unref]),
        t=jnp.where(use_ref, t_ref[ib], t[best_unref]),
        inliers=jnp.where(use_ref, inl_ref[ib], inl[best_unref]),
        n_inliers=n_best,
    )
