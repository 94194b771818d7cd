"""Batched PnP RANSAC: camera pose from 3D-2D correspondences.

TPU-native replacement for the reference's MLPnPsolver
(reference: src/MLPnPsolver.cpp — maximum-likelihood PnP inside a RANSAC
loop, used only by Tracking::Relocalization src/Tracking.cc:3656-3658 with
parameters P(0.99), minInliers 10, maxIter 300, minSet 6).

Re-design (SURVEY.md §7 hard part #4): the sequential RANSAC loop becomes a
fixed batch of hypotheses — sample H 6-point sets, solve every DLT projection
matrix in one batched 12x12 eigendecomposition, score all hypotheses against
all points in one (H, N) reprojection pass, take the argmax. The minimal
solver is the classic 6-point DLT with orthogonal Procrustes extraction of R
(the ML refinement the reference runs afterwards is our pose_optimize, which
the caller invokes on the RANSAC inliers).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

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


class PnPResult(NamedTuple):
    success: jax.Array    # bool
    R: jax.Array          # (3,3) world->camera
    t: jax.Array          # (3,)
    inliers: jax.Array    # (N,) bool
    n_inliers: jax.Array  # int32


@functools.partial(jax.jit, static_argnames=("n_hyp", "min_inliers"))
def pnp_ransac(
    key,
    X,            # (N, 3) world points
    uv,           # (N, 2) observed pixels
    valid,        # (N,) bool
    inv_sigma2,   # (N,) per-observation information (octave-dependent)
    cam: Camera,
    n_hyp: int = 256,
    min_inliers: int = 10,
) -> PnPResult:
    """All-hypothesis PnP RANSAC. Hypothesis sign is disambiguated by
    cheirality (most points in front of the camera)."""
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

    # cheirality vote: flip (R, t) sign cannot fix a projective DLT sign —
    # the scale sign already handled it; count in-front points
    Xc = jnp.einsum("hij,nj->hni", R, X) + t[:, None, :]
    z = Xc[..., 2]
    front = (z > 0.05) & valid[None, :]
    uvp = jnp.stack(
        [cam.fx * Xc[..., 0] / jnp.maximum(z, 1e-6) + cam.cx,
         cam.fy * Xc[..., 1] / jnp.maximum(z, 1e-6) + cam.cy], -1)
    err2 = jnp.sum((uvp - uv[None]) ** 2, -1) * inv_sigma2[None]
    inl = front & (err2 < CHI2_2D)
    n_inl = jnp.sum(inl.astype(jnp.int32), -1)            # (H,)
    best = jnp.argmax(n_inl)
    n_best = n_inl[best]
    return PnPResult(
        success=n_best >= min_inliers,
        R=R[best], t=t[best],
        inliers=inl[best],
        n_inliers=n_best,
    )
