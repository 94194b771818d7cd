"""Monocular map initialization: two-view reconstruction via batched RANSAC.

TPU-native replacement for the reference's TwoViewReconstruction
(reference semantics: src/TwoViewReconstruction.cc — 200 RANSAC iterations of
8-point sets computing F and H "in parallel" (:105-110), model choice
RH = SH/(SH+SF) > 0.5 (:114-119), 4 motion hypotheses from E / 8 from H,
cheirality + parallax + reprojection checks (CheckRT), success needs >=50
triangulated and clear winner).

Re-design (SURVEY.md §7 hard part #4): all 200 hypotheses for BOTH models are
solved in one batched 9x9 eigendecomposition each, scored against all matches
in one (H, N) pass; motion hypotheses are checked in one vmapped CheckRT.
The reference's two std::threads become two array axes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops.triangulate import triangulate_dlt
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

TH_F = 3.841   # chi2 1-DoF 95% (reference CheckFundamental)
TH_H = 5.991   # chi2 2-DoF 95% (reference CheckHomography)
TH_SCORE = 5.991


def _normalize(uv, valid):
    """Zero-mean, unit mean-abs-dev normalization (reference: Normalize)."""
    n = jnp.maximum(valid.sum(), 1)
    mean = jnp.sum(jnp.where(valid[:, None], uv, 0.0), 0) / n
    dev = jnp.sum(jnp.where(valid[:, None], jnp.abs(uv - mean), 0.0), 0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    uvn = (uv - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return uvn, T


def _dlt_f(p1, p2):
    """8-point fundamental: (H, 8, 2) x2 -> (H, 3, 3), rank-2 enforced."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (H, 8, 9)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    _, v = jnp.linalg.eigh(AtA)
    f = v[..., 0].reshape(-1, 3, 3)
    # enforce rank 2
    u, s, vt = jnp.linalg.svd(f)
    s = s.at[..., 2].set(0.0)
    return jnp.einsum("hij,hj,hjk->hik", u, s, vt)


def _dlt_h(p1, p2):
    """Homography from 8 points by DLT (reference uses the same sets)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (H, 16, 9)
    AtA = jnp.einsum("hni,hnj->hij", A, A)
    _, v = jnp.linalg.eigh(AtA)
    return v[..., 0].reshape(-1, 3, 3)


def _score_f(F, uv1, uv2, valid):
    """Symmetric epipolar transfer score (reference: CheckFundamental)."""
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], -1)  # (N, 3)
    p2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], -1)
    l2 = jnp.einsum("hij,nj->hni", F, p1)   # line in img2
    l1 = jnp.einsum("hji,nj->hni", F, p2)   # line in img1
    d2 = jnp.einsum("ni,hni->hn", p2, l2) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12
    )
    d1 = jnp.einsum("ni,hni->hn", p1, l1) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12
    )
    in1 = d1 < TH_F
    in2 = d2 < TH_F
    sc = jnp.where(in1, TH_SCORE - d1, 0.0) + jnp.where(in2, TH_SCORE - d2, 0.0)
    sc = jnp.where(valid[None], sc, 0.0)
    inl = in1 & in2 & valid[None]
    return sc.sum(-1), inl


def _score_h(H, uv1, uv2, valid):
    """Symmetric homography transfer score (reference: CheckHomography)."""
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], -1)
    p2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], -1)
    Hp1 = jnp.einsum("hij,nj->hni", H, p1)
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    Hp2 = jnp.einsum("hij,nj->hni", Hinv, p2)
    q2 = Hp1[..., :2] / jnp.where(jnp.abs(Hp1[..., 2:]) < 1e-12, 1e-12, Hp1[..., 2:])
    q1 = Hp2[..., :2] / jnp.where(jnp.abs(Hp2[..., 2:]) < 1e-12, 1e-12, Hp2[..., 2:])
    d2 = jnp.sum((q2 - uv2[None]) ** 2, -1)
    d1 = jnp.sum((q1 - uv1[None]) ** 2, -1)
    in1 = d1 < TH_H
    in2 = d2 < TH_H
    sc = jnp.where(in1, TH_SCORE - d1, 0.0) + jnp.where(in2, TH_SCORE - d2, 0.0)
    sc = jnp.where(valid[None], sc, 0.0)
    inl = in1 & in2 & valid[None]
    return sc.sum(-1), inl


def _motions_from_e(E):
    """4 motion hypotheses from an essential matrix (reference:
    DecomposeE)."""
    u, s, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    Wm = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ Wm @ vt
    R2 = u @ Wm.T @ vt
    t = u[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _motions_from_h(Hm, K):
    """8 motion hypotheses from a homography, Faugeras SVD method
    (reference: ReconstructH src/TwoViewReconstruction.cc:571+)."""
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ Hm @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]
    # x1/x3 magnitudes
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    Rs, ts = [], []
    # case d' = d2 (positive)
    aux_st = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st_signs = jnp.array([1.0, -1.0, -1.0, 1.0])
    for i in range(4):
        st = st_signs[i] * aux_st
        Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' = -d2
    aux_sp = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        sp = st_signs[i] * aux_sp
        Rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]])
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


def _check_rt(R, t, uv1, uv2, rays1, rays2, inliers, cam, sigma2: float = 1.0):
    """Triangulate with (R, t) and count good points (reference: CheckRT —
    finite, positive depth in both views, parallax < threshold filtered,
    reprojection < 4 sigma^2 in both)."""
    n = uv1.shape[0]
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    Xw = triangulate_dlt(
        jnp.broadcast_to(eye, (n, 3, 3)), jnp.broadcast_to(zero, (n, 3)),
        jnp.broadcast_to(R, (n, 3, 3)), jnp.broadcast_to(t, (n, 3)),
        rays1, rays2,
    )
    finite = jnp.all(jnp.isfinite(Xw), -1)
    z1 = Xw[:, 2]
    Xc2 = Xw @ R.T + t
    z2 = Xc2[:, 2]
    # parallax
    C2 = -R.T @ t
    n1 = Xw
    n2 = Xw - C2
    cosp = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    e1 = project(cam, Xw) - uv1
    e2 = project(cam, Xc2) - uv2
    ok = (
        finite & inliers
        & (z1 > 0) & (z2 > 0)
        & (cosp < 0.99998)
        & (jnp.sum(e1 * e1, -1) < 4.0 * sigma2)
        & (jnp.sum(e2 * e2, -1) < 4.0 * sigma2)
    )
    good_parallax = jnp.sort(jnp.where(ok, cosp, 1.0))
    # parallax of the 50th-best point like the reference
    idx50 = jnp.minimum(50, jnp.maximum(ok.sum() - 1, 0))
    parallax_cos = good_parallax[idx50]
    return ok, Xw, parallax_cos


class TwoViewResult(NamedTuple):
    success: jax.Array     # bool
    R: jax.Array           # (3,3) T_21 rotation
    t: jax.Array           # (3,) unit-norm translation
    points: jax.Array      # (N, 3) world points in cam1 frame
    good: jax.Array        # (N,) bool triangulated
    used_homography: jax.Array


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def reconstruct(
    key,
    uv1, uv2,        # (N, 2) matched keypoints (cam1/frame1, cam2/frame2)
    valid,           # (N,) bool match validity
    cam: Camera,
    n_hyp: int = 200,
    min_triangulated: int = 50,
):
    """Full two-view initialization (reference: Reconstruct
    src/TwoViewReconstruction.cc:41-129)."""
    n = uv1.shape[0]
    uv1n, T1 = _normalize(uv1, valid)
    uv2n, T2 = _normalize(uv2, valid)
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.random.categorical(key, logits[None], shape=(n_hyp, 8))
    p1 = uv1n[idx]
    p2 = uv2n[idx]

    Fn = _dlt_f(p1, p2)
    Hn = _dlt_h(p1, p2)
    # denormalize: F = T2^T Fn T1 ; H = T2^-1 Hn T1
    F = jnp.einsum("ji,hjk,kl->hil", T2, Fn, T1)
    Hm = jnp.einsum("ij,hjk,kl->hil", jnp.linalg.inv(T2), Hn, T1)

    sf, inl_f = _score_f(F, uv1, uv2, valid)
    sh, inl_h = _score_h(Hm, uv1, uv2, valid)
    bf_i = jnp.argmax(sf)
    bh_i = jnp.argmax(sh)
    SF, SH = sf[bf_i], sh[bh_i]
    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = RH > 0.5

    K = cam.K
    rays1 = jnp.concatenate(
        [(uv1 - jnp.stack([cam.cx, cam.cy])) / jnp.stack([cam.fx, cam.fy]),
         jnp.ones((n, 1))], -1,
    )
    rays2 = jnp.concatenate(
        [(uv2 - jnp.stack([cam.cx, cam.cy])) / jnp.stack([cam.fx, cam.fy]),
         jnp.ones((n, 1))], -1,
    )

    E = K.T @ F[bf_i] @ K
    Rf, tf = _motions_from_e(E)
    Rh, th = _motions_from_h(Hm[bh_i], K)
    Rs = jnp.concatenate([Rf, Rh])       # (12, 3, 3)
    ts = jnp.concatenate([tf, th])
    cand_mask = jnp.concatenate(
        [jnp.full(4, True), jnp.full(8, False)]
    )
    cand_active = jnp.where(use_h, ~cand_mask, cand_mask)  # pick 4 E or 8 H
    inliers = jnp.where(use_h, inl_h[bh_i], inl_f[bf_i])

    ok_all, Xw_all, par_all = jax.vmap(
        lambda R, t: _check_rt(R, t, uv1, uv2, rays1, rays2, inliers, cam)
    )(Rs, ts)
    n_good = jnp.where(cand_active, ok_all.sum(-1), -1)
    best = jnp.argmax(n_good)
    n_best = n_good[best]
    # uniqueness: no other candidate within 0.75 * best (reference: nsimilar)
    similar = jnp.sum(n_good > 0.75 * n_best)
    parallax_ok = par_all[best] < 0.9998  # ~1 degree
    success = (
        (n_best >= min_triangulated)
        & (similar == 1)
        & parallax_ok
        & (n_best > 0.8 * jnp.maximum(inliers.sum(), 1))
    )
    return TwoViewResult(
        success=success,
        R=Rs[best], t=ts[best],
        points=Xw_all[best],
        good=ok_all[best],
        used_homography=use_h,
    )
