"""Triangulation: batched DLT + stereo back-projection.

TPU-native replacement for GeometricTools::Triangulate (reference:
src/GeometricTools.cc:46-66 — SVD DLT on the 4x4 system) and the
triangulation gates used by LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:388-712: parallax test, positive depth both views,
reprojection error, scale consistency).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project, unproject
from orb_slam3_vio_fixes_tpu.utils.linalg import inv3


@jax.jit
def triangulate_dlt(R1, t1, R2, t2, ray1, ray2):
    """Batched DLT triangulation in normalized coordinates.

    R*, t*: (..., 3, 3), (..., 3) — T_cw of the two cameras.
    ray1/ray2: (..., 3) — unit-depth bearings (x/z, y/z, 1) in each camera.
    Returns world points (..., 3).

    Solves A [X; 1] = 0 with rows (x*P3 - P1), (y*P3 - P2) per view. The
    reference runs a full SVD (src/GeometricTools.cc:46-66); the round-4
    build used the smallest eigenvector of the 4x4 A^T A — but XLA's batched
    `eigh` is latency-bound on TPU (it dominated the 18 ms triangulation
    stage). Since every accepted landmark is FINITE (the parallax/depth/
    reprojection gates reject near-infinity points), the homogeneous scale
    can be pinned to w=1: solve the inhomogeneous least squares
    A[:, :3] X = -A[:, 3] through its 3x3 normal equations with a
    closed-form inverse — pure vectorized arithmetic, identical accepted
    sets in practice (degenerate pairs produce huge/garbage X that the same
    gates reject).
    """
    P1 = jnp.concatenate([R1, t1[..., None]], axis=-1)  # (..., 3, 4)
    P2 = jnp.concatenate([R2, t2[..., None]], axis=-1)
    rows = []
    for P, ray in ((P1, ray1), (P2, ray2)):
        x = ray[..., 0] / ray[..., 2]
        y = ray[..., 1] / ray[..., 2]
        rows.append(x[..., None] * P[..., 2, :] - P[..., 0, :])
        rows.append(y[..., None] * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    A3 = A[..., :3]
    a4 = A[..., 3]
    M = jnp.einsum("...ki,...kj->...ij", A3, A3)          # (..., 3, 3)
    b = -jnp.einsum("...ki,...k->...i", A3, a4)           # (..., 3)
    # tiny relative ridge keeps the closed-form inverse finite on
    # zero-parallax pairs (their solutions fail the acceptance gates anyway)
    tr = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    eps = (1e-9 * tr + 1e-20)[..., None, None] * jnp.eye(3, dtype=M.dtype)
    return jnp.einsum("...ij,...j->...i", inv3(M + eps), b)


@jax.jit
def triangulate_midpoint(R1, t1, R2, t2, ray1, ray2):
    """Batched two-view ray-midpoint triangulation.

    Same interface as triangulate_dlt (R*, t* are T_cw; rays are unit-depth
    bearings). Solves the closed-form 2x2 least-squares midpoint of the two
    rays — in float32 this is ~200x more accurate than the DLT at stereo-rig
    parallax (the DLT normal matrix AᵀA squares the conditioning; the
    reference sidesteps this by computing its SVD DLT in double precision,
    src/GeometricTools.cc:46-66). Used for the fisheye rig, whose baseline
    is fixed and whose matches are parallax-gated. The DLT remains for
    two-view initialization and local-mapping triangulation, where its
    bounded algebraic behavior on near-zero-parallax pairs is what the
    downstream gates (model selection, median-depth scaling) are tuned to.
    """
    C1 = -jnp.einsum("...ji,...j->...i", R1, t1)
    C2 = -jnp.einsum("...ji,...j->...i", R2, t2)
    d1 = jnp.einsum("...ji,...j->...i", R1, ray1)
    d2 = jnp.einsum("...ji,...j->...i", R2, ray2)
    b = C2 - C1
    a11 = jnp.sum(d1 * d1, -1)
    a22 = jnp.sum(d2 * d2, -1)
    a12 = jnp.sum(d1 * d2, -1)
    e1 = jnp.sum(d1 * b, -1)
    e2 = jnp.sum(d2 * b, -1)
    den = a11 * a22 - a12 * a12
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    s = (e1 * a22 - a12 * e2) / den
    u = (e1 * a12 - a11 * e2) / den
    P1 = C1 + s[..., None] * d1
    P2 = C2 + u[..., None] * d2
    return 0.5 * (P1 + P2)


@jax.jit
def stereo_backproject(cam: Camera, bf, uv, ur, depth_from_disp=True):
    """Rectified-stereo depth: z = bf / (uL - uR); back-project to camera frame
    (reference: Frame::UnprojectStereo src/Frame.cc:1007)."""
    disp = uv[..., 0] - ur
    z = bf / jnp.where(jnp.abs(disp) < 1e-6, 1e-6, disp)
    ray = unproject(cam, uv)
    return ray * z[..., None], z


def triangulation_checks(
    cam: Camera,
    R1, t1, R2, t2,
    uv1, uv2, Xw,
    octave1, octave2,
    scale_factors,
    sigma2_factors,
    chi2_th: float = 5.991,
    min_parallax_cos: float = 0.9998,
):
    """Acceptance gates for new landmarks (reference semantics:
    src/LocalMapping.cc:613-691 — positive depth in both views, reprojection
    chi2 within per-octave sigma, parallax, scale-consistency ratio)."""
    Xc1 = jnp.einsum("...ij,...j->...i", R1, Xw) + t1
    Xc2 = jnp.einsum("...ij,...j->...i", R2, Xw) + t2
    z_ok = (Xc1[..., 2] > 0) & (Xc2[..., 2] > 0)
    e1 = project(cam, Xc1) - uv1
    e2 = project(cam, Xc2) - uv2
    s21 = sigma2_factors[jnp.clip(octave1, 0, sigma2_factors.shape[0] - 1)]
    s22 = sigma2_factors[jnp.clip(octave2, 0, sigma2_factors.shape[0] - 1)]
    reproj_ok = (jnp.sum(e1 * e1, -1) / s21 < chi2_th) & (
        jnp.sum(e2 * e2, -1) / s22 < chi2_th
    )
    # parallax between the two rays
    C1 = -jnp.einsum("...ji,...j->...i", R1, t1)
    C2 = -jnp.einsum("...ji,...j->...i", R2, t2)
    r1 = Xw - C1
    r2 = Xw - C2
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
    )
    parallax_ok = cos_par < min_parallax_cos
    # scale consistency: dist ratio between views vs octave ratio
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    sf1 = scale_factors[jnp.clip(octave1, 0, scale_factors.shape[0] - 1)]
    sf2 = scale_factors[jnp.clip(octave2, 0, scale_factors.shape[0] - 1)]
    ratio_oct = sf1 / sf2
    rf = 1.5 * 1.2  # ratioFactor (reference: src/LocalMapping.cc:417)
    scale_ok = (ratio_dist * rf > ratio_oct) & (ratio_dist < ratio_oct * rf)
    return z_ok & reproj_ok & parallax_ok & scale_ok
