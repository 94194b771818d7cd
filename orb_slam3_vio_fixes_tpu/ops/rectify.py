"""Stereo rectification + radial-tangential undistortion.

Reference semantics: Settings::precomputeRectificationMaps
(src/Settings.cc:485-528) — cv::stereoRectify with CALIB_ZERO_DISPARITY and
alpha=-1 on (K1, dist1, K2, dist2, T_c1_c2), then initUndistortRectifyMap for
both eyes, rewrite fx/fy/cx/cy from P1 and bf = b * P1(0,0), and fold R_r1_u1
into T_bc for inertial rigs; System::TrackStereo then remaps every frame
(src/System.cc:253-261). Tracking::UndistortKeyPoints covers the mono/RGB-D
path (src/Frame.cc:747).

Re-design: the map computation is host-side numpy (once per run); the
per-frame remap is a jitted gather kernel that batches both eyes — one
device launch instead of two cv::remap calls.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Radial-tangential distortion model (OpenCV k1,k2,p1,p2[,k3])
# ---------------------------------------------------------------------------

def radtan_distort(xy: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """Apply distortion to normalized coords. xy: (..., 2); dist: (4,) or (5,)."""
    d = np.zeros(5)
    d[: len(dist)] = dist
    k1, k2, p1, p2, k3 = d
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def undistort_points(
    uv: np.ndarray,
    K: np.ndarray,
    dist: np.ndarray,
    R: Optional[np.ndarray] = None,
    P: Optional[np.ndarray] = None,
    n_iters: int = 10,
) -> np.ndarray:
    """cv::undistortPoints analogue (fixed-point iteration).

    Pixel coords -> undistorted, optionally rotated by R and reprojected by
    3x3 P. This is the keypoint-undistortion path the reference runs per
    frame for mono/RGB-D (src/Frame.cc:747).
    """
    uv = np.asarray(uv, np.float64)
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    x0, y0 = x.copy(), y.copy()
    for _ in range(n_iters):
        xd = radtan_distort(np.stack([x, y], -1), dist)
        # invert: distorted(x) = x*radial + tang  =>  x = (x0 - tang)/radial
        d = np.zeros(5)
        d[: len(dist)] = dist
        k1, k2, p1, p2, k3 = d
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        tx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        ty = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (x0 - tx) / radial
        y = (y0 - ty) / radial
    pts = np.stack([x, y, np.ones_like(x)], axis=-1)
    if R is not None:
        pts = pts @ np.asarray(R, np.float64).T
    pts = pts[..., :2] / pts[..., 2:3]
    if P is not None:
        P = np.asarray(P, np.float64)
        u = P[0, 0] * pts[..., 0] + P[0, 2]
        v = P[1, 1] * pts[..., 1] + P[1, 2]
        return np.stack([u, v], axis=-1)
    return pts


def _rodrigues(r: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    Kx = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)


def _log_so3(R: np.ndarray) -> np.ndarray:
    c = max(-1.0, min(1.0, (np.trace(R) - 1.0) / 2.0))
    th = np.arccos(c)
    if th < 1e-12:
        return np.zeros(3)
    w = (
        np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        / (2 * np.sin(th))
    )
    return w * th


class StereoRectification(NamedTuple):
    R1: np.ndarray   # rectifying rotation, cam1 (R_r1_u1)
    R2: np.ndarray   # rectifying rotation, cam2
    P1: np.ndarray   # (3, 4) new projection, cam1
    P2: np.ndarray   # (3, 4) new projection, cam2
    Q: np.ndarray    # (4, 4) disparity-to-depth
    map1: np.ndarray  # (H, W, 2) float32 source coords for cam1 remap
    map2: np.ndarray  # (H, W, 2) for cam2

    @property
    def fx(self) -> float:
        return float(self.P1[0, 0])

    @property
    def baseline(self) -> float:
        return float(abs(self.P2[0, 3]) / self.P2[0, 0])


def stereo_rectify(
    K1: np.ndarray,
    dist1: np.ndarray,
    K2: np.ndarray,
    dist2: np.ndarray,
    size: Tuple[int, int],
    T_c1_c2: np.ndarray,
) -> StereoRectification:
    """cv::stereoRectify(CALIB_ZERO_DISPARITY, alpha=-1) analogue.

    size: (width, height). T_c1_c2: 4x4 pose of cam2 in cam1 (the YAML's
    Stereo.T_c1_c2); internally converted to (R, T) with x2 = R x1 + T like
    the reference's Tlr_.inverse() (src/Settings.cc:493-497).
    """
    w, h = size
    T_c2_c1 = np.linalg.inv(np.asarray(T_c1_c2, np.float64))
    R = T_c2_c1[:3, :3]
    T = T_c2_c1[:3, 3]

    # split the relative rotation evenly between the eyes
    om = _log_so3(R)
    r_r = _rodrigues(-om / 2)
    t = r_r @ T

    # rotate so the baseline is horizontal
    idx = 0 if abs(t[0]) > abs(t[1]) else 1
    uu = np.zeros(3)
    uu[idx] = 1.0 if t[idx] > 0 else -1.0
    ww = np.cross(t, uu)
    nw = np.linalg.norm(ww)
    if nw > 1e-15:
        ww *= np.arccos(abs(t[idx]) / np.linalg.norm(t)) / nw
    wR = _rodrigues(ww)
    R1 = wR @ r_r.T
    R2 = wR @ r_r

    # new focal: fy shrunk by the worst-case barrel distortion (OpenCV rule)
    fc_new = np.inf
    for K, dist in ((K1, dist1), (K2, dist2)):
        dk1 = dist[0] if len(dist) else 0.0
        fc = K[1, 1]
        if dk1 < 0:
            fc *= 1 + dk1 * (w * w + h * h) / (4 * fc * fc)
        fc_new = min(fc_new, fc)

    # new principal point: average of the undistorted+rotated image corners
    cc = []
    for K, dist, Rk in ((K1, dist1, R1), (K2, dist2, R2)):
        corners = np.array(
            [[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]], np.float64)
        und = undistort_points(corners, K, dist, R=Rk)
        avg = und.mean(0)
        cc.append(
            np.array([(w - 1) / 2, (h - 1) / 2]) - avg * fc_new)
    cc = np.asarray(cc)
    # CALIB_ZERO_DISPARITY: both eyes share the same principal point
    cc_new = cc.mean(0)

    P1 = np.array(
        [[fc_new, 0, cc_new[0], 0],
         [0, fc_new, cc_new[1], 0],
         [0, 0, 1, 0]])
    P2 = P1.copy()
    tsign = np.sign(t[idx]) if t[idx] != 0 else 1.0
    P2[idx, 3] = tsign * np.linalg.norm(t) * fc_new

    baseline = abs(P2[idx, 3]) / fc_new
    Q = np.array(
        [[1, 0, 0, -cc_new[0]],
         [0, 1, 0, -cc_new[1]],
         [0, 0, 0, fc_new],
         [0, 0, -tsign / baseline, 0]])

    map1 = init_undistort_rectify_map(K1, dist1, R1, P1[:, :3], (w, h))
    map2 = init_undistort_rectify_map(K2, dist2, R2, P2[:, :3], (w, h))
    return StereoRectification(R1, R2, P1, P2, Q, map1, map2)


def init_undistort_rectify_map(
    K: np.ndarray,
    dist: np.ndarray,
    R: np.ndarray,
    P_new: np.ndarray,
    size: Tuple[int, int],
) -> np.ndarray:
    """cv::initUndistortRectifyMap analogue: (H, W, 2) float32 source pixels.

    For each rectified pixel: normalize by P_new, rotate back by R^T, apply
    the distortion model, project by K.
    """
    w, h = size
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    x = (u - P_new[0, 2]) / P_new[0, 0]
    y = (v - P_new[1, 2]) / P_new[1, 1]
    pts = np.stack([x, y, np.ones_like(x)], axis=-1)
    pts = pts @ R  # == (R^T @ p)^T rows
    xy = pts[..., :2] / pts[..., 2:3]
    xyd = radtan_distort(xy, np.asarray(dist, np.float64))
    su = K[0, 0] * xyd[..., 0] + K[0, 2]
    sv = K[1, 1] * xyd[..., 1] + K[1, 2]
    return np.stack([su, sv], axis=-1).astype(np.float32)


@jax.jit
def remap_nearest(img: jax.Array, srcmap: jax.Array) -> jax.Array:
    """Nearest-neighbor remap — for depth maps, where bilinear blending
    across depth discontinuities would invent phantom surfaces."""
    H, W = img.shape[-2:]
    xi = jnp.round(srcmap[..., 0]).astype(jnp.int32)
    yi = jnp.round(srcmap[..., 1]).astype(jnp.int32)
    inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    vals = img[..., jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
    return jnp.where(inside, vals, 0.0)


@jax.jit
def remap_bilinear(img: jax.Array, srcmap: jax.Array) -> jax.Array:
    """Bilinear remap (cv::remap analogue), jitted for per-frame use.

    img: (H, W) or (B, H, W); srcmap: (H', W', 2) source pixel coords (x, y).
    Out-of-image samples read 0 (cv BORDER_CONSTANT).
    """
    batched = img.ndim == 3
    im = img if batched else img[None]
    B, H, W = im.shape
    sx = srcmap[..., 0]
    sy = srcmap[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        vals = im[:, yc, xc]
        return jnp.where(inside[None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out if batched else out[0]
