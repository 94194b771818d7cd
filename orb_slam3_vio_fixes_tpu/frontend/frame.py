"""Frame construction: feature extraction + stereo association for one input.

TPU-native analogue of the reference's Frame constructors
(reference: src/Frame.cc:101 stereo ctor — dual-thread ORB extraction,
ComputeStereoMatches :811-981, undistortion :747, grid assignment :385).

Re-design: one jitted pipeline — batched L/R extraction (leading batch axis
instead of std::threads), dense row-banded stereo matching (ops/matching),
no grid structure (the dense masks in the matchers replace it).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops import matching, orb
from orb_slam3_vio_fixes_tpu.ops import image as image_ops
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


class FrameData(NamedTuple):
    """Per-frame fixed-capacity feature arrays (N = orb config n_features)."""

    uv: jax.Array          # (N, 2) level-0 pixel coords (left cam)
    ur: jax.Array          # (N,) right-cam u (-1 mono / unmatched)
    depth: jax.Array       # (N,) stereo depth (-1 unknown)
    octave: jax.Array      # (N,) int32
    angle: jax.Array       # (N,) float32
    desc: jax.Array        # (N, 8) uint32
    valid: jax.Array       # (N,) bool
    ts: jax.Array          # scalar timestamp

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))



def _to_f32(img):
    """Device-side conversion of uploaded images to float32 gray.

    uint8 arrives as raw camera gray; uint16 is the host's fixed-point
    encoding (value * 256) used to halve H2D traffic vs float32 without the
    sub-pixel precision loss of uint8 (the SAD refinement needs intensity
    resolution finer than one gray level on clean imagery)."""
    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint16:
        x = x * (1.0 / 256.0)
    return x

SAD_W = 5       # SAD half-window (11x11 patches, like the reference)
SAD_SLIDE = 5   # slide range +-5 (reference: const int L = 5)


def sad_subpixel(img_l, img_r, uv_l, ur0, valid):
    """Sub-pixel disparity refinement by sliding-SAD + parabola fit
    (reference semantics: Frame::ComputeStereoMatches src/Frame.cc:890-960 —
    11x11 SAD slid +-5 around the descriptor match, parabola through the best
    three correlations, reject if the parabola peak leaves [-1, 1]).

    Done on the level-0 images (the reference works at the keypoint's octave;
    full-resolution is at least as accurate for levels > 0).
    Returns refined ur (invalid -> -1).
    """
    h, w = img_l.shape
    pad = SAD_W + SAD_SLIDE + 1
    pl = jnp.pad(img_l, pad, mode="edge")
    pr = jnp.pad(img_r, pad, mode="edge")
    ui = jnp.round(uv_l[:, 0]).astype(jnp.int32)
    vi = jnp.round(uv_l[:, 1]).astype(jnp.int32)
    uri = jnp.round(ur0).astype(jnp.int32)

    def gather(img, yc, xc, width):
        def one(y, x):
            return jax.lax.dynamic_slice(
                img, (y + pad - SAD_W, x + pad - SAD_W), (2 * SAD_W + 1, width)
            )
        return jax.vmap(one)(yc, xc)

    patch_l = gather(pl, vi, ui, 2 * SAD_W + 1)                      # (N, 11, 11)
    strip_r = gather(pr, vi, uri - SAD_SLIDE, 2 * (SAD_W + SAD_SLIDE) + 1)  # (N, 11, 21)
    # normalize by center intensity difference like the reference (it
    # subtracts the central pixel of each window)
    cl = patch_l[:, SAD_W, SAD_W][:, None, None]
    sads = []
    for off in range(2 * SAD_SLIDE + 1):
        win = strip_r[:, :, off : off + 2 * SAD_W + 1]
        cr = win[:, SAD_W, SAD_W][:, None, None]
        sads.append(jnp.sum(jnp.abs((patch_l - cl) - (win - cr)), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)  # (N, 11)
    best = jnp.argmin(sad, axis=1)
    interior = (best > 0) & (best < 2 * SAD_SLIDE)
    bi = jnp.clip(best, 1, 2 * SAD_SLIDE - 1)
    s0 = jnp.take_along_axis(sad, bi[:, None], 1)[:, 0]
    sm = jnp.take_along_axis(sad, (bi - 1)[:, None], 1)[:, 0]
    sp = jnp.take_along_axis(sad, (bi + 1)[:, None], 1)[:, 0]
    denom = sm + sp - 2.0 * s0
    delta = jnp.where(jnp.abs(denom) > 1e-6, (sm - sp) / (2.0 * denom), 0.0)
    ok = valid & interior & (jnp.abs(delta) <= 1.0)
    ur_ref = uri.astype(jnp.float32) + (bi.astype(jnp.float32) - SAD_SLIDE) + delta
    # SAD-median outlier sweep (reference sweeps on the SAD correlation
    # distance with 1.5*1.4*median, src/Frame.cc:962-980)
    sad_best = s0
    med = jnp.nanmedian(jnp.where(ok, sad_best, jnp.nan))
    med = jnp.nan_to_num(med, nan=jnp.float32(1e9))
    ok &= sad_best <= 2.1 * med
    # The SAD measures the displacement between the INTEGER-anchored left
    # patch (ui) and the right strip, i.e. the disparity at pixel ui. Apply
    # that displacement to the float keypoint x — returning ur_ref directly
    # would fold the keypoint's fractional x (octave-scaled coords are
    # fractional) into the disparity as a bias of up to +-0.5 px, which at
    # small disparities is tens of percent of depth.
    disp_int = ui.astype(jnp.float32) - ur_ref
    ur_out = uv_l[:, 0] - disp_int
    return jnp.where(ok, ur_out, -1.0)


def build_stereo_frame_impl(
    img_l: jax.Array,
    img_r: jax.Array,
    ts: jax.Array,
    cam: Camera,
    bf: jax.Array,
    cfg: orb.ORBConfig,
) -> FrameData:
    """Extract ORB on both eyes and associate left->right along rows.

    Disparity bounds follow the reference (Frame::ComputeStereoMatches:
    minD=0, maxD=mbf/minZ with minZ=b, i.e. maxD=fx); the descriptor match is
    then refined to sub-pixel by sliding SAD.
    """
    # images may arrive quantized (uint8 camera gray or uint16 fixed-point;
    # smaller H2D upload on a remote link); all math runs in float32 on device
    img_l = _to_f32(img_l)
    img_r = _to_f32(img_r)
    fl, fr = orb.extract_pair(img_l, img_r, cfg)
    sf = image_ops.scale_factors(cfg.n_levels, cfg.scale)
    baseline = bf / cam.fx
    max_disp = bf / baseline  # = fx
    ur, disp, dist = matching.stereo_row_match(
        fl.uv, fl.valid, fl.desc, fl.octave,
        fr.uv, fr.valid, fr.desc, fr.octave,
        sf, jnp.float32(0.0), max_disp,
    )
    ur = sad_subpixel(img_l, img_r, fl.uv, ur, (disp > 0) & fl.valid)
    disp = jnp.where(ur >= 0, fl.uv[:, 0] - ur, -1.0)
    disp = jnp.where((ur >= 0) & (disp < 0.01), 0.01, disp)
    depth = jnp.where(disp > 0, bf / jnp.maximum(disp, 1e-6), -1.0)
    return FrameData(
        uv=fl.uv, ur=jnp.where(disp > 0, ur, -1.0), depth=depth,
        octave=fl.octave, angle=fl.angle, desc=fl.desc, valid=fl.valid,
        ts=ts,
    )


build_stereo_frame = functools.partial(jax.jit, static_argnames=("cfg",))(
    build_stereo_frame_impl)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_fisheye_stereo_frame(
    img_l: jax.Array,
    img_r: jax.Array,
    ts: jax.Array,
    cam1: Camera,
    cam2: Camera,
    R_12: jax.Array,
    t_12: jax.Array,
    cfg: orb.ORBConfig,
) -> FrameData:
    """Two-camera (Kannala-Brandt8 fisheye) stereo frame.

    Reference semantics: the fisheye-stereo Frame ctor src/Frame.cc:1034-1124
    + ComputeStereoFishEyeMatches :1126-1166 (brute-force knn with Lowe 0.7
    ratio, then KannalaBrandt8::TriangulateMatches
    src/CameraModels/KannalaBrandt8.cpp:306-370: ray triangulation with
    parallax + positive depth + per-octave chi2 reprojection gates).

    TPU re-design: one dense Hamming matrix over all left x right descriptors
    (the lapping-area restriction becomes unnecessary — the ratio + geometric
    gates subsume it), batched DLT triangulation of all matches at once.
    `T_c1_c2 = (R_12, t_12)` maps camera-2 coords into camera-1 coords.
    The triangulated z in the left camera fills `depth`; `ur` stays -1, so
    downstream pose optimization uses mono reprojection residuals (matching
    the reference, where fisheye keypoints carry no rectified right-u) while
    landmark spawning gets metric depth.
    """
    img_l = _to_f32(img_l)
    img_r = _to_f32(img_r)
    from orb_slam3_vio_fixes_tpu.ops import triangulate as tri
    from orb_slam3_vio_fixes_tpu.utils.cameras import project, unproject

    fl, fr = orb.extract_pair(img_l, img_r, cfg)
    m = matching.match_descriptors(
        fl.desc, fl.valid, fr.desc, fr.valid,
        ratio=0.7, max_dist=matching.TH_HIGH, mutual=True,
    )
    has = m.idx >= 0
    ridx = jnp.clip(m.idx, 0, fr.uv.shape[0] - 1)
    uv2 = fr.uv[ridx]
    oct2 = fr.octave[ridx]
    ray1 = unproject(cam1, fl.uv)
    ray2 = unproject(cam2, uv2)
    R_21 = R_12.T
    t_21 = -R_12.T @ t_12
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), ray1.shape[:1] + (3, 3))
    zero = jnp.zeros_like(ray1)
    Xc1 = tri.triangulate_midpoint(
        eye, zero,
        jnp.broadcast_to(R_21, eye.shape), jnp.broadcast_to(t_21, zero.shape),
        ray1, ray2,
    )
    Xc2 = Xc1 @ R_21.T + t_21
    # parallax between rays (reference rejects cosParallax >= 0.9998)
    r1n = ray1 / jnp.linalg.norm(ray1, axis=-1, keepdims=True)
    r2w = ray2 @ R_12[:3, :3].T  # right ray expressed in cam1 frame
    r2n = r2w / jnp.linalg.norm(r2w, axis=-1, keepdims=True)
    cos_par = jnp.sum(r1n * r2n, axis=-1)
    sf = image_ops.scale_factors(cfg.n_levels, cfg.scale)
    sigma2 = sf * sf
    s21 = sigma2[jnp.clip(fl.octave, 0, cfg.n_levels - 1)]
    s22 = sigma2[jnp.clip(oct2, 0, cfg.n_levels - 1)]
    e1 = project(cam1, Xc1) - fl.uv
    e2 = project(cam2, Xc2) - uv2
    ok = (
        has & fl.valid
        & (Xc1[..., 2] > 0.01) & (Xc2[..., 2] > 0.01)
        & (cos_par < 0.9998)
        & (jnp.sum(e1 * e1, -1) / s21 < 5.991)
        & (jnp.sum(e2 * e2, -1) / s22 < 5.991)
    )
    depth = jnp.where(ok, Xc1[..., 2], -1.0)
    n = fl.uv.shape[0]
    return FrameData(
        uv=fl.uv, ur=jnp.full(n, -1.0, jnp.float32), depth=depth,
        octave=fl.octave, angle=fl.angle, desc=fl.desc, valid=fl.valid,
        ts=ts,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_mono_frame(
    img: jax.Array, ts: jax.Array, cfg: orb.ORBConfig
) -> FrameData:
    f = orb.extract(_to_f32(img), cfg)
    n = f.uv.shape[0]
    return FrameData(
        uv=f.uv,
        ur=jnp.full(n, -1.0, jnp.float32),
        depth=jnp.full(n, -1.0, jnp.float32),
        octave=f.octave, angle=f.angle, desc=f.desc, valid=f.valid,
        ts=ts,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_rgbd_frame(
    img: jax.Array, depth_img: jax.Array, ts: jax.Array, cam: Camera, bf: jax.Array,
    cfg: orb.ORBConfig,
) -> FrameData:
    """RGB-D: depth sampled at keypoint locations; synthetic right coordinate
    ur = u - bf/z (reference: Frame::ComputeStereoFromRGBD src/Frame.cc:984)."""
    f = orb.extract(_to_f32(img), cfg)
    xi = jnp.clip(f.uv[:, 0].astype(jnp.int32), 0, depth_img.shape[1] - 1)
    yi = jnp.clip(f.uv[:, 1].astype(jnp.int32), 0, depth_img.shape[0] - 1)
    z = depth_img[yi, xi]
    has_d = z > 0
    ur = jnp.where(has_d, f.uv[:, 0] - bf / jnp.maximum(z, 1e-6), -1.0)
    return FrameData(
        uv=f.uv, ur=ur, depth=jnp.where(has_d, z, -1.0),
        octave=f.octave, angle=f.angle, desc=f.desc, valid=f.valid,
        ts=ts,
    )
