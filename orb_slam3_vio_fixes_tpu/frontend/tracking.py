"""Stereo/RGB-D tracking front end: per-frame pose estimation state machine.

TPU-native re-design of the reference's Tracking thread
(reference: src/Tracking.cc — Track() state machine :1794-2332,
StereoInitialization :2335, TrackWithMotionModel :2854 (SearchByProjection
th=7 + PoseOptimization), TrackLocalMap :2949 (local-point search th schedule
:3388-3413 + second optimization), NeedNewKeyFrame :3064-3214,
CreateNewKeyFrame :3216 with close-stereo landmark spawning).

Split of responsibilities:
  * jitted kernels (this module's module-level functions): frame building,
    projection matching, pose optimization, keyframe insertion with batched
    landmark allocation, local BA — all fixed-shape;
  * the `StereoTracker` host class: the state machine, motion model, keyframe
    decision counters — a few scalars per frame, exactly the part of the
    reference that is inherently sequential.

The map is a functional `MapState` snapshot; tracking never mutates shared
structures (no Map::mMutexMapUpdate equivalent needed).
"""

from __future__ import annotations

import functools
import time
from collections import deque
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import local_mapping as lm_mod
from orb_slam3_vio_fixes_tpu.frontend.frame import (
    FrameData, build_stereo_frame, build_stereo_frame_impl)
from orb_slam3_vio_fixes_tpu.ops import image as image_ops
from orb_slam3_vio_fixes_tpu.ops import matching, orb
from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, in_image, project, unproject


class TrackerConfig(NamedTuple):
    orb: orb.ORBConfig = orb.ORBConfig()
    map: ms.MapConfig = ms.MapConfig()
    width: int = 752
    height: int = 480
    max_local_lm: int = 2048       # local-map candidate budget per frame
    # (the covisibility window's landmarks; a 24-KF window tracks ~1-3k live
    # points — overflow simply drops the least-recently-scattered candidates)
    ba_window: int = 8             # adjustable keyframes in local BA
    ba_fixed: int = 4              # additional fixed anchor keyframes
    th_depth_factor: float = 35.0  # close-point depth = factor * baseline
    min_kf_inliers: int = 25       # lost threshold
    kf_inlier_ratio: float = 0.75  # c2: inliers < ratio * ref (stereo 0.75)
    max_frames_between_kf: int = 20
    new_lm_budget: int = 512       # max landmarks created per keyframe
    kf_cull_every: int = 3         # run KeyFrameCulling every N keyframes
    kf_cull_max: int = 4           # max keyframes excised per culling round
    enable_kf_culling: bool = True
    enable_growth: bool = True     # capacity-tier doubling on overflow
    ba_anchors: int = 16           # fixed observer keyframes in local BA
    po_rounds: int = 2             # motion-only pose-opt chi2 rounds
    po_iters: int = 5              # LM iterations per round (reference runs
    # 4x10; with the motion-model / IMU seed and Huber weights the pose
    # converges in 3-5 iterations and the extra gating rounds only re-flag
    # the same outliers — 2x5 is measurably identical on the e2e/GT gates
    # and ~60% cheaper than 4x6. Pose opt runs TWICE per frame (in
    # pose_opt_from_obs and inside track_local_map), so this is one of the
    # two dominant per-frame sequential costs.
    rot_check_motion: bool = False  # rotation-consistency histogram on the
    # motion-model matches (reference: mbCheckOrientation in frame-frame
    # SearchByProjection, src/ORBmatcher.cc:180-210). The mechanism is in
    # match_previous; it is OFF by default because the keypoint orientations
    # on the synthetic sprite imagery are unstable across views (measured
    # median 22 deg between true stereo pairs), so the histogram cuts true
    # matches — on real imagery with stable IC angles, enable it.
    ba_factor_budget: int = 8192   # compacted factor rows in local BA (the
                                   # (W, N) table is ~2/3 padding; see
                                   # local_ba's compaction — live obs in a
                                   # 24-KF window run ~4-6k; truncation is
                                   # surfaced via ba_truncated)
    ba_lm_budget: int = 3072       # landmark slots in the local-BA
    # sub-problem (distinct landmarks observable by the window; overflow
    # factors are dropped and counted in ba_truncated)
    ba_cg_iters: int = 12          # CG iterations per local-BA LM step. The
    # local window has <= (ba_window) x 6 = ~48 reduced-camera dims, so CG
    # converges far before the global solver's 40 (which stays at
    # ba_core.LMConfig's default for full-map GBA); 40 -> 16 cuts the
    # dominant keyframe-stage device time ~2.4x with no measurable ATE
    # change on the e2e gates
    ba_rounds: int = 2             # local-BA chi2-gated rounds
    ba_iters: int = 3              # LM iterations per round (stereo/RGBD:
                                   # depth-anchored maps converge in a few;
                                   # monocular trackers raise this to 6 —
                                   # structure comes from BA alone there)


def octave_inv_sigma2(cfg: orb.ORBConfig) -> jax.Array:
    sf = image_ops.scale_factors(cfg.n_levels, cfg.scale)
    return 1.0 / (sf * sf)


# ---------------------------------------------------------------------------
# jitted kernels
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_levels", "scale"))
def predict_scale(dist, maxdist, n_levels=8, scale=1.2):
    """Predicted pyramid octave from observation distance
    (reference: MapPoint::PredictScale src/MapPoint.cc:514)."""
    log_scale = jnp.log(scale)
    ratio = jnp.maximum(maxdist / jnp.maximum(dist, 1e-9), 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / log_scale).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_previous(
    state: ms.MapState,
    prev_obs: jax.Array,      # (N,) landmark ids from the previous frame
    prev_octave: jax.Array,   # (N,) octave at which each was seen
    prev_angle: jax.Array,    # (N,) keypoint orientation in the prev frame
    R_pred, t_pred,
    frame: FrameData,
    cam: Camera, bf,
    th: jax.Array,            # search radius multiplier (reference: 7/15)
    cfg: TrackerConfig,
):
    """Motion-model matching: project previous frame's landmarks with the
    predicted pose, window-search in the new frame
    (reference: TrackWithMotionModel src/Tracking.cc:2854-2947). A rotation-
    consistency histogram over (prev keypoint angle - new keypoint angle)
    strips aliased window matches, exactly like the reference's
    mbCheckOrientation pass (src/ORBmatcher.cc:180-210) — without it, a
    widened search radius on repeated texture floods pose optimization with
    wrong pairs and the pose estimate collapses."""
    L = state.lm_pos.shape[0]
    ids = jnp.clip(prev_obs, 0, L - 1)
    has = (prev_obs >= 0) & state.lm_valid[ids]
    X = state.lm_pos[ids]
    Xc = jnp.einsum("ij,nj->ni", R_pred, X) + t_pred
    uv = project(cam, Xc)
    z = Xc[:, 2]
    ur = uv[:, 0] - bf / jnp.maximum(z, 1e-6)
    visible = has & (z > 0) & in_image(uv, cfg.width, cfg.height)
    sf = image_ops.scale_factors(cfg.orb.n_levels, cfg.orb.scale)
    radius = th * sf[jnp.clip(prev_octave, 0, cfg.orb.n_levels - 1)]
    res = matching.search_by_projection(
        uv, visible, state.lm_desc[ids], prev_octave, radius,
        frame.uv, frame.valid, frame.desc, frame.octave,
        proj_ur=ur, feat_ur=frame.ur,
    )
    # scatter: cur_obs[feature] = landmark id
    N = frame.uv.shape[0]
    cur_obs = jnp.full(N, -1, jnp.int32)
    matched = res.idx >= 0
    if cfg.rot_check_motion:
        matched = matching.rotation_consistency(
            prev_angle, frame.angle, res.idx, matched)
    tgt = jnp.clip(res.idx, 0, N - 1)
    cur_obs = cur_obs.at[tgt].set(jnp.where(matched, prev_obs, cur_obs[tgt]))
    return cur_obs, jnp.sum(matched.astype(jnp.int32))


def track_step_impl(
    state: ms.MapState,
    prev_obs, prev_octave, prev_angle,
    R_prev, t_prev,
    dR_vel, dt_vel,
    frame: FrameData,
    window_kfs,
    cam: Camera, bf,
    th_narrow, th_wide, th_local,
    cfg: TrackerConfig,
    has_vel: bool = False,
):
    """The whole per-frame OK-path as ONE device program: constant-velocity
    pose prediction, motion-model matching (with the widened-radius retry as
    lax.cond instead of a host round trip), motion-only pose optimization,
    local-map tracking, the velocity-model update, and the keyframe-decision
    statistics.

    The host pulls a single 16-float vector per frame — on a tunneled TPU
    every separate device->host sync costs a full RTT, and the reference's
    Track() control flow would otherwise need 4-6 of them
    (src/Tracking.cc:1794-2332). The pose prediction and velocity update
    live in-graph for the same reason: as eager host-side jnp math they
    each cost a dispatch (~2 ms measured through the tunnel).

    Returns (R2, t2, cur_obs, packed, R_pred, t_pred, dR_new, dt_new)."""
    if has_vel:
        R_pred = dR_vel @ R_prev
        t_pred = dR_vel @ t_prev + dt_vel
    else:
        R_pred, t_pred = R_prev, t_prev
    cur_obs0, n_m0 = match_previous(
        state, prev_obs, prev_octave, prev_angle, R_pred, t_pred, frame,
        cam, bf, th_narrow, cfg)

    def wide(_):
        return match_previous(
            state, prev_obs, prev_octave, prev_angle, R_pred, t_pred, frame,
            cam, bf, th_wide, cfg)

    cur_obs, n_m = jax.lax.cond(
        n_m0 < 20, wide, lambda _: (cur_obs0, n_m0), None)
    R1, t1, cur_obs, n_inl = pose_opt_from_obs(
        state, R_pred, t_pred, frame, cur_obs, cam, bf, cfg)
    R2, t2, cur_obs, n_inl2 = track_local_map(
        state, R1, t1, frame, cur_obs, window_kfs, cam, bf, th_local, cfg)
    baseline = bf / cam.fx
    close = ((frame.depth > 0)
             & (frame.depth < cfg.th_depth_factor * baseline) & frame.valid)
    tracked = cur_obs >= 0
    packed = jnp.concatenate([
        R2.reshape(-1), t2,
        jnp.stack([
            n_m.astype(jnp.float32), n_inl2.astype(jnp.float32),
            jnp.sum(close & tracked).astype(jnp.float32),
            jnp.sum(close & ~tracked).astype(jnp.float32),
        ]),
    ])
    # velocity-model update (T_cur * inv(T_prev)); so3_normalize in-graph —
    # the motion model re-applies dR every frame, orthonormality drift
    # compounds (see _finalize_track history)
    dR_new = lie.so3_normalize(R2 @ R_prev.T)
    dt_new = t2 - dR_new @ t_prev
    return R2, t2, cur_obs, packed, R_pred, t_pred, dR_new, dt_new


track_step = functools.partial(jax.jit, static_argnames=("cfg", "has_vel"))(
    track_step_impl)


@functools.partial(jax.jit, static_argnames=("cfg", "has_vel"))
def build_and_track(
    imgs,                   # (2, H, W) stacked L/R upload (uint8/uint16/f32)
    ts,
    state: ms.MapState,
    prev_obs, prev_octave, prev_angle,
    R_prev, t_prev,
    dR_vel, dt_vel,
    window_kfs,
    cam: Camera, bf,
    th_narrow, th_wide, th_local,
    cfg: TrackerConfig,
    has_vel: bool = False,
):
    """Fused per-frame device program: stereo frame construction + the whole
    tracking step, ONE runtime call per frame (see kf_create_map on the
    ~2.6 ms fixed per-program cost that motivates fusing; the stereo pair
    also uploads as ONE stacked array for the same reason).

    Returns (frame, track_step outputs)."""
    frame = build_stereo_frame_impl(imgs[0], imgs[1], ts, cam, bf, cfg.orb)
    outs = track_step_impl(
        state, prev_obs, prev_octave, prev_angle, R_prev, t_prev,
        dR_vel, dt_vel, frame, window_kfs, cam, bf,
        th_narrow, th_wide, th_local, cfg, has_vel=has_vel)
    return frame, outs


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_reference_kf(
    state: ms.MapState,
    ref_kf,                 # scalar int32 — reference keyframe slot
    R_init, t_init,
    frame: FrameData,
    window_kfs,
    cam: Camera, bf,
    th_local,
    cfg: TrackerConfig,
):
    """Fallback tracking against the reference keyframe: WINDOWLESS mutual
    descriptor matching of the frame against the keyframe's landmark-bound
    features, then pose optimization from the last pose (reference:
    TrackReferenceKeyFrame src/Tracking.cc:2720-2779 — SearchByBoW has no
    pixel search radius, so it survives image motion the motion-model
    window cannot).

    Returns (R, t, cur_obs, packed) like track_step."""
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    k = jnp.clip(ref_kf, 0, K - 1)
    obs = state.kf_obs[k]
    lids = jnp.clip(obs, 0, L - 1)
    has = (obs >= 0) & state.lm_valid[lids] & state.kf_feat_valid[k]
    res = matching.match_descriptors(
        state.kf_desc[k], has, frame.desc, frame.valid,
        ratio=0.7, max_dist=matching.TH_LOW, mutual=True,
    )
    matched = res.idx >= 0
    ok = matching.rotation_consistency(
        state.kf_angle[k], frame.angle, res.idx, matched)
    tgt = jnp.where(ok, jnp.clip(res.idx, 0, N - 1), N)
    cur_obs = jnp.full(N + 1, -1, jnp.int32).at[tgt].set(
        jnp.where(ok, obs, -1))[:N]
    n_m = jnp.sum(ok.astype(jnp.int32))
    R1, t1, cur_obs, _ = pose_opt_from_obs(
        state, R_init, t_init, frame, cur_obs, cam, bf, cfg)
    R2, t2, cur_obs, n_inl2 = track_local_map(
        state, R1, t1, frame, cur_obs, window_kfs, cam, bf, th_local, cfg)
    baseline = bf / cam.fx
    close = ((frame.depth > 0)
             & (frame.depth < cfg.th_depth_factor * baseline) & frame.valid)
    tracked = cur_obs >= 0
    packed = jnp.concatenate([
        R2.reshape(-1), t2,
        jnp.stack([
            n_m.astype(jnp.float32), n_inl2.astype(jnp.float32),
            jnp.sum(close & tracked).astype(jnp.float32),
            jnp.sum(close & ~tracked).astype(jnp.float32),
        ]),
    ])
    return R2, t2, cur_obs, packed


@functools.partial(jax.jit, static_argnames=("cfg",))
def pose_opt_from_obs(
    state: ms.MapState, R, t, frame: FrameData, cur_obs, cam: Camera, bf,
    cfg: TrackerConfig,
):
    """Motion-only pose optimization over the frame's current landmark
    bindings; clears outlier bindings (reference: PoseOptimization + the
    outlier strip in Track())."""
    L = state.lm_pos.shape[0]
    ids = jnp.clip(cur_obs, 0, L - 1)
    act = (cur_obs >= 0) & state.lm_valid[ids] & frame.valid
    pts = state.lm_pos[ids]
    uvr = jnp.concatenate([frame.uv, frame.ur[:, None]], axis=-1)
    inv_s2 = octave_inv_sigma2(cfg.orb)[jnp.clip(frame.octave, 0, cfg.orb.n_levels - 1)]
    res = ba_core.pose_optimize(
        R, t, pts, uvr, inv_s2, act, cam, bf,
        ba_core.LMConfig(n_rounds=cfg.po_rounds, n_iters=cfg.po_iters))
    new_obs = jnp.where(res.inlier, cur_obs, -1)
    return res.R, res.t, new_obs, res.n_inliers


def local_map_search(
    state: ms.MapState,
    R, t,
    frame: FrameData,
    cur_obs,
    window_kfs,             # (W,) recent/covisible keyframe ids (-1 pad)
    cam: Camera, bf,
    th: jax.Array,
    cfg: TrackerConfig,
):
    """Project the local map (landmarks of the window keyframes) and widen
    the frame's bindings — the search half of TrackLocalMap (reference:
    SearchLocalPoints src/Tracking.cc:3343-3413 with frustum checks in
    Frame::isInFrustum). Returns the widened cur_obs; callers that
    re-optimize jointly (the VI tracker) use this directly."""
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    safe_w = jnp.clip(window_kfs, 0, K - 1)
    w_ok = (window_kfs >= 0) & state.kf_valid[safe_w]
    obs_rows = jnp.where(w_ok[:, None], state.kf_obs[safe_w], -1)  # (W, N)
    cand_mask = jnp.zeros(L, bool).at[jnp.clip(obs_rows.reshape(-1), 0, L - 1)].max(
        obs_rows.reshape(-1) >= 0
    )
    cand_mask &= state.lm_valid
    # budgeted candidate list — cumsum compaction, not top_k (top_k over the
    # 32k landmark axis measured 1.8 ms; the compaction is one cumsum+scatter)
    cand_idx, cand_sel = ba_core.compact_indices(cand_mask, cfg.max_local_lm)
    cand_ok = cand_mask[cand_idx] & cand_sel

    X = state.lm_pos[cand_idx]
    Xc = jnp.einsum("ij,mj->mi", R, X) + t
    uv = project(cam, Xc)
    z = Xc[:, 2]
    ur = uv[:, 0] - bf / jnp.maximum(z, 1e-6)
    C = -R.T @ t
    d = X - C[None]
    dist = jnp.linalg.norm(d, axis=-1)
    view_cos = jnp.sum(d * state.lm_normal[cand_idx], axis=-1) / jnp.maximum(dist, 1e-9)
    vis = (
        cand_ok
        & (z > 0)
        & in_image(uv, cfg.width, cfg.height)
        & (dist >= 0.8 * state.lm_mindist[cand_idx])
        & (dist <= 1.2 * state.lm_maxdist[cand_idx])
        & (view_cos > 0.5)
    )
    octv = predict_scale(dist, state.lm_maxdist[cand_idx], cfg.orb.n_levels,
                         cfg.orb.scale)
    sf = image_ops.scale_factors(cfg.orb.n_levels, cfg.orb.scale)
    base_r = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = th * base_r * sf[octv]

    taken = cur_obs >= 0  # features already bound stay bound
    res = matching.search_by_projection(
        uv, vis, state.lm_desc[cand_idx], octv, radius,
        frame.uv, frame.valid, frame.desc, frame.octave,
        feat_taken=taken,
        proj_ur=ur, feat_ur=frame.ur,
        ratio=0.8,
    )
    matched = res.idx >= 0
    tgt = jnp.clip(res.idx, 0, frame.uv.shape[0] - 1)
    cur_obs = cur_obs.at[tgt].set(
        jnp.where(matched, cand_idx.astype(jnp.int32), cur_obs[tgt])
    )
    return cur_obs


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_local_map(
    state: ms.MapState,
    R, t,
    frame: FrameData,
    cur_obs,
    window_kfs,
    cam: Camera, bf,
    th: jax.Array,
    cfg: TrackerConfig,
):
    """SearchLocalPoints + the second pose optimization (reference:
    TrackLocalMap src/Tracking.cc:2949-3062)."""
    cur_obs = local_map_search(
        state, R, t, frame, cur_obs, window_kfs, cam, bf, th, cfg)
    R2, t2, cur_obs, n_inl = pose_opt_from_obs(
        state, R, t, frame, cur_obs, cam, bf, cfg)
    return R2, t2, cur_obs, n_inl


def create_keyframe_impl(
    state: ms.MapState,
    kf_id, n_lm,
    frame: FrameData,
    R, t, cur_obs,
    prev_kf_id,
    cam: Camera, bf,
    cfg: TrackerConfig,
    spawn_all: bool = False,
):
    """Insert a keyframe: bind tracked landmarks, spawn new ones from close
    stereo depths (reference: CreateNewKeyFrame src/Tracking.cc:3216-3341 —
    close points sorted by depth, created until >=100), update landmark stats.

    Returns (state, n_created).
    """
    N = frame.uv.shape[0]
    L = state.lm_pos.shape[0]
    baseline = bf / cam.fx
    th_depth = cfg.th_depth_factor * baseline

    cand = frame.valid & (cur_obs < 0) & (frame.depth > 0)
    # Reference rule (src/Tracking.cc:3216-3341): create for close points
    # (depth < thDepth); if fewer than 100, keep creating the closest anyway.
    depth_key = jnp.where(cand, frame.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    rank = jnp.zeros(N, jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    if spawn_all:
        # stereo initialization: every valid-depth keypoint becomes a
        # landmark (reference: StereoInitialization src/Tracking.cc:2335)
        is_new = cand
    else:
        is_new = cand & ((frame.depth < th_depth) | (rank < 100))
    is_new &= rank < cfg.new_lm_budget

    slot_off = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    slots = jnp.where(is_new, n_lm + slot_off, L - 1).astype(jnp.int32)

    # back-project: Xc = ray * z ; Xw = R^T (Xc - t)
    ray = unproject(cam, frame.uv)
    Xc = ray * frame.depth[:, None]
    Xw = jnp.einsum("ji,nj->ni", R, Xc - t[None])
    C = -R.T @ t
    d = Xw - C[None]
    dist = jnp.linalg.norm(d, axis=-1)
    normal = d / jnp.maximum(dist[:, None], 1e-9)
    sf = image_ops.scale_factors(cfg.orb.n_levels, cfg.orb.scale)
    lvl_sf = sf[jnp.clip(frame.octave, 0, cfg.orb.n_levels - 1)]
    maxdist = dist * lvl_sf
    mindist = maxdist / sf[-1]

    state = ms.add_landmarks(
        state, slots, Xw, frame.desc, normal, mindist, maxdist, kf_id, is_new
    )
    obs = jnp.where(is_new, slots, cur_obs)
    state = ms.insert_keyframe(
        state, kf_id, R, t, frame.ts,
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), prev_kf_id,
        frame.uv, frame.ur, frame.octave, frame.angle, frame.desc, frame.valid,
        obs, frame.depth,
    )
    # landmark stats are NOT refreshed here: the new landmarks' normal/scale
    # range were just computed inline above, and the keyframe-rate pipeline
    # refreshes old landmarks once per cycle at the end of fuse_duplicates
    # (three full-table refreshes per keyframe measured ~8 ms of scatters)
    return state, jnp.sum(is_new.astype(jnp.int32))


create_keyframe = functools.partial(
    jax.jit, static_argnames=("cfg", "spawn_all"), donate_argnums=(0,))(
    create_keyframe_impl)


@functools.partial(jax.jit, static_argnames=("cfg", "lcfg"),
                   donate_argnums=(0,))
def kf_create_map(
    state: ms.MapState,
    kf_id, n_lm,
    frame: FrameData,
    R, t, cur_obs,
    prev_kf_id,
    neighbor_ids,
    cam: Camera, bf,
    cfg: TrackerConfig,
    lcfg,
):
    """Fused keyframe-rate mapping program: keyframe insertion + close-stereo
    landmark spawning + epipolar triangulation + duplicate fusion as ONE
    device program (reference pipeline order src/LocalMapping.cc:83-250 run
    by the mapping thread). Fusing matters on a remote-device runtime: each
    state-carrying program call costs ~2.6 ms of fixed host/runtime overhead
    (26-leaf pytree in and out), so three calls -> one saves ~5 ms per
    keyframe before any XLA-level fusion wins.

    Returns (state, n_lm_after).
    """
    state, n_created = create_keyframe_impl(
        state, kf_id, n_lm, frame, R, t, cur_obs, prev_kf_id, cam, bf, cfg)
    n_after = n_lm + n_created
    state, n_tri = lm_mod.create_new_landmarks_impl(
        state, kf_id, neighbor_ids, n_after, cam, bf, lcfg)
    state = lm_mod.fuse_duplicates_impl(state, kf_id, neighbor_ids, cam, lcfg)
    return state, n_after + n_tri


def select_ba_window_impl(
    state: ms.MapState,
    cur,            # scalar int32 — the newest keyframe slot
    first,          # scalar int32 — the map's first live keyframe (gauge)
    cfg: TrackerConfig,
):
    """Covisibility-based local-BA window (reference: LocalBundleAdjustment
    optimizes the covisible neighborhood of the new keyframe and fixes its
    observers, src/Optimizer.cc:1116-1195 — NOT a recency window; after a
    revisit the covisible keyframes are the loop-side ones, precisely when
    BA matters most).

    Returns (adj (ba_window,), fixed (ba_anchors,)) keyframe ids, -1-padded.
    The fixed set is BOUNDED (the round-1 design fixed ALL older keyframes,
    which at the 256-KF tier allocated a 17 GB factor table — the inertial
    reference caps observers at 200 for the same reason,
    src/Optimizer.cc:2481)."""
    K = state.kf_obs.shape[0]
    cov = ms.covisibility(state).astype(jnp.float32)
    valid = state.kf_valid
    row = jnp.where(valid, cov[cur], -1.0)
    row = row.at[cur].set(-1.0).at[first].set(-1.0)
    # clamp window/anchor counts to the live tier capacity: small tiers
    # (growth test: 8 slots, ba_anchors=16) must not over-ask top_k
    top_s, top_i = jax.lax.top_k(row, min(cfg.ba_window - 1, K - 1))
    adj = jnp.concatenate([
        cur[None].astype(jnp.int32),
        jnp.where(top_s > 0, top_i, -1).astype(jnp.int32)])
    adj_mask = jnp.zeros(K, bool).at[jnp.clip(adj, 0, K - 1)].max(adj >= 0)
    fscore = cov @ adj_mask.astype(jnp.float32)
    fscore = jnp.where(valid & ~adj_mask, fscore, -1.0)
    fscore = fscore.at[first].set(
        jnp.where(adj_mask[first], -1.0, jnp.inf))  # gauge anchor
    fs, fi = jax.lax.top_k(fscore, min(cfg.ba_anchors, K))
    fixed = jnp.where(fs > 0, fi, -1).astype(jnp.int32)
    return adj, fixed


select_ba_window = functools.partial(jax.jit, static_argnames=("cfg",))(
    select_ba_window_impl)


def local_ba_impl(
    state: ms.MapState,
    adj_kfs: jax.Array,     # (W,) adjustable keyframe ids (-1 pad)
    fixed_kfs: jax.Array,   # (Wf,) fixed keyframe ids (-1 pad)
    cam: Camera, bf,
    cfg: TrackerConfig,
):
    """Local bundle adjustment over a keyframe window; landmarks observed by
    the window adjust, window poses adjust, anchor poses fixed; outlier
    observations are removed afterwards
    (reference: Optimizer::LocalBundleAdjustment src/Optimizer.cc:1116-1499
    — two-stage 5+10 iterations with outlier erase; we run the shared LM
    schedule from ba_core)."""
    window = jnp.concatenate([adj_kfs, fixed_kfs])
    W = window.shape[0]
    K = state.kf_obs.shape[0]
    safe_w = jnp.clip(window, 0, K - 1)
    w_ok = (window >= 0) & state.kf_valid[safe_w]
    fixed = jnp.concatenate(
        [jnp.zeros_like(adj_kfs, dtype=bool), jnp.ones_like(fixed_kfs, dtype=bool)]
    ) | ~w_ok

    inv_s2_oct = octave_inv_sigma2(cfg.orb)
    pose_idx, lm_idx, uvr, inv_s2, valid = ms.ba_factors_from_map(state, window, inv_s2_oct)
    # COMPACT the factor table before the LM loop: the (W, N) layout is
    # mostly padding (only ~1/3 of feature slots hold live observations),
    # and every LM iteration drags the full padded table through residual/
    # Jacobian/reduction ops. One stable argsort moves the valid rows to a
    # fixed budget; outlier flags are scattered back through the same index.
    F_full = pose_idx.shape[0]
    F_budget = min(F_full, cfg.ba_factor_budget)
    # valid observations beyond the budget are EXCLUDED from this solve —
    # surface the count so silent coverage loss is visible at production
    # scale (callers accumulate into Tracker.ba_truncated)
    n_trunc = jnp.maximum(
        jnp.sum(valid.astype(jnp.int32)) - jnp.int32(F_budget), 0)
    order, order_ok = ba_core.compact_indices(valid, F_budget)
    factors = ba_core.ReprojFactors(
        pose_idx[order], lm_idx[order], uvr[order], inv_s2[order],
        valid[order] & order_ok)
    # COMPACT the landmark axis too: every LM iteration otherwise runs
    # landmark-table-sized ops (Hll scatter/inverse/back-substitution) over
    # the full MAP CAPACITY — measured 296 ms/solve at a 32k-slot tier vs
    # 101 ms at 8k with the SAME ~1.2k live landmarks. The window can only
    # observe <= F_budget distinct landmarks, so gather them into a dense
    # sub-table once, solve, and scatter the solved positions back.
    L = state.lm_pos.shape[0]
    lm_budget = min(L, cfg.ba_lm_budget)
    used = jnp.zeros(L, bool).at[
        jnp.clip(factors.lm_idx, 0, L - 1)].max(factors.valid)
    sub_idx, sub_ok = ba_core.compact_indices(used, lm_budget)
    remap = jnp.full(L + 1, -1, jnp.int32).at[
        jnp.where(sub_ok, sub_idx, L)].set(
        jnp.arange(lm_budget, dtype=jnp.int32))[:L]
    lm_local = remap[jnp.clip(factors.lm_idx, 0, L - 1)]
    got_slot = lm_local >= 0
    n_trunc = n_trunc + jnp.sum((factors.valid & ~got_slot).astype(jnp.int32))
    factors = factors._replace(
        lm_idx=jnp.clip(lm_local, 0, lm_budget - 1),
        valid=factors.valid & got_slot)
    used_sub = used[sub_idx] & sub_ok
    # landmarks seen by a single keyframe have weakly-determined depth; keep
    # them anchored at their stereo-spawned position until a second view
    # constrains them (the reference's MapPointCulling plays the same role by
    # deleting under-observed points, src/LocalMapping.cc:346-385).
    # The count comes from THIS problem's factor table (window + anchors),
    # not a global pass: observations outside the window contribute no
    # factor here, so a landmark they alone multi-cover would be dragged by
    # a single residual if left free — and the global landmark_obs_count
    # costs a full (K, N) scatter (~4 ms) per solve.
    n_obs_local = jnp.zeros(lm_budget, jnp.int32).at[factors.lm_idx].add(
        factors.valid.astype(jnp.int32))
    problem = ba_core.BAProblem(
        R=state.kf_R[safe_w], t=state.kf_t[safe_w],
        pose_fixed=fixed,
        lm=state.lm_pos[sub_idx],
        lm_valid=state.lm_valid[sub_idx] & used_sub,
        lm_fixed=n_obs_local < 2,
        factors=factors, cam=cam, bf=bf,
    )
    # chi2-gated rounds (reference: 5+10 with the common abort — depth-
    # anchored maps converge in a few iterations; mono configs run more)
    out, inlier_c, chi2 = ba_core.bundle_adjust(
        problem, ba_core.LMConfig(n_rounds=cfg.ba_rounds,
                                  n_iters=cfg.ba_iters,
                                  cg_iters=cfg.ba_cg_iters)
    )
    # un-compact the inlier mask (pad slots of `order` must not scatter)
    inlier = jnp.ones(F_full + 1, bool).at[
        jnp.where(order_ok, order, F_full)].set(
        inlier_c | ~factors.valid)[:F_full]
    # write back adjusted poses (only adjustable, valid ones)
    upd = w_ok & ~fixed
    lm_upd = used_sub & state.lm_valid[sub_idx] & ~problem.lm_fixed
    state = state._replace(
        kf_R=state.kf_R.at[safe_w].set(jnp.where(upd[:, None, None], out.R, state.kf_R[safe_w])),
        kf_t=state.kf_t.at[safe_w].set(jnp.where(upd[:, None], out.t, state.kf_t[safe_w])),
        lm_pos=state.lm_pos.at[sub_idx].set(
            jnp.where(lm_upd[:, None], out.lm, state.lm_pos[sub_idx])),
        epoch=state.epoch + 1,
    )
    # remove outlier observations: factor (w, feat) invalid -> kf_obs = -1
    N = state.kf_obs.shape[1]
    drop = (valid & ~inlier).reshape(W, N)
    new_rows = jnp.where(drop, -1, state.kf_obs[safe_w])
    only_real = w_ok[:, None]
    state = state._replace(
        kf_obs=state.kf_obs.at[safe_w].set(
            jnp.where(only_real, new_rows, state.kf_obs[safe_w])
        )
    )
    return state, n_trunc


local_ba = functools.partial(jax.jit, static_argnames=("cfg",),
                             donate_argnums=(0,))(local_ba_impl)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def kf_ba_stage(
    state: ms.MapState,
    cur, first,
    cam: Camera, bf,
    cfg: TrackerConfig,
):
    """Fused covisibility-window selection + local BA — one device program
    per keyframe instead of two (see kf_create_map on why call count
    matters). Returns (state, n_truncated)."""
    adj, fixed = select_ba_window_impl(state, cur, first, cfg)
    return local_ba_impl(state, adj, fixed, cam, bf, cfg)


# ---------------------------------------------------------------------------
# host-side tracker
# ---------------------------------------------------------------------------


class TrackState:
    NOT_INITIALIZED = "NOT_INITIALIZED"
    OK = "OK"
    RECENTLY_LOST = "RECENTLY_LOST"
    LOST = "LOST"


class StereoTracker:
    """Host orchestrator for stereo(-only) SLAM (SURVEY.md §7 stage 5 slice).

    Per frame: build frame -> motion-model match -> pose opt -> local-map
    track -> keyframe decision -> (keyframe insert + local BA).
    """

    _EYE3 = jnp.eye(3)
    _ZERO3 = jnp.zeros(3)

    def __init__(self, cam: Camera, bf: float, cfg: TrackerConfig = TrackerConfig(),
                 loop_closer=None, relocalizer=None, atlas=None, rig=None):
        self.cam = cam
        self.bf = jnp.float32(bf)
        self.cfg = cfg
        # two-camera (fisheye) rig: (cam2, R_12, t_12) with T_c1_c2 mapping
        # camera-2 coords into camera-1 coords; None = rectified single-model
        # stereo (reference: the two GeometricCamera* + Tlr fisheye Frame
        # ctor, src/Frame.cc:1034)
        self.rig = rig
        self.loop_closer = loop_closer  # optional frontend.loop_closing.LoopCloser
        self.relocalizer = relocalizer  # optional frontend.relocalization.Relocalizer
        self.atlas = atlas              # optional slam_map.atlas.Atlas
        self.lost_frames = 0
        self.max_lost_frames = 20       # reference: time_recently_lost (~1 s)
        self.match_radius = (7.0, 14.0)  # motion-model search th (widened)
        self.th_local_base = 1.0        # local-map search radius multiplier
        self.frames_since_reloc = 1000  # recent-reloc widening window
        self.map_id = 0                  # active-map ordinal (Atlas)
        self.localization_only = False   # reference: ActivateLocalizationMode
        self.state = ms.empty(cfg.map)
        self.track_state = TrackState.NOT_INITIALIZED
        # valid BA factors dropped by the ba_factor_budget compaction —
        # accumulated lazily on device; pull with int(self.ba_truncated)
        self.ba_truncated = jnp.int32(0)
        self.n_kf = 0   # slot allocation cursor (high-water mark per map)
        # culled/excised keyframe slots available for reuse — without this
        # the cursor is monotonic and long sequences double capacity tiers
        # even when culling bounds the live count (reference frees objects
        # on SetBadFlag, src/KeyFrame.cc:573-679)
        self._free_kf_slots = []
        self._kf_created_reused = 0   # keyframes that landed in a reused slot
        self.n_lm = 0
        self.kf_order = []  # temporal order of LIVE keyframe slots
        self.R = jnp.eye(3)
        self.t = jnp.zeros(3)
        self.vel = None  # (dR, dt) of T_cw_cur @ T_wc_prev
        self.prev_obs = None
        self.prev_octave = None
        self.prev_angle = None
        self.frames_since_kf = 0
        self.ref_inliers = 1
        self.last_n_inliers = 0
        self._frame_stats = None  # packed per-frame decision scalars
        # Loop-consistent trajectory log (reference: Tracking stores each
        # frame pose RELATIVE to its reference keyframe, src/Tracking.cc:
        # 2300-2319, and System::SaveTrajectoryEuRoC recovers the absolute
        # trajectory through the loop/GBA-corrected keyframe poses at save
        # time, src/System.cc:608-662). Entries are mutable lists
        # [ts, ref_kf_slot, R_cr, t_cr]; ref_kf_slot == -1 means the pose is
        # stored absolute (pre-init / after the owning map was stashed).
        self.traj = []
        self.ref_kf = -1                 # current reference keyframe slot
        self._ref_pose = (np.eye(3), np.zeros(3))  # T_rw of ref at track time
        # REGISTER_TIMES parity (reference: include/Settings.h:24 +
        # src/Tracking.cc:263-352): assign a runtime.actors.StageTimes to
        # enable per-stage attribution. Profiling BLOCKS at stage boundaries
        # (async dispatch otherwise hides device time in the next sync), so
        # leave it None for throughput runs.
        self.times = None
        # software pipelining (see process_frame): defer each frame's
        # device->host sync until the next frame is dispatched. Decisions run
        # in the same order as sync mode; only the per-call return value lags
        # one frame. flush() finalizes the in-flight frame.
        self.pipelined = False
        self._pending = None
        self._last_pose = (np.eye(3), np.zeros(3))
        # asynchronous keyframe-rate work (see _insert_keyframe): stages run
        # as bounded jobs, one per frame gap, instead of inline — the
        # reference's LocalMapping/LoopClosing threads expressed for a
        # single in-order device queue
        self.async_kf = False
        self._kf_jobs = deque()
        self._kf_nlm_dev = jnp.int32(0)
        # monotonic keyframe-creation counter: slot ids recycle through the
        # free list, so periodic stages (landmark/keyframe culling) must NOT
        # gate on kf_id parity (advisor round-4 finding)
        self._kf_seq = 0
        # Async loop-correction bookkeeping: when a deferred
        # _kf_stage_finalize job rebases the tracker onto a corrected map,
        # the world moves under every in-flight pose (the pipelined frame's
        # R2/t2, the R/t an _insert_keyframe caller holds). _corr_delta is
        # the composed world-to-world SE3 delta D = T_rw_old^-1 @ T_rw_new
        # (apply as T_cw_new = T_cw_old @ D); _corr_epoch counts corrections
        # so callers detect one that fired inside a drain. Cleared at each
        # new track dispatch — by then self.R/self.t/self.state are
        # mutually consistent again.
        self._corr_delta = None
        self._corr_epoch = 0

    def _mark(self, name: str, t0: float, out) -> float:
        """Profiling stage boundary: block + record when self.times is set.

        Sync is a 1-element device_get, not block_until_ready: on the
        tunneled TPU backend block_until_ready returns before the device is
        actually done (verified: it can 'measure' impossible TFLOP/s), so a
        tiny D2H read is the only honest barrier."""
        if self.times is None:
            return 0.0
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0:1])
        t1 = time.perf_counter()
        self.times.add(name, t1 - t0)
        return t1

    # -- keyframe ids are dense [0, n_kf) --

    def _ba_window(self, cur: int):
        """Device-side covisibility window selection for local BA."""
        return select_ba_window(
            self.state, jnp.int32(cur), jnp.int32(self.kf_order[0]), self.cfg)

    def _local_search_th(self) -> float:
        """Local-map search-radius multiplier schedule (reference:
        Tracking::SearchLocalPoints src/Tracking.cc:3388-3413 — wider when
        the pose prior is weak: RGBD, shortly after relocalization,
        RECENTLY_LOST; the inertial tracker overrides with the IMU staging.
        The reference's absolute 1/3/5/15 values assume its 2.5/4.0 px base
        radii; ours are wider, so the schedule uses 1/1.5/2/3 factors)."""
        if self.track_state == TrackState.RECENTLY_LOST:
            return 3.0
        if self.frames_since_reloc < 2:
            return 2.0
        return self.th_local_base

    def _local_window(self):
        w = self.cfg.ba_window + self.cfg.ba_fixed
        recent = tuple(self.kf_order[-w:][::-1])
        # memoize: the window only changes at keyframe events, but this runs
        # every frame and each jnp.asarray is a host->device dispatch
        cached = getattr(self, "_window_cache", None)
        if cached is not None and cached[0] == (recent, w):
            return cached[1]
        ids = np.full(w, -1, np.int32)
        for i, k in enumerate(recent):
            ids[i] = k
        arr = jnp.asarray(ids)
        self._window_cache = ((recent, w), arr)
        return arr

    @staticmethod
    def _upload_image(img):
        """Host image -> device array. Host-resident float images are
        quantized to uint8 before upload (4x less H2D traffic — on a
        remote-TPU link the float32 upload of a VGA pair costs more than the
        whole extraction kernel; real camera data is uint8 anyway). Device
        arrays and depth maps pass through untouched."""
        if isinstance(img, jax.Array):
            return img
        a = np.asarray(img)
        if a.dtype == np.uint8:
            return jnp.asarray(a)
        if a.dtype in (np.float32, np.float64) and a.size:
            # quantize to uint8 (1-gray precision): 4x less H2D than float32
            # — on the tunneled TPU the 2x722 KB/frame upload sits on the
            # critical path, and 1-gray quantization is far below the
            # sensor-noise floor (real cameras deliver uint8 anyway; the
            # e2e GT gates measure no ATE change vs the old 8.8 fixed point)
            return jnp.asarray(np.clip(np.rint(a), 0, 255).astype(np.uint8))
        return jnp.asarray(a)

    def _build_stereo(self, img_l, img_r, ts: float):
        """Stereo frame construction: rectified row matching, or two-camera
        ray triangulation when a fisheye rig is present."""
        if isinstance(img_l, jax.Array) and img_l.ndim == 3:
            img_l, img_r = img_l[0], img_l[1]   # stacked pair upload
        if self.rig is not None:
            from orb_slam3_vio_fixes_tpu.frontend.frame import (
                build_fisheye_stereo_frame)

            cam2, R_12, t_12 = self.rig
            return build_fisheye_stereo_frame(
                self._upload_image(img_l), self._upload_image(img_r),
                jnp.float32(ts), self.cam, cam2, R_12, t_12, self.cfg.orb,
            )
        return build_stereo_frame(
            self._upload_image(img_l), self._upload_image(img_r),
            jnp.float32(ts), self.cam, self.bf, self.cfg.orb,
        )

    def _upload_pair(self, img_l, img_r):
        """Stack + upload a stereo pair as ONE (2, H, W) device array — one
        runtime op instead of two (the per-op fixed cost on a remote-device
        runtime outweighs the stack). Host floats quantize to uint8 first
        (see _upload_image)."""
        if isinstance(img_l, jax.Array) and img_l.ndim == 3:
            return img_l      # already a stacked pair
        if isinstance(img_l, jax.Array) or isinstance(img_r, jax.Array):
            return jnp.stack([self._upload_image(img_l),
                              self._upload_image(img_r)])
        a, b = np.asarray(img_l), np.asarray(img_r)
        if a.dtype != np.uint8:
            a = np.clip(np.rint(a), 0, 255).astype(np.uint8)
            b = np.clip(np.rint(b), 0, 255).astype(np.uint8)
        return jnp.asarray(np.stack([a, b]))

    def process_stereo(self, img_l, img_r, ts: float):
        t0 = time.perf_counter() if self.times is not None else 0.0
        if (self.pipelined and self.rig is None and self._pending is not None
                and self.track_state == TrackState.OK):
            # fused build+track speculative dispatch: one device program and
            # one upload per frame (img_l may already be a stacked pair)
            imgs = self._upload_pair(img_l, img_r)
            frame, spec = self._dispatch_build_track(imgs, ts)
            self._mark("track.1_frame_build", t0, frame.desc)
            return self.process_frame(frame, ts, spec=spec)
        frame = self._build_stereo(img_l, img_r, ts)
        self._mark("track.1_frame_build", t0, frame.desc)
        return self.process_frame(frame, ts)

    def process_rgbd(self, img, depth, ts: float):
        """RGB-D entry (reference: System::TrackRGBD src/System.cc:328 +
        Frame RGBD ctor src/Frame.cc:200): depth sampled at keypoints becomes
        a synthetic right coordinate; the rest of the pipeline is shared."""
        from orb_slam3_vio_fixes_tpu.frontend.frame import build_rgbd_frame
        frame = build_rgbd_frame(
            self._upload_image(img), jnp.asarray(depth, jnp.float32),
            jnp.float32(ts), self.cam, self.bf, self.cfg.orb,
        )
        return self.process_frame(frame, ts)

    def flush(self, drain_jobs: bool = True):
        """Finalize the in-flight pipelined frame; with drain_jobs (the
        end-of-run default) also complete every pending keyframe-stage job.
        process_frame passes drain_jobs=False — mid-stream, jobs run one per
        frame gap on purpose."""
        if self._pending is not None:
            p, self._pending = self._pending, None
            self._finalize_track(*p)
        if drain_jobs:
            self._drain_kf_jobs()

    def _th_tuple(self, th_local: float):
        """Memoized device scalars for the three search radii."""
        key = (self.match_radius[0], self.match_radius[1], th_local)
        cached = getattr(self, "_th_cache", None)
        if cached is None or cached[0] != key:
            self._th_cache = (key, tuple(jnp.float32(v) for v in key))
        return key, self._th_cache[1]

    def _dispatch_track(self, frame: FrameData, state, prev_obs, prev_octave,
                        prev_angle, R, t, vel, window, th_local: float):
        """Dispatch the per-frame device program and return
        (inputs_key, outputs). inputs_key identifies the exact input OBJECTS
        so a speculative dispatch can later be validated against what the
        sequential decision order actually requires (see process_frame)."""
        has_vel = vel is not None
        dR, dt = vel if has_vel else (self._EYE3, self._ZERO3)
        th_key, (th_n, th_w, th_l) = self._th_tuple(th_local)
        outs = track_step(
            state, prev_obs, prev_octave, prev_angle, R, t, dR, dt, frame,
            window, self.cam, self.bf, th_n, th_w, th_l, self.cfg,
            has_vel=has_vel,
        )
        # start the device->host transfer of the decision scalars NOW: by
        # finalize time the bytes are usually already on the host, so the
        # pull costs ~0 instead of a tunnel RTT
        try:
            outs[3].copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        key = (id(state), id(prev_obs), id(prev_octave), id(prev_angle),
               id(R), id(t),
               (id(dR), id(dt)) if has_vel else None,
               id(window), th_key, self._corr_epoch)
        return key, outs

    def _spec_inputs(self):
        """The speculative-dispatch inputs for the NEXT frame, drawn from the
        pending (in-flight) frame's device-side outputs."""
        p = self._pending
        return (self.state, p[4], p[0].octave, p[0].angle, p[2], p[3],
                p[10], self._local_window(),
                self.th_local_base if self.frames_since_reloc >= 1 else 2.0)

    def _dispatch_build_track(self, imgs, ts: float):
        """Fused build+track speculative dispatch (see build_and_track).
        Returns (frame, (inputs_key, outputs))."""
        (state, prev_obs, prev_octave, prev_angle, R, t, vel, window,
         th_local) = self._spec_inputs()
        dR, dt = vel if vel is not None else (self._EYE3, self._ZERO3)
        th_key, (th_n, th_w, th_l) = self._th_tuple(th_local)
        frame, outs = build_and_track(
            imgs, np.float32(ts), state, prev_obs, prev_octave, prev_angle,
            R, t, dR, dt, window, self.cam, self.bf, th_n, th_w, th_l,
            self.cfg, has_vel=vel is not None)
        try:
            outs[3].copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        key = (id(state), id(prev_obs), id(prev_octave), id(prev_angle),
               id(R), id(t),
               (id(dR), id(dt)) if vel is not None else None,
               id(window), th_key, self._corr_epoch)
        return frame, (key, outs)

    def process_frame(self, frame: FrameData, ts: float, spec=None):
        cfg = self.cfg
        # SPECULATIVE DISPATCH (pipelined steady state): this frame's device
        # program is dispatched BEFORE the previous frame's sync+decisions,
        # from the previous dispatch's device-side outputs (pose, bindings,
        # velocity candidate) — so the device never idles while the host
        # blocks on the previous frame's result. After finalize, the
        # speculation is validated by INPUT OBJECT IDENTITY against what the
        # sequential decision order mandates; any deviation (reference-KF
        # fallback, lost transition, keyframe insertion, loop correction,
        # search-radius change) re-dispatches with the true inputs, so the
        # result stream is bit-identical to sync mode. The reference hides
        # the same latency with its LocalMapping thread (src/System.cc:194);
        # on an in-order device queue, keeping the queue non-empty is the
        # equivalent.
        if (spec is None and self.pipelined and self._pending is not None
                and self.track_state == TrackState.OK):
            spec = self._dispatch_track(frame, *self._spec_inputs())
        # finalize the previous pipelined frame: its decisions (fallback,
        # lost transition, keyframe insert) land before this frame's result
        # is accepted — same order as sync mode
        self.flush(drain_jobs=False)
        # any still-unconsumed correction delta is obsolete from here on:
        # the paths below read self.R/self.t/self.state, which are mutually
        # consistent (corrections rebase them at fire time)
        self._corr_delta = None
        if self.track_state == TrackState.NOT_INITIALIZED:
            ok = self._initialize(frame)
            self._record(ts)
            return np.asarray(self.R), np.asarray(self.t), self.track_state

        if (self.track_state in (TrackState.RECENTLY_LOST, TrackState.LOST)
                and (self.relocalizer is not None or self.atlas is not None)):
            # relocalization (reference: Track()'s RECENTLY_LOST branch,
            # src/Tracking.cc:1988-2011 -> Relocalization :3609). Without a
            # relocalizer and atlas the tracker falls through to the
            # motion-model attempt below (pure-visual small-gap recovery).
            hit = (self.relocalizer.relocalize(
                self.state, frame, self.cam, self.bf, cfg)
                if self.relocalizer is not None else None)
            if hit is not None:
                R, t, cur_obs, n_inl = hit
                self.track_state = TrackState.OK
                self.lost_frames = 0
                self.frames_since_reloc = 0   # widened search for 2 frames
                self.vel = None
                self.last_n_inliers = n_inl
                self._set_frame(frame, R, t, cur_obs)
                self._record(ts)
                return np.asarray(self.R), np.asarray(self.t), self.track_state
            self.lost_frames += 1
            if self.lost_frames > self.max_lost_frames:
                self.track_state = TrackState.LOST
                if self.atlas is not None:
                    # spawn a fresh map in the Atlas (reference:
                    # CreateMapInAtlas src/Tracking.cc:2662-2700; small maps
                    # are dropped like ResetActiveMap :2019-2024)
                    self._spawn_new_map()
            self._record(ts)
            return np.asarray(self.R), np.asarray(self.t), self.track_state

        t0 = time.perf_counter() if self.times is not None else 0.0
        self.frames_since_reloc += 1
        window = self._local_window()
        # validate the speculative dispatch: reuse its outputs ONLY when the
        # inputs the sequential decision order mandates are the exact same
        # objects it consumed (fallback / keyframe insertion / correction /
        # radius changes all swap at least one of them)
        actual_key = (id(self.state), id(self.prev_obs),
                      id(self.prev_octave), id(self.prev_angle),
                      id(self.R), id(self.t),
                      (id(self.vel[0]), id(self.vel[1]))
                      if self.vel is not None else None,
                      id(window),
                      (self.match_radius[0], self.match_radius[1],
                       self._local_search_th()),
                      self._corr_epoch)
        if spec is not None and spec[0] == actual_key:
            outs = spec[1]
        else:
            _, outs = self._dispatch_track(
                frame, self.state, self.prev_obs, self.prev_octave,
                self.prev_angle, self.R, self.t, self.vel, window,
                self._local_search_th())
        (R2, t2, cur_obs, packed, R_pred, t_pred, dR_new, dt_new) = outs
        vel_cand = (dR_new, dt_new)
        self._mark("track.2_track_step", t0, packed)
        if self.pipelined:
            # Software pipelining: defer the device->host sync (and every
            # decision that depends on it) until the NEXT frame has been
            # dispatched — the device computes this frame while the host
            # decodes/uploads/builds the next one, hiding the link RTT (the
            # reference hides the same latency by running mapping in another
            # thread, src/System.cc:194-237; on an async device the tracker
            # itself can be the overlapped stage).
            self._pending = (frame, ts, R2, t2, cur_obs, packed,
                             R_pred, t_pred, window, self._corr_epoch,
                             vel_cand)
            # one bounded keyframe-stage job rides this frame gap (async_kf)
            self._run_kf_job()
            return self._last_pose + (self.track_state,)
        out = self._finalize_track(frame, ts, R2, t2, cur_obs, packed,
                                   R_pred, t_pred, window, self._corr_epoch,
                                   vel_cand)
        self._run_kf_job()
        return out

    def _finalize_track(self, frame, ts, R2, t2, cur_obs, packed,
                        R_pred, t_pred, window, dispatch_epoch=None,
                        vel_cand=None):
        """Sync the tracking result and run every host decision for the
        frame: fallback matching, lost handling, velocity/bookkeeping,
        keyframe insertion, trajectory record."""
        cfg = self.cfg
        # ONE device->host pull per frame: pose + decision scalars
        t0 = time.perf_counter() if self.times is not None else 0.0
        packed = np.asarray(packed)
        if self.times is not None:
            self.times.add("track.3_sync_pull", time.perf_counter() - t0)
        # An async loop correction fired between this frame's dispatch and
        # now (a _kf_stage_finalize job ran in the pipelined frame gap): the
        # frame's pose was computed against the pre-correction map — carry
        # it into the corrected world through the published delta instead of
        # silently overwriting the rebase (advisor round-4 medium finding).
        corrected_in_flight = False
        if (dispatch_epoch is not None and self._corr_epoch != dispatch_epoch
                and self._corr_delta is not None):
            Rd, td = self._corr_delta
            self._corr_delta = None
            Rdj = jnp.asarray(Rd, jnp.float32)
            tdj = jnp.asarray(td, jnp.float32)
            t2 = R2 @ tdj + t2
            R2 = R2 @ Rdj
            t_pred = R_pred @ tdj + t_pred
            R_pred = R_pred @ Rdj
            Rp = packed[:9].reshape(3, 3)
            packed = packed.copy()
            packed[9:12] = Rp @ td + packed[9:12]
            packed[:9] = (Rp @ Rd).reshape(-1)
            corrected_in_flight = True
        self._frame_stats = packed[12:].astype(np.int64)
        n_inl2_i = int(self._frame_stats[1])
        self.last_n_inliers = n_inl2_i

        fell_back = False
        if n_inl2_i < cfg.min_kf_inliers and self.ref_kf >= 0:
            # motion-model tracking failed — fall back to windowless
            # reference-keyframe matching (reference: Track() falls back to
            # TrackReferenceKeyFrame, src/Tracking.cc:1953-1955)
            fell_back = True
            R2, t2, cur_obs, packed = track_reference_kf(
                self.state, jnp.int32(self.ref_kf), R_pred, t_pred, frame,
                window, self.cam, self.bf,
                jnp.float32(self._local_search_th()), cfg,
            )
            packed = np.asarray(packed)
            self._frame_stats = packed[12:].astype(np.int64)
            n_inl2_i = int(self._frame_stats[1])
            self.last_n_inliers = n_inl2_i

        if n_inl2_i < cfg.min_kf_inliers:
            self.track_state = TrackState.RECENTLY_LOST
            # keep predicted pose; do not update velocity
            self._set_frame(frame, R_pred, t_pred, cur_obs)
            self._record(ts)
            self._last_pose = (np.asarray(self.R), np.asarray(self.t))
            return self._last_pose + (self.track_state,)

        self.track_state = TrackState.OK
        self.lost_frames = 0
        # velocity update: precomputed inside track_step (saves two host
        # dispatches); the reference-KF fallback produced a different pose,
        # so recompute eagerly on that (rare) path. After an in-flight loop
        # correction the model restarts (reference drops mVelocity on map
        # change, src/Tracking.cc:1890-1896)
        if corrected_in_flight:
            self.vel = None
        elif fell_back or vel_cand is None:
            dR = lie.so3_normalize(R2 @ self.R.T)
            dt = t2 - dR @ self.t
            self.vel = (dR, dt)
        else:
            self.vel = vel_cand
        self._set_frame(frame, R2, t2, cur_obs)
        self.frames_since_kf += 1

        ep_insert = self._corr_epoch
        if not self.localization_only and self._need_keyframe(
                frame, cur_obs, n_inl2_i):
            self._insert_keyframe(frame, R2, t2, cur_obs)
        if self._corr_epoch != ep_insert:
            # a correction fired inside the insert's job drain — self.R/
            # self.t were rebased there; record those, not the stale packed
            R_np = np.asarray(self.R, np.float64)
            t_np = np.asarray(self.t, np.float64)
            self.vel = None
        else:
            # record from the already-fetched packed vector (no extra sync)
            R_np = packed[:9].reshape(3, 3).astype(np.float64)
            t_np = packed[9:12].astype(np.float64)
        self._record_np(ts, R_np, t_np)
        self._last_pose = (R_np, t_np)
        return R_np, t_np, self.track_state

    # -- internals --

    def _record(self, ts):
        self._record_np(ts, np.asarray(self.R, np.float64),
                        np.asarray(self.t, np.float64))

    def _record_np(self, ts, R_cw: np.ndarray, t_cw: np.ndarray):
        """Log one frame pose relative to the current reference keyframe
        (T_cr = T_cw * T_wr); absolute when no keyframe exists yet."""
        if self.ref_kf >= 0:
            R_rw, t_rw = self._ref_pose
            R_cr = R_cw @ R_rw.T
            t_cr = t_cw - R_cr @ t_rw
            self.traj.append([float(ts), self.ref_kf, R_cr, t_cr])
        else:
            self.traj.append([float(ts), -1, np.array(R_cw), np.array(t_cw)])

    @property
    def trajectory(self):
        """Per-frame (ts, R_cw, t_cw) recovered through the CURRENT keyframe
        poses — loop closures / GBA retroactively correct the whole exported
        trajectory (reference: System::SaveTrajectoryEuRoC
        src/System.cc:608-662)."""
        self.flush()   # in-flight pipelined frame must be recorded too
        if not self.traj:
            return []
        kf_R = np.asarray(self.state.kf_R, np.float64)
        kf_t = np.asarray(self.state.kf_t, np.float64)
        out = []
        for ts, ref, Rr, tr in self.traj:
            if ref < 0:
                out.append((ts, Rr, tr))
            else:
                out.append((ts, Rr @ kf_R[ref], Rr @ kf_t[ref] + tr))
        return out

    def _freeze_trajectory(self):
        """Convert every live (keyframe-relative) entry to an absolute pose —
        called before the active map (and its keyframe slots) goes away
        (stash / reset). The reference keeps per-map frame lists instead;
        freezing preserves the corrected-so-far trajectory the same way."""
        self.flush()   # the in-flight frame references slots of THIS map
        # invalidate the reference-KF cache unconditionally: callers (reset,
        # stash, load) reuse keyframe slots afterwards, and a stale ref_kf
        # would bind future frames to an unrelated new-map keyframe
        self.ref_kf = -1
        if not any(e[1] >= 0 for e in self.traj):
            return
        kf_R = np.asarray(self.state.kf_R, np.float64)
        kf_t = np.asarray(self.state.kf_t, np.float64)
        for e in self.traj:
            ts, ref, Rr, tr = e
            if ref >= 0:
                e[1] = -1
                e[2] = Rr @ kf_R[ref]
                e[3] = Rr @ kf_t[ref] + tr

    def _refresh_ref_pose(self, kf_id: int, pose_np=None):
        """Cache T_rw of the reference keyframe for relative recording.
        Called whenever keyframe poses may have been rewritten (insert, BA,
        loop correction, merge, IMU init)."""
        self.ref_kf = int(kf_id)
        if pose_np is not None:
            self._ref_pose = pose_np
        else:
            self._ref_pose = (
                np.asarray(self.state.kf_R[kf_id], np.float64),
                np.asarray(self.state.kf_t[kf_id], np.float64),
            )

    def _set_frame(self, frame, R, t, cur_obs):
        self.R, self.t = R, t
        self.prev_obs = cur_obs
        self.prev_octave = frame.octave
        self.prev_angle = frame.angle

    def _initialize(self, frame):
        """Stereo initialization (reference: src/Tracking.cc:2335-2446):
        first frame with enough stereo points becomes KF0 at the origin.

        The reference's gate is a FEATURE count (N > 500 of 1200, i.e. 42%),
        not a stereo-match count — it then spawns every positive-depth point.
        A strict stereo-point gate (>=100, the round-3 behavior) delayed
        initialization by seconds on feature-sparse scenes, exporting every
        pre-init frame at identity (the V101/MH03 GT-gate ATE misses)."""
        n_feat = int(jnp.sum(frame.valid))
        n_stereo = int(jnp.sum((frame.depth > 0) & frame.valid))
        if n_feat < int(0.4 * frame.valid.shape[0]) or n_stereo < 50:
            return False
        R0 = jnp.eye(3)
        t0 = jnp.zeros(3)
        cur_obs = jnp.full(frame.uv.shape[0], -1, jnp.int32)
        self.state, n_created = create_keyframe(
            self.state, jnp.int32(0), jnp.int32(0), frame, R0, t0, cur_obs,
            jnp.int32(-1), self.cam, self.bf, self.cfg, spawn_all=True,
        )
        self.n_kf = 1
        self.kf_order = [0]
        self.n_lm = int(n_created)
        # bind the frame to the newly created landmarks
        self.prev_obs = np.asarray(self.state.kf_obs[0])
        self.prev_obs = jnp.asarray(self.prev_obs)
        self.prev_octave = frame.octave
        self.prev_angle = frame.angle
        self.R, self.t = R0, t0
        self.track_state = TrackState.OK
        self.frames_since_kf = 0
        self.ref_inliers = self.n_lm
        self._refresh_ref_pose(0, (np.eye(3), np.zeros(3)))
        # register KF0 in the place-recognition database: _insert_keyframe
        # does this for every later keyframe, but the init keyframe is
        # created here — without it the revisit of the map ORIGIN (the
        # classic loop seam) has no database entry to retrieve
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(self.state, 0)
        return True

    def _need_keyframe(self, frame, cur_obs, n_inliers):
        """Reference NeedNewKeyFrame conditions (SURVEY.md A.9), simplified to
        the stereo case: c1a (max frames), c2 (inlier ratio), c1c (close-point
        health)."""
        cfg = self.cfg
        if self.track_state != TrackState.OK:
            return False
        c1a = self.frames_since_kf >= cfg.max_frames_between_kf
        c2 = n_inliers < cfg.kf_inlier_ratio * self.ref_inliers and n_inliers > 15
        # c1c: close points tracked vs untracked — from the per-frame packed
        # stats when available (one device pull per frame); recomputed with a
        # sync only on paths that bypass track_step
        if getattr(self, "_frame_stats", None) is not None:
            n_close_tracked = int(self._frame_stats[2])
            n_close_untracked = int(self._frame_stats[3])
        else:
            baseline = float(self.bf / self.cam.fx)
            close = np.asarray(
                (frame.depth > 0)
                & (frame.depth < cfg.th_depth_factor * baseline) & frame.valid)
            tracked = np.asarray(cur_obs >= 0)
            n_close_tracked = int((close & tracked).sum())
            n_close_untracked = int((close & ~tracked).sum())
        c1c = n_close_tracked < 100 and n_close_untracked > 70
        return bool(c1a or c2 or c1c)

    def _lm_cfg(self):
        cfg = self.cfg
        # 3 triangulation/fuse neighbors: each neighbor pass is a full
        # (N, N) Hamming + epipolar + DLT program; the 4th neighbor measured
        # <2% extra landmarks on the e2e gates for +25% keyframe-stage time
        return lm_mod.LocalMapConfig(
            n_neighbors=3, new_lm_budget=cfg.new_lm_budget,
            n_levels=cfg.orb.n_levels, scale=cfg.orb.scale,
            width=cfg.width, height=cfg.height,
        )

    def _maybe_grow(self):
        """Capacity-tier doubling when keyframe or landmark slots run low
        (SURVEY §7 hard-part #1: dynamic growth on a static-shape machine =
        discrete recompile tiers; the jitted kernels recompile once per tier).
        """
        if not self.cfg.enable_growth:
            return
        mc = self.cfg.map
        new_mc = mc
        if self.n_kf >= mc.max_keyframes - 2:
            new_mc = new_mc._replace(max_keyframes=2 * mc.max_keyframes)
        if self.n_lm >= mc.max_landmarks - 3 * self.cfg.new_lm_budget:
            new_mc = new_mc._replace(max_landmarks=2 * mc.max_landmarks)
        if new_mc is mc:
            return
        self.state = ms.grow_map(self.state, mc, new_mc)
        self.cfg = self.cfg._replace(map=new_mc)
        if self.loop_closer is not None:
            self.loop_closer.grow(new_mc.max_keyframes)
        if self.atlas is not None:
            self.atlas.map_cfg = new_mc

    def _cull_keyframes(self):
        """Wire KeyFrameCulling into the mapping stage (reference:
        LocalMapping::KeyFrameCulling src/LocalMapping.cc:902-1054 +
        KeyFrame::SetBadFlag excision src/KeyFrame.cc:573-679). Protected:
        the map's first keyframe (gauge / init KF can't die), the local BA
        window, and the current reference keyframe. Frames of the trajectory
        log that referenced a culled keyframe are re-based onto its nearest
        live predecessor (the reference stores mTcp for the same purpose)."""
        cfg = self.cfg
        protect = np.full(cfg.ba_window + cfg.ba_fixed + 2, -1, np.int32)
        prot_list = self.kf_order[-(cfg.ba_window + cfg.ba_fixed):] + [
            self.kf_order[0], self.ref_kf]
        for i, k in enumerate(prot_list):
            protect[i] = k
        mask = np.asarray(lm_mod.redundant_keyframes(
            self.state, jnp.asarray(protect), self._lm_cfg()))
        cand = [k for k in self.kf_order if mask[k]]
        if not cand:
            return
        # Redundancy was evaluated ONCE for the whole batch; removing one
        # member of a mutually-redundant group can make the others load-
        # bearing (the reference culls one KF at a time and re-reads observer
        # counts, src/LocalMapping.cc:902-1054). Guard: never cull two
        # temporally-adjacent keyframes in one batch, and never cull two that
        # are covisible above the graph edge threshold (15 shared points,
        # src/KeyFrame.cc:421) — their redundancy evidence overlaps.
        posn = {k: i for i, k in enumerate(self.kf_order)}
        cov_rows = np.asarray(ms.covisibility(self.state)[
            jnp.asarray(np.asarray(cand, np.int32))])
        cull = []
        for j, k in enumerate(cand):
            if len(cull) >= cfg.kf_cull_max:
                break
            if any(abs(posn[k] - posn[c]) <= 1 for c in cull):
                continue
            if any(cov_rows[j][c] >= 15 for c in cull):
                continue
            cull.append(k)
        cull = self._filter_culls(cull)
        if not cull:
            return
        # nearest live predecessor of each culled slot (for trajectory rebase)
        pos = {k: i for i, k in enumerate(self.kf_order)}
        parents = []
        for k in cull:
            i = pos[k] - 1
            order = self.kf_order
            while i >= 0 and order[i] in cull:
                i -= 1
            parents.append(order[i] if i >= 0 else -1)
        ids = jnp.asarray(np.asarray(cull + parents, np.int32))
        poses = np.asarray(jnp.concatenate([
            self.state.kf_R[ids].reshape(-1), self.state.kf_t[ids].reshape(-1)
        ]))
        n2 = len(cull) * 2
        Rs = poses[: n2 * 9].reshape(n2, 3, 3).astype(np.float64)
        ts_ = poses[n2 * 9:].reshape(n2, 3).astype(np.float64)
        rebase = {}
        for i, (k, p) in enumerate(zip(cull, parents)):
            if p < 0:
                continue
            R_k, t_k = Rs[i], ts_[i]
            R_p, t_p = Rs[len(cull) + i], ts_[len(cull) + i]
            R_kp = R_k @ R_p.T
            t_kp = t_k - R_kp @ t_p
            rebase[k] = (p, R_kp, t_kp)
        for e in self.traj:
            if e[1] in rebase:
                p, R_kp, t_kp = rebase[e[1]]
                e[2], e[3] = e[2] @ R_kp, e[2] @ t_kp + e[3]
                e[1] = p
        pad = np.full(cfg.kf_cull_max, -1, np.int32)
        pad[: len(cull)] = cull
        self._on_culled(cull)
        self.state = ms.excise_keyframes(self.state, jnp.asarray(pad))
        culled_set = set(cull)
        self.kf_order = [k for k in self.kf_order if k not in culled_set]
        # excised slots go back to the allocator (insert_keyframe overwrites
        # every per-slot field, so reuse is safe)
        self._free_kf_slots.extend(sorted(culled_set))

    def _can_cull(self) -> bool:
        """Subclass gate: inertial trackers defer culling until IMU init."""
        return True

    def _loop_enabled(self) -> bool:
        """Subclass gate: inertial trackers skip place recognition until the
        map is gravity-aligned and metric (reference: skip until inertial
        BA, src/LoopClosing.cc:341-346)."""
        return True

    def _post_loop_gba(self, kf_id: int):
        """Hook after a loop correction: the visual GBA already ran inside
        LoopCloser; the inertial tracker overrides this with the full-map
        visual-inertial BA (reference: FullInertialBA as the GBA,
        src/LoopClosing.cc:2284-2286)."""

    def _filter_culls(self, cull):
        """Subclass veto hook: drop keyframes that must not be culled (e.g.
        inertial windows that would overflow when merged)."""
        return cull

    def _on_culled(self, cull):
        """Subclass bookkeeping hook, called BEFORE excision (the inertial
        tracker merges IMU preintegration windows across the splice here,
        reference: src/LocalMapping.cc:1020-1041)."""

    def _insert_keyframe(self, frame, R, t, cur_obs):
        """Keyframe insertion. Sync mode runs every local-mapping stage
        inline (reference pipeline order, src/LocalMapping.cc:83-250:
        triangulate -> fuse -> local BA -> cull -> loop). With
        `self.async_kf` set, only keyframe CREATION is inline; the
        keyframe-rate stages are split into bounded-cost jobs executed one
        per subsequent frame gap — the TPU-appropriate form of the
        reference's mapping/loop THREADS (src/System.cc:194-237): a single
        in-order device queue cannot run two programs at once, so
        "overlapping" means interleaving bounded mapping slices between
        tracking dispatches, which caps the per-frame latency spike
        (p95) at one slice instead of the whole pipeline."""
        prof = self.times is not None
        t0 = time.perf_counter() if prof else 0.0
        # any stages still pending for the PREVIOUS keyframe must land
        # before this one is created (keeps every host counter exact; the
        # reference's InterruptBA analogue below drops superseded BA instead)
        ep0 = self._corr_epoch
        self._drain_kf_jobs()
        if self._corr_epoch != ep0 and self._corr_delta is not None:
            # a loop correction fired inside the drain: the caller-held pose
            # this keyframe is about to be created from predates it — carry
            # it into the corrected world (self.R/self.t were already
            # rebased by the job itself)
            Rd, td = self._corr_delta
            self._corr_delta = None
            Rdj = jnp.asarray(Rd, jnp.float32)
            tdj = jnp.asarray(td, jnp.float32)
            t = R @ tdj + t
            R = R @ Rdj
            self.vel = None
        self._maybe_grow()
        kf_id = self._peek_kf_slot()
        if self._free_kf_slots and kf_id == self._free_kf_slots[0]:
            self._free_kf_slots.pop(0)
            self._kf_created_reused += 1
        prev_kf = self.kf_order[-1] if self.kf_order else -1
        # triangulation neighbors: the most recent live keyframes (computed
        # before this one joins the order)
        lcfg = self._lm_cfg()
        neighbors = np.full(lcfg.n_neighbors, -1, np.int32)
        for i, kk in enumerate(self.kf_order[::-1][: lcfg.n_neighbors]):
            neighbors[i] = kk
        # ONE fused device program: keyframe insertion + stereo spawning +
        # epipolar triangulation + duplicate fusion; the landmark counter
        # flows as a DEVICE scalar (one host pull at stage_finalize)
        self.state, self._kf_nlm_dev = kf_create_map(
            self.state, jnp.int32(kf_id), jnp.int32(self.n_lm), frame, R, t,
            cur_obs, jnp.int32(prev_kf), jnp.asarray(neighbors),
            self.cam, self.bf, self.cfg, lcfg,
        )
        if prof:
            t0 = self._mark("kf.1_create_map", t0, self._kf_nlm_dev)
        if kf_id == self.n_kf:
            self.n_kf += 1          # fresh slot moved the high-water mark
        self.kf_order.append(kf_id)
        self.frames_since_kf = 0
        self._kf_seq += 1
        seq = self._kf_seq   # monotonic id for the periodic-stage gates
        if self.async_kf:
            self._refresh_ref_pose(kf_id, (np.asarray(R, np.float64),
                                           np.asarray(t, np.float64)))
            # ONE local-BA job with window selection and all chi2 rounds
            # inside: per-call fixed costs (runtime overhead, factor build,
            # compaction, Schur structure) dominate the extra iterations
            self._kf_jobs.append(functools.partial(self._kf_stage_ba, kf_id))
            self._kf_jobs.append(
                functools.partial(self._kf_stage_cull, kf_id, seq))
            self._kf_jobs.append(lambda: self._kf_stage_finalize(kf_id))
            return kf_id
        self._kf_stage_ba(kf_id, prof=prof)
        self._kf_stage_cull(kf_id, seq, prof=prof)
        self._kf_stage_finalize(kf_id, prof=prof)
        return kf_id

    def _peek_kf_slot(self) -> int:
        """Slot the NEXT _insert_keyframe call will use (free-list head or
        the high-water cursor). Subclasses that stamp per-keyframe side
        state (IMU windows) call this before inserting."""
        return self._free_kf_slots[0] if self._free_kf_slots else self.n_kf

    def _run_kf_job(self):
        """Execute ONE pending keyframe-stage job (called once per frame)."""
        if self._kf_jobs:
            self._kf_jobs.popleft()()

    def _drain_kf_jobs(self):
        while self._kf_jobs:
            self._kf_jobs.popleft()()

    def _kf_stage_ba(self, kf_id, prof=False):
        """Covisibility-window local BA with all chi2 rounds, as one fused
        device program (reference: LocalBundleAdjustment run by the mapping
        thread, src/Optimizer.cc:1116-1499)."""
        t0 = time.perf_counter() if prof else 0.0
        self.state, n_tr = kf_ba_stage(
            self.state, jnp.int32(kf_id), jnp.int32(self.kf_order[0]),
            self.cam, self.bf, self.cfg)
        self.ba_truncated = self.ba_truncated + n_tr
        if prof:
            self._mark("kf.5_local_ba", t0, self.state.lm_pos)

    def _kf_stage_cull(self, kf_id, seq=None, prof=False):
        t0 = time.perf_counter() if prof else 0.0
        lcfg = self._lm_cfg()
        if seq is None:
            seq = self._kf_seq
        # landmark culling every 2nd keyframe CREATION (gated on the
        # monotonic _kf_seq, not the recyclable slot id): the redundancy
        # criteria only move when new observations land, and the pass costs
        # a full landmark-block program (reference culls per mapping
        # iteration but on a per-point recent list, src/LocalMapping.cc:346)
        if seq % 2 == 0:
            g = lcfg.cull_grace_kfs
            recent = np.full(g, -1, np.int32)
            for i, k in enumerate(self.kf_order[-g:]):
                recent[i] = k
            self.state = lm_mod.cull_landmarks(
                self.state, jnp.int32(self.n_kf), lcfg,
                recent_slots=jnp.asarray(recent))
        if prof:
            t0 = self._mark("kf.6_cull_lm", t0, self.state.lm_valid)
        if (self.cfg.enable_kf_culling and self._can_cull()
                and seq % self.cfg.kf_cull_every == 0
                and len(self.kf_order) > self.cfg.ba_window + 2):
            self._cull_keyframes()
        if prof:
            self._mark("kf.7_cull_kf", t0, self.state.kf_valid)

    def _kf_stage_finalize(self, kf_id, prof=False):
        # loop closing (reference: LoopClosing::InsertKeyFrame queue,
        # src/LocalMapping.cc:250 — synchronous call here, same kernels)
        if self.loop_closer is not None and self._loop_enabled():
            t0 = time.perf_counter() if prof else 0.0
            mg = self.loop_closer.cfg.min_gap_kfs
            self.state, loop_res = self.loop_closer.on_keyframe(
                self.state, kf_id, self.n_kf,
                recent_slots=self.kf_order[-mg:])
            if prof:
                self._mark("kf.8_loop", t0, self.state.kf_R)
            if loop_res is not None and loop_res.corrected:
                # SearchAndFuse across the loop seam: project the loop-side
                # landmarks into the corrected current keyframe and merge
                # duplicates (reference: src/LoopClosing.cc:1140,2115), then
                # a welding local BA over the seam neighborhood
                lcfg2 = self._lm_cfg()
                nb = np.full(lcfg2.n_neighbors, -1, np.int32)
                cand = loop_res.cand_id
                pos = {k: i for i, k in enumerate(self.kf_order)}
                ci = pos.get(cand, 0)
                seam = self.kf_order[max(0, ci - lcfg2.n_neighbors // 2):
                                     ci + lcfg2.n_neighbors -
                                     lcfg2.n_neighbors // 2]
                for i, k in enumerate(seam[: lcfg2.n_neighbors]):
                    nb[i] = k
                self.state = lm_mod.fuse_duplicates(
                    self.state, jnp.int32(kf_id), jnp.asarray(nb), self.cam,
                    lcfg2)
                adj2, fixed2 = self._ba_window(kf_id)
                self.state, n_tr = local_ba(self.state, adj2, fixed2,
                                            self.cam, self.bf, self.cfg)
                self.ba_truncated = self.ba_truncated + n_tr
                # re-base the tracker onto the corrected map and drop the
                # (now invalid) velocity model, like the reference after
                # CorrectLoop. In async mode the tracker has moved past this
                # keyframe, so re-base through the reference keyframe's
                # corrected pose (T_cw = T_cr * T_rw_corrected — the
                # reference's map-update re-base, src/Tracking.cc:1890-1896)
                self._post_loop_gba(kf_id)
                if self.ref_kf >= 0:
                    # world-to-world delta of this correction, published for
                    # any pose still in flight (pipelined frame, insert
                    # caller): D = T_rw_old^-1 @ T_rw_new
                    R_rw, t_rw = self._ref_pose
                    R_new = np.asarray(self.state.kf_R[self.ref_kf],
                                       np.float64)
                    t_new = np.asarray(self.state.kf_t[self.ref_kf],
                                       np.float64)
                    Rd = R_rw.T @ R_new
                    td = R_rw.T @ (t_new - t_rw)
                    if self._corr_delta is None:
                        self._corr_delta = (Rd, td)
                    else:
                        # compose onto an earlier unconsumed delta; the live
                        # pose below still gets only THIS correction's Rd/td
                        # (it was already rebased when the earlier one fired)
                        Rp, tp = self._corr_delta
                        self._corr_delta = (Rp @ Rd, Rp @ td + tp)
                    self._corr_epoch += 1
                if self.async_kf and self.ref_kf >= 0:
                    # re-base the live tracker pose through the same delta
                    # (T_cw_new = T_cw_old @ D)
                    R_np = np.asarray(self.R, np.float64)
                    t_np = np.asarray(self.t, np.float64)
                    self.R = jnp.asarray(R_np @ Rd, jnp.float32)
                    self.t = jnp.asarray(R_np @ td + t_np, jnp.float32)
                    self._refresh_ref_pose(self.ref_kf, (R_new, t_new))
                else:
                    self.R = self.state.kf_R[kf_id]
                    self.t = self.state.kf_t[kf_id]
                self.vel = None
        # ONE pull for the keyframe's bookkeeping scalars + reference pose
        t0 = time.perf_counter() if prof else 0.0
        counts = np.asarray(jnp.concatenate([
            jnp.stack([
                self._kf_nlm_dev.astype(jnp.float32),
                jnp.sum((self.state.kf_obs[kf_id] >= 0)).astype(jnp.float32)]),
            self.state.kf_R[kf_id].reshape(-1),
            self.state.kf_t[kf_id],
        ]))
        if prof:
            self.times.add("kf.9_pull", time.perf_counter() - t0)
        self.n_lm = int(counts[0])
        self.ref_inliers = max(int(counts[1]), 1)
        if not self.async_kf or self.ref_kf == kf_id:
            self._refresh_ref_pose(kf_id, (
                counts[2:11].reshape(3, 3).astype(np.float64),
                counts[11:14].astype(np.float64)))
        # map merge against stored Atlas maps (reference: LoopClosing's merge
        # branch, src/LoopClosing.cc:120-183)
        if self.atlas is not None and self.atlas.stored:
            res = self.atlas.try_merge(self.state, kf_id, self.n_kf, self.n_lm)
            if res is not None:
                kf_id = self._adopt_merge(res, kf_id)
                self.ref_inliers = max(
                    int(jnp.sum(self.state.kf_obs[kf_id] >= 0)), 1)
        # rebind the frame's observations to the (possibly fused/culled)
        # keyframe bindings — only while the keyframe is still the tracked
        # frame (sync mode); in async mode later frames have moved prev_obs on
        if not self.async_kf:
            self.prev_obs = self.state.kf_obs[kf_id]

    # -- Atlas transitions --

    def _spawn_new_map(self):
        """Stash the active map (if big enough) and restart tracking on a
        fresh one (reference: Tracking::CreateMapInAtlas)."""
        self._drain_kf_jobs()   # complete the map before stashing it
        hists = (np.asarray(self.loop_closer.db.hist)
                 if self.loop_closer is not None
                 else np.zeros((self.cfg.map.max_keyframes, 1), np.float32))
        # the stashed map's keyframe slots are about to be reused — convert
        # its frames' relative poses to absolutes first
        self._freeze_trajectory()
        self.atlas.stash_active(self.state, self.n_kf, self.n_lm, hists)
        self._kf_jobs.clear()    # pending stages reference dying slots
        self.state = ms.empty(self.cfg.map)
        self.n_kf = 0
        self.kf_order = []
        self._free_kf_slots = []
        self.n_lm = 0
        self.track_state = TrackState.NOT_INITIALIZED
        self.vel = None
        self.prev_obs = None
        self.prev_octave = None
        self.prev_angle = None
        self.frames_since_kf = 0
        self.ref_inliers = 1
        self.lost_frames = 0
        self.map_id += 1
        if self.loop_closer is not None:
            self.loop_closer.reset()

    def _adopt_merge(self, res, kf_id: int):
        """Continue tracking on the merged map (the stored map's world frame
        is kept, like the reference's MergeLocal). Returns the new id of the
        current keyframe."""
        merged, n_kf, n_lm, kf_off, old_hists = res
        n_cur = self.n_kf
        self.state = merged
        self.n_kf = n_kf
        self.n_lm = n_lm
        valid_np = np.asarray(merged.kf_valid[:n_kf])
        self.kf_order = [k for k in range(n_kf) if valid_np[k]]
        new_kf = kf_off + kf_id
        # the active map's keyframes moved to slots [kf_off, kf_off + n_cur);
        # live trajectory entries follow them (and thus pick up the merge
        # Sim3 correction on export)
        for e in self.traj:
            if e[1] >= 0:
                e[1] += kf_off
        self.R = self.state.kf_R[new_kf]
        self.t = self.state.kf_t[new_kf]
        self.vel = None
        self.map_id += 1
        if self.loop_closer is not None:
            self.loop_closer.rebuild_after_merge(old_hists, kf_off, n_cur)
        # welding: fuse duplicate landmarks across the seam, then a welding
        # BA over the merged neighborhood (reference: SearchAndFuse +
        # welding LocalBundleAdjustment, src/LoopClosing.cc:1588-1627)
        lcfg = self._lm_cfg()
        C_cur = np.asarray(-self.state.kf_R[new_kf].T @ self.state.kf_t[new_kf])
        kf_R = np.asarray(self.state.kf_R[:kf_off])
        kf_t = np.asarray(self.state.kf_t[:kf_off])
        centers = -np.einsum("kji,kj->ki", kf_R, kf_t)
        near = np.argsort(np.linalg.norm(centers - C_cur, axis=-1))
        neighbors = np.full(lcfg.n_neighbors, -1, np.int32)
        neighbors[: min(lcfg.n_neighbors, kf_off)] = near[: lcfg.n_neighbors]
        self.state = lm_mod.fuse_duplicates(
            self.state, jnp.int32(new_kf), jnp.asarray(neighbors), self.cam,
            lcfg)
        adj, fixed = self._ba_window(new_kf)
        self.state, n_tr = local_ba(self.state, adj, fixed, self.cam,
                                    self.bf, self.cfg)
        self.ba_truncated = self.ba_truncated + n_tr
        self._post_merge(new_kf, kf_off, n_cur, adj, fixed)
        self._refresh_ref_pose(new_kf)
        return new_kf

    def _post_merge(self, new_kf, kf_off, n_cur, weld_adj, weld_fixed):
        """After the welding BA: essential-graph optimization over the
        REMAINDER of the merged-in map — the welding window and the whole
        stored map stay fixed, the rest of the former active map follows the
        graph (reference: MergeLocal's essential-graph step over non-window
        keyframes, src/LoopClosing.cc:1717, overload src/Optimizer.cc:1785).
        """
        from orb_slam3_vio_fixes_tpu.frontend import loop_closing as lc_mod
        from orb_slam3_vio_fixes_tpu.optim import pose_graph as pg

        K = self.state.kf_R.shape[0]
        free = np.zeros(K, bool)
        free[kf_off:kf_off + n_cur] = True          # former active map
        wnd = np.concatenate([np.asarray(weld_adj), np.asarray(weld_fixed)])
        free[np.clip(wnd[wnd >= 0], 0, K - 1)] = False
        free &= np.asarray(self.state.kf_valid)
        if not free.any():
            return
        cov = np.asarray(ms.covisibility(self.state))
        edges = pg.essential_edges_from_map(
            np.asarray(self.state.kf_R), np.asarray(self.state.kf_t),
            np.asarray(self.state.kf_valid), np.asarray(self.state.kf_prev),
            cov, 2048, cov_threshold=100,
        )
        R, t, s, _ = pg.optimize_pose_graph(
            self.state.kf_R, self.state.kf_t, jnp.ones(K),
            jnp.asarray(~free), edges,
            pg.PoseGraphConfig(n_iters=10, fix_scale=True),
        )
        self.state = lc_mod.apply_correction(
            self.state, R, t, s, n_levels=self.cfg.orb.n_levels,
            scale=self.cfg.orb.scale)

    # -- output --

    def keyframe_trajectory(self):
        self.flush()
        kf_R = np.asarray(self.state.kf_R)
        kf_t = np.asarray(self.state.kf_t)
        kf_ts = np.asarray(self.state.kf_ts)
        return [(float(kf_ts[k]), kf_R[k], kf_t[k]) for k in self.kf_order]
