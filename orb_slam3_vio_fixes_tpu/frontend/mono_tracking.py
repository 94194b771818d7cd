"""Monocular tracking front end: two-view initialization + mono tracking.

TPU-native re-design of the reference's monocular path
(reference: src/Tracking.cc — MonocularInitialization :2448-2524 with
SearchForInitialization (src/ORBmatcher.cc:648) and
TwoViewReconstruction::Reconstruct; CreateInitialMapMonocular :2526-2660 —
global BA over the two keyframes plus inverse-median-depth scale
normalization; the per-frame Track() loop is shared with the stereo path).

Composition: MonocularTracker extends the visual StereoTracker; frames carry
no depth (ur = depth = -1), so keyframe insertion spawns no stereo landmarks
and all map growth comes from multi-view triangulation in local mapping —
exactly the reference's monocular behavior.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import tracking as trk
from orb_slam3_vio_fixes_tpu.frontend.frame import FrameData, build_mono_frame
from orb_slam3_vio_fixes_tpu.ops import image as image_ops
from orb_slam3_vio_fixes_tpu.ops import matching, twoview
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


@jax.jit
def search_for_initialization(ref: FrameData, cur: FrameData,
                              window: jax.Array):
    """Windowed descriptor matching between the init reference frame and the
    current frame (reference: ORBmatcher::SearchForInitialization
    src/ORBmatcher.cc:648-905 — search window 100 px, NN ratio 0.9,
    rotation-consistency histogram; the reference restricts to level-0
    keypoints — we keep all octaves but gate matches to the same +-1 octave,
    which preserves BRIEF comparability while tripling the candidate pool).

    Returns (idx (N,) int32 ref-feature -> cur-feature, n_matches)."""
    radius = jnp.full(ref.uv.shape[0], window, jnp.float32)
    res = matching.search_by_projection(
        ref.uv, ref.valid, ref.desc, ref.octave, radius,
        cur.uv, cur.valid, cur.desc, cur.octave,
        max_dist=matching.TH_LOW, ratio=0.9, apply_ratio_same_octave=False,
    )
    ok = res.idx >= 0
    ok = matching.rotation_consistency(ref.angle, cur.angle, res.idx, ok)
    idx = jnp.where(ok, res.idx, -1)
    return idx, jnp.sum(ok.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def create_initial_mono_map(
    state: ms.MapState,
    ref: FrameData, cur: FrameData,
    idx: jax.Array,          # (N,) ref feature -> cur feature (-1 none)
    R21, t21,                # relative pose of cam2 (cur) wrt cam1 (ref)
    points: jax.Array,       # (N,3) triangulated in cam1 (= world) frame
    good: jax.Array,         # (N,) bool
    cam: Camera,
    cfg: trk.TrackerConfig,
):
    """Build the initial two-keyframe map (reference:
    CreateInitialMapMonocular src/Tracking.cc:2526-2660 — both frames become
    keyframes, triangulated matches become MapPoints, a 20-iteration global BA
    runs, then everything is scaled by the inverse median depth of KF1).

    Returns (state, n_landmarks, R1, t1) with R1/t1 the scaled current pose.
    """
    N = ref.uv.shape[0]
    L = state.lm_pos.shape[0]

    # inverse-median-depth normalization (reference: ComputeSceneMedianDepth)
    z = points[:, 2]
    med = jnp.nanmedian(jnp.where(good, z, jnp.nan))
    med = jnp.nan_to_num(med, nan=1.0)
    inv_med = 1.0 / jnp.maximum(med, 1e-6)
    Xw = points * inv_med
    t1 = t21 * inv_med

    is_new = good & (idx >= 0)
    slot_off = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    is_new &= slot_off < (L - 1)
    slots = jnp.where(is_new, slot_off, L - 1).astype(jnp.int32)

    d = Xw  # camera 0 at origin
    dist = jnp.linalg.norm(d, axis=-1)
    normal = d / jnp.maximum(dist[:, None], 1e-9)
    sf = image_ops.scale_factors(cfg.orb.n_levels, cfg.orb.scale)
    lvl_sf = sf[jnp.clip(ref.octave, 0, cfg.orb.n_levels - 1)]
    maxdist = dist * lvl_sf
    mindist = maxdist / sf[-1]
    state = ms.add_landmarks(
        state, slots, Xw, ref.desc, normal, mindist, maxdist,
        jnp.int32(0), is_new)

    obs0 = jnp.where(is_new, slots, -1)
    zero3 = jnp.zeros(3)
    state = ms.insert_keyframe(
        state, jnp.int32(0), jnp.eye(3), zero3, ref.ts, zero3, zero3, zero3,
        jnp.int32(-1), ref.uv, ref.ur, ref.octave, ref.angle, ref.desc,
        ref.valid, obs0, ref.depth,
    )
    # scatter the same landmarks onto the matched current-frame features
    obs1 = jnp.full(N, -1, jnp.int32)
    j = jnp.where(is_new, jnp.clip(idx, 0, N - 1), N - 1)
    # predicate the scatter: non-new rows write -1 into a throwaway position
    # only if no new row also targets it — route them to a dead row instead
    obs1_ext = jnp.concatenate([obs1, jnp.full(1, -1, jnp.int32)])
    jj = jnp.where(is_new, j, N)
    obs1 = obs1_ext.at[jj].set(jnp.where(is_new, slots, -1))[:N]
    state = ms.insert_keyframe(
        state, jnp.int32(1), R21, t1, cur.ts, zero3, zero3, zero3,
        jnp.int32(0), cur.uv, cur.ur, cur.octave, cur.angle, cur.desc,
        cur.valid, obs1, cur.depth,
    )
    state = ms.update_landmark_stats(state, cfg.orb.n_levels, cfg.orb.scale)
    n_lm = jnp.sum(is_new.astype(jnp.int32))
    return state, n_lm, obs1, R21, t1


class MonocularTracker(trk.StereoTracker):
    """Host orchestrator for monocular SLAM (MONOCULAR sensor mode).

    Differences from the stereo tracker: a two-frame initialization state
    machine replaces stereo bootstrap; bf = 0 (no stereo residuals); the
    keyframe decision uses the mono inlier-ratio threshold (0.9) and drops
    the close-point condition (reference: NeedNewKeyFrame
    src/Tracking.cc:3130-3153).
    """

    def __init__(self, cam: Camera, cfg: trk.TrackerConfig = trk.TrackerConfig(),
                 loop_closer=None, relocalizer=None, atlas=None,
                 init_window: float = 100.0):
        cfg = cfg._replace(kf_inlier_ratio=0.9, ba_iters=max(cfg.ba_iters, 6))
        super().__init__(cam, 0.0, cfg, loop_closer=loop_closer,
                         relocalizer=relocalizer, atlas=atlas)
        self.init_window = init_window
        self.ref_frame = None       # initialization reference FrameData
        self.rng = jax.random.PRNGKey(0)
        self.match_radius = (15.0, 30.0)  # reference: th=15 for mono

    def process_mono(self, img, ts: float):
        frame = build_mono_frame(
            self._upload_image(img), jnp.float32(ts), self.cfg.orb)
        return self.process_frame(frame, ts)

    def _spawn_new_map(self):
        super()._spawn_new_map()
        self.ref_frame = None

    # -- initialization --

    def _initialize(self, frame: FrameData):
        n_feat = int(jnp.sum(frame.valid.astype(jnp.int32)))
        if self.ref_frame is None:
            if n_feat >= 100:
                self.ref_frame = frame
            return False
        if n_feat < 100:
            self.ref_frame = None  # reference too stale, restart
            return False
        idx, n_m = search_for_initialization(
            self.ref_frame, frame, jnp.float32(self.init_window))
        if int(n_m) < 100:
            self.ref_frame = frame
            return False
        ridx = jnp.clip(idx, 0, frame.uv.shape[0] - 1)
        self.rng, sub = jax.random.split(self.rng)
        res = twoview.reconstruct(
            sub, self.ref_frame.uv, frame.uv[ridx], idx >= 0, self.cam)
        if not bool(res.success):
            return False
        self.state, n_lm, obs1, R1, t1 = create_initial_mono_map(
            self.state, self.ref_frame, frame, idx, res.R, res.t,
            res.points, res.good, self.cam, self.cfg,
        )
        self.n_kf = 2
        self.kf_order = [0, 1]
        self.n_lm = int(n_lm)
        # full BA over the initial pair (reference runs GlobalBA(20 it))
        adj = jnp.asarray(
            np.concatenate([[1], np.full(self.cfg.ba_window - 1, -1)]).astype(np.int32))
        fixed = jnp.asarray(
            np.concatenate([[0], np.full(self.cfg.ba_anchors - 1, -1)]).astype(np.int32))
        self.state, _ = trk.local_ba(self.state, adj, fixed, self.cam,
                                     self.bf, self.cfg)
        self.R = self.state.kf_R[1]
        self.t = self.state.kf_t[1]
        self.prev_obs = self.state.kf_obs[1]
        self.prev_octave = frame.octave
        self.prev_angle = frame.angle
        self.track_state = trk.TrackState.OK
        self.frames_since_kf = 0
        self.ref_inliers = self.n_lm
        self.ref_frame = None
        self._refresh_ref_pose(1)
        # register the init pair in the place-recognition database (later
        # keyframes are added by _insert_keyframe)
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(self.state, 0)
            self.loop_closer.add_keyframe(self.state, 1)
        return True

    def _need_keyframe(self, frame, cur_obs, n_inliers):
        """Mono keyframe rule (reference A.9): thRefRatio=0.9, no close-point
        condition, never queue more than one."""
        cfg = self.cfg
        if self.track_state != trk.TrackState.OK:
            return False
        c1a = self.frames_since_kf >= cfg.max_frames_between_kf
        c2 = (n_inliers < cfg.kf_inlier_ratio * self.ref_inliers
              and n_inliers > 15)
        return bool(c1a or c2)
