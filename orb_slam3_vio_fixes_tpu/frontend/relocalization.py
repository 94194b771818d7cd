"""Relocalization: BoW candidate retrieval + batched PnP RANSAC + refinement.

TPU-native re-design of the reference's Tracking::Relocalization
(reference: src/Tracking.cc:3609-3777 — DetectRelocalizationCandidates from
the KeyFrameDatabase, per-candidate SearchByBoW >=15 matches, MLPnP RANSAC
(min set 6), PoseOptimization, and if <50 inliers a projection search against
the candidate's map points followed by a final optimization; success = 50
inliers).

Re-design: the candidate loop stays host-side (few candidates), each
candidate's match + PnP + refine is one jitted kernel; the MLPnP RANSAC is
the batched-hypothesis pnp_ransac (ops/pnp).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import tracking as trk
from orb_slam3_vio_fixes_tpu.frontend.frame import FrameData
from orb_slam3_vio_fixes_tpu.ops import matching, pnp
from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


class RelocConfig(NamedTuple):
    min_bow_matches: int = 15     # reference: nmatches < 15 -> skip (:3651)
    min_pnp_inliers: int = 10     # reference RANSAC minInliers (:3658)
    accept_inliers: int = 50      # reference: nGood >= 50 (:3760)
    n_hyp: int = 256
    n_candidates: int = 3


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg"))
def reloc_attempt(
    key,
    state: ms.MapState,
    cand_id,
    frame: FrameData,
    window_kfs,            # (W,) candidate + covisible keyframe ids (-1 pad)
    cam: Camera, bf,
    cfg: RelocConfig,
    tcfg: trk.TrackerConfig,
):
    """One candidate: BoW-style descriptor match -> PnP RANSAC ->
    pose refinement -> local-window projection widen -> final refinement.

    Returns (ok, R, t, cur_obs, n_inliers, n_bow)."""
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    c = jnp.clip(cand_id, 0, K - 1)

    obs_c = state.kf_obs[c]
    lc = jnp.clip(obs_c, 0, L - 1)
    has_c = (obs_c >= 0) & state.lm_valid[lc] & state.kf_feat_valid[c]
    # frame feature -> candidate's landmark-bound feature
    res = matching.match_descriptors(
        frame.desc, frame.valid, state.kf_desc[c], has_c,
        ratio=0.75, max_dist=matching.TH_LOW, mutual=True,
    )
    matched = res.idx >= 0
    n_bow = jnp.sum(matched.astype(jnp.int32))
    j = jnp.clip(res.idx, 0, N - 1)
    lm_ids = jnp.where(matched, obs_c[j], -1)          # (N,) frame feat -> lm
    X = state.lm_pos[jnp.clip(lm_ids, 0, L - 1)]

    inv_s2 = trk.octave_inv_sigma2(tcfg.orb)[
        jnp.clip(frame.octave, 0, tcfg.orb.n_levels - 1)]
    pr = pnp.pnp_ransac(
        key, X, frame.uv, matched, inv_s2, cam,
        n_hyp=cfg.n_hyp, min_inliers=cfg.min_pnp_inliers,
    )
    cur_obs = jnp.where(matched & pr.inliers, lm_ids, -1)
    R1, t1, cur_obs, n1 = trk.pose_opt_from_obs(
        state, pr.R, pr.t, frame, cur_obs, cam, bf, tcfg)
    # widen by projecting the candidate's local map and re-optimize
    R2, t2, cur_obs, n2 = trk.track_local_map(
        state, R1, t1, frame, cur_obs, window_kfs, cam, bf,
        jnp.float32(2.0), tcfg,
    )
    ok = pr.success & (n_bow >= cfg.min_bow_matches) & (n2 >= cfg.accept_inliers)
    return ok, R2, t2, cur_obs, n2, n_bow


class Relocalizer:
    """Host orchestrator: queries the shared BoW keyframe database
    (reference: KeyFrameDatabase::DetectRelocalizationCandidates
    src/KeyFrameDatabase.cc:733) and tries candidates until one verifies."""

    def __init__(self, vocab: voc.Vocabulary, db_ref,
                 cfg: RelocConfig = RelocConfig(), mesh=None):
        """db_ref: callable returning the live voc.KeyFrameDatabase (the
        LoopCloser owns and grows it; sharing one DB mirrors the reference,
        where loop closing and relocalization query the same inverted file).

        mesh: optional jax.sharding.Mesh — enables the sharded GLOBAL
        descriptor search (parallel.sharded_matching.sharded_global_bind):
        the frame is matched against the whole landmark table row-sharded
        over the mesh, skipping BoW candidate retrieval entirely."""
        self.vocab = vocab
        self.db_ref = db_ref
        self.cfg = cfg
        self.mesh = mesh
        self.key = jax.random.PRNGKey(13)
        self.n_success = 0
        self.n_success_global = 0

    def candidates(self, state: ms.MapState, frame: FrameData):
        hist = voc.bow_histogram(
            self.vocab, voc.assign_words(self.vocab, frame.desc, frame.valid))
        exclude = ~np.asarray(state.kf_valid)
        ids, scores = voc.db_query(
            self.db_ref(), hist, jnp.asarray(exclude), jnp.float32(0.0),
            n_best=self.cfg.n_candidates,
        )
        return [int(i) for i in np.asarray(ids) if i >= 0]

    def _relocalize_global(self, state: ms.MapState, frame: FrameData,
                           cam: Camera, bf, tcfg: trk.TrackerConfig):
        """Mesh path: one sharded whole-map descriptor search binds frame
        features to landmarks directly, then the same PnP + widen + verify
        chain as the per-candidate path. Returns result tuple or None."""
        from orb_slam3_vio_fixes_tpu.parallel import sharded_matching as sm

        L = state.lm_desc.shape[0]
        n_dev = self.mesh.shape["db"] if "db" in self.mesh.shape else (
            self.mesh.devices.size)
        axis = "db" if "db" in self.mesh.shape else self.mesh.axis_names[0]
        if L % n_dev != 0:
            return None     # capacity tiers are powers of two — already even
        lm_ids = sm.sharded_global_bind(
            frame.desc, frame.valid, state.lm_desc, state.lm_valid,
            self.mesh, axis=axis)
        matched = np.asarray(lm_ids) >= 0
        if matched.sum() < self.cfg.min_bow_matches:
            return None
        X = state.lm_pos[jnp.clip(lm_ids, 0, L - 1)]
        inv_s2 = trk.octave_inv_sigma2(tcfg.orb)[
            jnp.clip(frame.octave, 0, tcfg.orb.n_levels - 1)]
        self.key, sub = jax.random.split(self.key)
        pr = pnp.pnp_ransac(
            sub, X, frame.uv, jnp.asarray(matched), inv_s2, cam,
            n_hyp=self.cfg.n_hyp, min_inliers=self.cfg.min_pnp_inliers)
        if not bool(pr.success):
            return None
        cur_obs = jnp.where(jnp.asarray(matched) & pr.inliers, lm_ids, -1)
        R1, t1, cur_obs, _ = trk.pose_opt_from_obs(
            state, pr.R, pr.t, frame, cur_obs, cam, bf, tcfg)
        # local window from the anchor keyframes of the inlier landmarks
        anchors = np.asarray(state.lm_first_kf)[
            np.asarray(jnp.clip(lm_ids, 0, L - 1))][
            np.asarray(cur_obs) >= 0]
        W = tcfg.ba_window + tcfg.ba_fixed
        top = np.full(W, -1, np.int32)
        if anchors.size:
            uniq, counts = np.unique(anchors[anchors >= 0],
                                     return_counts=True)
            sel = uniq[np.argsort(-counts)][:W]
            top[: len(sel)] = sel
        R2, t2, cur_obs, n2 = trk.track_local_map(
            state, R1, t1, frame, cur_obs, jnp.asarray(top), cam, bf,
            jnp.float32(2.0), tcfg)
        if int(n2) < self.cfg.accept_inliers:
            return None
        self.n_success += 1
        self.n_success_global += 1
        return R2, t2, cur_obs, int(n2)

    def relocalize(self, state: ms.MapState, frame: FrameData,
                   cam: Camera, bf, tcfg: trk.TrackerConfig):
        """Returns (R, t, cur_obs, n_inliers) or None."""
        if self.mesh is not None:
            hit = self._relocalize_global(state, frame, cam, bf, tcfg)
            if hit is not None:
                return hit
        cov = None
        for cand in self.candidates(state, frame):
            if cov is None:
                cov = np.asarray(ms.covisibility(state))
            row = cov[cand].copy()
            row[cand] = row.max() + 1
            W = tcfg.ba_window + tcfg.ba_fixed
            top = np.argsort(-row)[:W].astype(np.int32)
            top = np.where(row[top] > 0, top, -1)
            self.key, sub = jax.random.split(self.key)
            ok, R, t, cur_obs, n_inl, n_bow = reloc_attempt(
                sub, state, jnp.int32(cand), frame, jnp.asarray(top),
                cam, bf, self.cfg, tcfg,
            )
            if bool(ok):
                self.n_success += 1
                return R, t, cur_obs, int(n_inl)
        return None
