"""Loop closing: place recognition, Sim3 verification, pose-graph correction.

TPU-native re-design of the reference's LoopClosing thread
(reference: src/LoopClosing.cc — NewDetectCommonRegions :324-533,
DetectCommonRegionsFromBoW :578-896 (BoW match -> Sim3Solver RANSAC ->
OptimizeSim3 -> projection verification with thresholds nBoWMatches=20 /
nSim3Inliers=20 / nProjMatches=50), CorrectLoop :969-1213 (stop mapping,
Sim3-propagate covisibles, correct MapPoints, SearchAndFuse, essential-graph
optimization, optional GBA), detection gating via
KeyFrameDatabase::DetectNBestCandidates src/KeyFrameDatabase.cc:604).

Re-design decisions:
  * the BoW inverted file is a dense (K, W) histogram matrix — candidate
    retrieval is one masked top-k over an L1-score vector (slam_map/vocabulary);
  * Sim3Solver's sequential RANSAC is the batched-hypothesis sim3_ransac
    (ops/sim3) — all hypotheses scored in one (H, N) pass;
  * the essential graph is the dense batched pose-graph LM (optim/pose_graph);
  * landmark correction is a single gather/scatter pass: every landmark is
    re-expressed through its anchor keyframe's corrected Sim3 — the
    reference's per-covisible-group pointer loop (src/LoopClosing.cc:1069)
    becomes one vectorized transform.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops import matching
from orb_slam3_vio_fixes_tpu.ops import sim3 as sim3_ops
from orb_slam3_vio_fixes_tpu.optim import pose_graph as pg
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


class LoopConfig(NamedTuple):
    min_bow_matches: int = 20      # reference nBoWMatches (:581)
    min_sim3_inliers: int = 20     # reference nSim3Inliers
    min_refine_inliers: int = 20   # post-OptimizeSim3 gate (nProjOptMatches
                                   # spirit, src/LoopClosing.cc:785-800)
    min_gap_kfs: int = 10          # don't match against recent keyframes
    min_score: float = 0.03        # BoW score floor
    n_candidates: int = 3          # DetectNBestCandidates(3)
    n_consistency: int = 3         # consecutive-KF temporal gate (reference:
                                   # mnLoopNumCoincidences >= 3, :374-464)
    n_hyp: int = 256               # RANSAC hypotheses (batched)
    fix_scale: bool = True         # stereo/RGBD/inertial: no scale drift
    max_edges: int = 2048
    pg_iters: int = 12
    run_gba: bool = True
    gba_max_kf: int = 200          # reference: GBA only if map < 200 KFs


@jax.jit
def kf_histogram(vocab: voc.Vocabulary, desc, feat_valid):
    words = voc.assign_words(vocab, desc, feat_valid)
    return voc.bow_histogram(vocab, words)


@functools.partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def verify_candidate(
    key,
    state: ms.MapState,
    kf_id, cand_id,
    cam: Camera,
    inv_sigma2_oct,      # (n_levels,) 1/sigma^2 per octave
    n_hyp: int,
    fix_scale: bool,
):
    """Geometric verification of one loop candidate: descriptor-match the two
    keyframes' landmark-bound features, then batched Sim3 RANSAC on the
    matched landmark pairs (reference: DetectCommonRegionsFromBoW
    src/LoopClosing.cc:578-896).

    Returns (n_matches, Sim3Result) where the Sim3 maps candidate-camera
    coordinates into current-camera coordinates (the reference's mScw
    convention: gScm in :698-767).
    """
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    k = jnp.clip(kf_id, 0, K - 1)
    c = jnp.clip(cand_id, 0, K - 1)

    obs_k = state.kf_obs[k]
    obs_c = state.kf_obs[c]
    lk = jnp.clip(obs_k, 0, L - 1)
    lc = jnp.clip(obs_c, 0, L - 1)
    has_k = (obs_k >= 0) & state.lm_valid[lk] & state.kf_feat_valid[k]
    has_c = (obs_c >= 0) & state.lm_valid[lc] & state.kf_feat_valid[c]

    res = matching.match_descriptors(
        state.kf_desc[k], has_k, state.kf_desc[c], has_c,
        ratio=0.75, max_dist=matching.TH_LOW, mutual=True,
    )
    matched = res.idx >= 0
    n_matches = jnp.sum(matched.astype(jnp.int32))
    j = jnp.clip(res.idx, 0, N - 1)

    # matched landmark pairs -> camera-frame points
    Xk = state.lm_pos[lk]                                # via current KF obs
    Xc_of_match = state.lm_pos[jnp.clip(obs_c[j], 0, L - 1)]
    pts1 = jnp.einsum("ij,nj->ni", state.kf_R[k], Xk) + state.kf_t[k]
    pts2 = jnp.einsum("ij,nj->ni", state.kf_R[c], Xc_of_match) + state.kf_t[c]
    s2_k = 1.0 / inv_sigma2_oct[jnp.clip(state.kf_octave[k], 0, inv_sigma2_oct.shape[0] - 1)]
    s2_c = 1.0 / inv_sigma2_oct[jnp.clip(state.kf_octave[c][j], 0, inv_sigma2_oct.shape[0] - 1)]
    sim = sim3_ops.sim3_ransac(
        key, pts1, pts2, matched, cam, cam, s2_k, s2_c,
        n_hyp=n_hyp, fix_scale=fix_scale,
    )
    # Gauss-Newton refinement between RANSAC and acceptance (reference:
    # OptimizeSim3 at src/LoopClosing.cc:767, impl src/Optimizer.cc:2115)
    refined = sim3_ops.sim3_refine(
        sim.R, sim.t, sim.s, pts1, pts2, matched & sim.inliers,
        cam, cam, s2_k, s2_c, fix_scale=fix_scale,
    )
    return n_matches, sim.n_inliers, refined


@functools.partial(jax.jit, static_argnames=("n_best",))
def detect_candidates(
    db: voc.KeyFrameDatabase,
    state: ms.MapState,
    hist, kf_id, min_gap, min_score,
    n_best: int,
):
    """Device-side candidate retrieval: covisibility-group accumulated BoW
    scores with covisible/recency/invalid exclusion — ONE program, one small
    host pull (reference: DetectNBestCandidates src/KeyFrameDatabase.cc:
    604-720; exclusion of the query's covisibles at :620-641)."""
    cov = ms.covisibility(state)
    K = cov.shape[0]
    ids = jnp.arange(K, dtype=jnp.int32)
    exclude = (cov[kf_id] > 0) | (ids > kf_id - min_gap) | ~state.kf_valid
    cand_ids, scores = voc.db_query_grouped(
        db, hist, cov.astype(jnp.float32), exclude, min_score, n_best=n_best)
    return cand_ids, scores


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("n_levels", "scale"))
def apply_correction(
    state: ms.MapState,
    R_new, t_new, s_new,     # (K,3,3),(K,3),(K,) corrected Sim3 world->cam
    n_levels: int = 8, scale: float = 1.2,
):
    """Write corrected keyframe poses and re-express every landmark through
    its anchor keyframe (reference: CorrectLoop src/LoopClosing.cc:1045-1100
    — eigP3Dw -> camera frame of a covisible KF under the OLD pose -> world
    under the CORRECTED pose; here the anchor is lm_first_kf).

    For Sim3 (R, t, s): Xc = s R X + t; the corrected SE3 pose stored back is
    (R, t/s) (the reference's [R t/s; 0 1] at src/LoopClosing.cc:1127).
    """
    K = state.kf_R.shape[0]
    L = state.lm_pos.shape[0]
    anchor = jnp.clip(state.lm_first_kf, 0, K - 1)
    anchored = (state.lm_first_kf >= 0) & state.lm_valid & state.kf_valid[anchor]

    R_old = state.kf_R[anchor]
    t_old = state.kf_t[anchor]
    Xc = jnp.einsum("lij,lj->li", R_old, state.lm_pos) + t_old   # old cam frame
    # world under corrected pose: X = S^{-1} Xc = (1/s) R^T (Xc - t)
    Rn = R_new[anchor]
    tn = t_new[anchor]
    sn = s_new[anchor]
    Xw = jnp.einsum("lji,lj->li", Rn, Xc - tn) / jnp.maximum(sn[:, None], 1e-9)
    lm_pos = jnp.where(anchored[:, None], Xw, state.lm_pos)

    # store corrected keyframe SE3: R, t/s
    t_se3 = t_new / jnp.maximum(s_new[:, None], 1e-9)
    state = state._replace(
        kf_R=jnp.where(state.kf_valid[:, None, None], R_new, state.kf_R),
        kf_t=jnp.where(state.kf_valid[:, None], t_se3, state.kf_t),
        lm_pos=lm_pos,
        epoch=state.epoch + 1,
    )
    return ms.update_landmark_stats(state, n_levels, scale)


class LoopResult(NamedTuple):
    cand_id: int
    n_matches: int
    n_inliers: int
    corrected: bool


class LoopCloser:
    """Host orchestrator for place recognition + loop correction.

    Owns the vocabulary and the dense keyframe-histogram database; call
    `on_keyframe` after each keyframe insertion (the reference's queue between
    LocalMapping and LoopClosing becomes this synchronous call in round 1;
    the kernels are already actor-ready since all state is explicit).
    """

    def __init__(self, vocab: voc.Vocabulary, cam: Camera, max_kf: int,
                 inv_sigma2_oct, cfg: LoopConfig = LoopConfig(),
                 bf: float = 0.0, n_levels: int = 8, scale: float = 1.2):
        self.vocab = vocab
        self.cam = cam
        self.cfg = cfg
        self.bf = jnp.float32(bf)
        self.n_levels = n_levels
        self.scale = scale
        self.db = voc.KeyFrameDatabase.empty(max_kf, vocab.n_words)
        self.inv_sigma2_oct = jnp.asarray(inv_sigma2_oct)
        self.key = jax.random.PRNGKey(7)
        self.loop_edges = []   # (i_cand, j_cur, (R, t, s)) accepted loops
        self.n_corrections = 0
        # temporal-consistency chain (reference: mnLoopNumCoincidences over
        # consecutive keyframes, src/LoopClosing.cc:374-464)
        self._pending_group = None   # set of KF slots around the candidate
        self._pending_count = 0

    def reset(self):
        """Clear the database (active map was stashed or reset)."""
        K, W = self.db.hist.shape
        self.db = voc.KeyFrameDatabase.empty(K, W)

    def grow(self, max_kf: int):
        """Grow the histogram database to a bigger keyframe tier."""
        K, W = self.db.hist.shape
        if max_kf <= K:
            return
        h = np.zeros((max_kf, W), np.float32)
        h[:K] = np.asarray(self.db.hist)
        self.db = voc.KeyFrameDatabase(jnp.asarray(h))

    def rebuild_after_merge(self, old_hists: np.ndarray, kf_off: int,
                            n_cur: int):
        """After a map merge the keyframe ids shift: stored-map rows keep
        ids [0, kf_off), active-map rows move to [kf_off, kf_off + n_cur)."""
        K, W = self.db.hist.shape
        h = np.zeros((K, W), np.float32)
        h[:min(kf_off, K)] = old_hists[:min(kf_off, K)]
        cur = np.asarray(self.db.hist[:n_cur])
        h[kf_off:kf_off + n_cur] = cur
        self.db = voc.KeyFrameDatabase(jnp.asarray(h))

    def add_keyframe(self, state: ms.MapState, kf_id: int):
        hist = kf_histogram(self.vocab, state.kf_desc[kf_id],
                            state.kf_feat_valid[kf_id])
        self.db = voc.db_add(self.db, jnp.int32(kf_id), hist)
        return hist

    def detect(self, state: ms.MapState, kf_id: int, hist):
        """BoW retrieval — one device program, one small pull (reference:
        DetectNBestCandidates with covisibility-group score accumulation,
        src/KeyFrameDatabase.cc:604-720)."""
        cfg = self.cfg
        cand_ids, _ = detect_candidates(
            self.db, state, hist, jnp.int32(kf_id),
            jnp.int32(cfg.min_gap_kfs), jnp.float32(cfg.min_score),
            cfg.n_candidates,
        )
        return [int(i) for i in np.asarray(cand_ids) if i >= 0]

    def on_keyframe(self, state: ms.MapState, kf_id: int, n_kf: int,
                    fixed_extra: Optional[int] = None):
        """Full loop pipeline for one new keyframe. Returns (state, result).

        A correction only fires after the SAME map region has been detected
        and geometrically verified on `n_consistency` consecutive keyframes
        (reference: NewDetectCommonRegions' coincidence counters,
        src/LoopClosing.cc:374-464) — a single aliased-texture hit cannot
        rewrite the map."""
        cfg = self.cfg
        hist = self.add_keyframe(state, kf_id)
        cands = self.detect(state, kf_id, hist)
        hit = None
        for cand in cands:
            self.key, sub = jax.random.split(self.key)
            n_m, n_ransac, sim = verify_candidate(
                sub, state, jnp.int32(kf_id), jnp.int32(cand), self.cam,
                self.inv_sigma2_oct, cfg.n_hyp, cfg.fix_scale,
            )
            # ONE pull for all three gate scalars
            gates = np.asarray(jnp.stack(
                [n_m, n_ransac, sim.n_inliers]))
            n_m, n_ransac, n_ref = (int(x) for x in gates)
            if (n_m < cfg.min_bow_matches
                    or n_ransac < cfg.min_sim3_inliers
                    or n_ref < cfg.min_refine_inliers):
                continue
            hit = (cand, n_m, n_ref, sim)
            break
        if hit is None:
            self._pending_group = None
            self._pending_count = 0
            return state, None
        cand, n_m, n_ref, sim = hit
        group = self._covisible_group(state, cand)
        if (self._pending_group is not None
                and self._pending_group & group):
            self._pending_count += 1
        else:
            self._pending_count = 1
        self._pending_group = group
        if self._pending_count < cfg.n_consistency:
            return state, LoopResult(cand, n_m, n_ref, False)
        self._pending_group = None
        self._pending_count = 0
        state = self._correct(state, kf_id, cand, sim, n_kf)
        self.n_corrections += 1
        return state, LoopResult(cand, n_m, n_ref, True)

    def _covisible_group(self, state: ms.MapState, cand: int):
        """Candidate + its covisible keyframes (the reference's spCandidate
        group used for the coincidence check)."""
        row = np.asarray(ms.covisibility(state)[cand])
        group = {int(i) for i in np.nonzero(row >= 15)[0]}
        group.add(int(cand))
        return group

    def _correct(self, state: ms.MapState, kf_id: int, cand: int,
                 sim: sim3_ops.Sim3Result, n_kf: int):
        """Essential-graph correction (reference: CorrectLoop
        src/LoopClosing.cc:969-1213). The loop edge constrains
        S_cw(cur)_corrected = S_cur_cand * S_cw(cand)."""
        cfg = self.cfg
        K = state.kf_R.shape[0]
        cov = np.asarray(ms.covisibility(state))
        edges = pg.essential_edges_from_map(
            np.asarray(state.kf_R), np.asarray(state.kf_t),
            np.asarray(state.kf_valid), np.asarray(state.kf_prev),
            cov, cfg.max_edges, cov_threshold=100,
        )
        # loop-edge measurement S_ji with i=cand, j=cur:
        # S_cw(cur) S_cw(cand)^-1 = S_cur_cand = (sim.R, sim.t, sim.s)
        n_valid_edges = int(np.asarray(edges.valid).sum())
        edges = pg.add_loop_edge(
            edges, n_valid_edges, cand, kf_id, sim.R, sim.t, sim.s, weight=100.0
        )
        self.loop_edges.append((cand, kf_id, (np.asarray(sim.R),
                                              np.asarray(sim.t), float(sim.s))))
        fixed = np.zeros(K, bool)
        fixed[cand] = True      # reference fixes the loop keyframe (:1530)
        fixed[0] = True
        R, t, s, chi2 = pg.optimize_pose_graph(
            state.kf_R, state.kf_t, jnp.ones(K), jnp.asarray(fixed), edges,
            pg.PoseGraphConfig(n_iters=cfg.pg_iters, fix_scale=cfg.fix_scale),
        )
        state = apply_correction(state, R, t, s, n_levels=self.n_levels,
                                 scale=self.scale)
        # global BA after the essential-graph correction (reference:
        # CorrectLoop spawns RunGlobalBundleAdjustment when the map has <200
        # keyframes, src/LoopClosing.cc:1199-1207; our matrix-free CG Schur
        # solver scales to the full fixed-capacity map so the size gate is a
        # config knob, not a hard limit)
        if cfg.run_gba and n_kf <= cfg.gba_max_kf:
            from orb_slam3_vio_fixes_tpu.optim import global_ba as gba_mod

            state, _ = gba_mod.run_global_ba(
                state, self.inv_sigma2_oct, self.cam, self.bf, jnp.int32(0),
                n_levels=self.n_levels, scale=self.scale)
        return state
