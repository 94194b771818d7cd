"""Atlas: multi-map management, map stashing on tracking loss, map merging.

TPU-native re-design of the reference's Atlas + the merge half of LoopClosing
(reference: include/Atlas.h:49 multi-map container; CreateMapInAtlas spawns a
fresh map when tracking is LOST, src/Tracking.cc:2662-2700; place recognition
against other maps' keyframes triggers MergeLocal / MergeLocal2,
src/LoopClosing.cc:1215/:1783 — the matched OLD map becomes the world, the
current map's keyframes/points are transformed by the verified Sim3 and
transferred, duplicates fused, welding BA run).

Re-design decisions:
  * a "map" is (MapState arrays, n_kf, n_lm, BoW histograms) — stashing is a
    host-side move of the snapshot, no pointer surgery;
  * merging is ONE jitted scatter: the stored map's fixed-capacity arrays are
    the destination, the active map's keyframes/landmarks are written into
    its free slots with id offsets, with every pose/point/velocity mapped
    through the verified world-alignment Sim3 (the reference's per-object
    loops at src/LoopClosing.cc:1880-1921 become array ops);
  * cross-map Sim3 verification reuses the batched RANSAC of ops/sim3 on
    descriptor matches between the two maps' keyframes.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops import matching
from orb_slam3_vio_fixes_tpu.ops import sim3 as sim3_ops
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project


class StoredMap(NamedTuple):
    state: ms.MapState
    n_kf: int
    n_lm: int
    hists: np.ndarray    # (K, W) float32 BoW keyframe histograms


class AtlasConfig(NamedTuple):
    min_stash_kfs: int = 5        # reference: map >= 10 KFs survives a reset
    min_bow_matches: int = 20
    min_sim3_inliers: int = 15
    min_proj_matches: int = 40    # projection-verification gate (reference
                                  # nProjMatches=50, src/LoopClosing.cc:583)
    min_score: float = 0.03      # BoW score floor for merge candidates
    merge_window: int = 8         # welding window keyframes per side
    n_hyp: int = 256
    fix_scale: bool = True


@functools.partial(jax.jit, static_argnames=(
    "n_hyp", "fix_scale", "n_levels", "scale"))
def verify_cross_candidate(
    key,
    cur: ms.MapState, kf_id,
    old: ms.MapState, cand_id,
    cam: Camera,
    inv_sigma2_oct,
    n_hyp: int,
    fix_scale: bool,
    n_levels: int = 8,
    scale: float = 1.2,
):
    """Sim3 verification between a keyframe of the ACTIVE map and a candidate
    keyframe of a STORED map (reference: DetectCommonRegionsFromBoW running
    across maps, src/LoopClosing.cc:578-896). Same four-stage design as
    loop_closing.verify_candidate: loose descriptor gates feeding Sim3
    RANSAC + refinement, then a projection-verification count that carries
    the true/false discrimination (FindMatchesByProjection, :913-967).

    Returns (n_matches, n_proj, Sim3Result) with the Sim3 mapping
    candidate-camera coordinates into current-camera coordinates."""
    K, N = cur.kf_obs.shape
    L = cur.lm_pos.shape[0]
    Lo = old.lm_pos.shape[0]
    k = jnp.clip(kf_id, 0, K - 1)
    c = jnp.clip(cand_id, 0, old.kf_obs.shape[0] - 1)

    obs_k = cur.kf_obs[k]
    obs_c = old.kf_obs[c]
    lk = jnp.clip(obs_k, 0, L - 1)
    lc = jnp.clip(obs_c, 0, Lo - 1)
    has_k = (obs_k >= 0) & cur.lm_valid[lk] & cur.kf_feat_valid[k]
    has_c = (obs_c >= 0) & old.lm_valid[lc] & old.kf_feat_valid[c]

    res = matching.match_descriptors(
        cur.kf_desc[k], has_k, old.kf_desc[c], has_c,
        ratio=0.9, max_dist=matching.TH_HIGH, mutual=True,
    )
    matched = res.idx >= 0
    n_matches = jnp.sum(matched.astype(jnp.int32))
    j = jnp.clip(res.idx, 0, N - 1)

    Xk = cur.lm_pos[lk]
    Xc = old.lm_pos[jnp.clip(obs_c[j], 0, Lo - 1)]
    pts1 = jnp.einsum("ij,nj->ni", cur.kf_R[k], Xk) + cur.kf_t[k]
    pts2 = jnp.einsum("ij,nj->ni", old.kf_R[c], Xc) + old.kf_t[c]
    nl = inv_sigma2_oct.shape[0]
    s2_k = 1.0 / inv_sigma2_oct[jnp.clip(cur.kf_octave[k], 0, nl - 1)]
    s2_c = 1.0 / inv_sigma2_oct[jnp.clip(old.kf_octave[c][j], 0, nl - 1)]
    sim = sim3_ops.sim3_ransac(
        key, pts1, pts2, matched, cam, cam, s2_k, s2_c,
        n_hyp=n_hyp, fix_scale=fix_scale,
    )
    refined = sim3_ops.sim3_refine(
        sim.R, sim.t, sim.s, pts1, pts2, matched & sim.inliers,
        cam, cam, s2_k, s2_c, fix_scale=fix_scale,
    )
    # projection verification: stored-map landmarks bound to the candidate,
    # through the refined Sim3, window-matched in the current keyframe
    Xc_all = jnp.einsum("ij,nj->ni", old.kf_R[c], old.lm_pos[lc]) \
        + old.kf_t[c]
    Y = refined.s * Xc_all @ refined.R.T + refined.t
    uv_pred = project(cam, Y)
    depth_ok = Y[:, 2] > 0.1
    dist_c = jnp.linalg.norm(Y, axis=-1)
    ratio_d = jnp.maximum(
        old.lm_maxdist[lc] / jnp.maximum(dist_c, 1e-9), 1e-9)
    octv = jnp.clip(
        jnp.ceil(jnp.log(ratio_d) / jnp.log(scale)).astype(jnp.int32),
        0, n_levels - 1)
    sf = jnp.power(jnp.float32(scale), octv.astype(jnp.float32))
    proj = matching.search_by_projection(
        uv_pred, has_c & depth_ok, old.kf_desc[c], octv, 10.0 * sf,
        cur.kf_uv[k], cur.kf_feat_valid[k], cur.kf_desc[k],
        cur.kf_octave[k],
        max_dist=matching.TH_HIGH,
        oct_window=n_levels,
    )
    n_proj = jnp.sum((proj.idx >= 0).astype(jnp.int32))
    return n_matches, n_proj, refined


@functools.partial(jax.jit, donate_argnums=(0,))
def merge_maps(
    dst: ms.MapState,
    src: ms.MapState,
    n_kf_dst, n_lm_dst,       # scalar int32 slot cursors of dst
    R_a, t_a, s_a,            # world Sim3: X_dst = s_a * R_a @ X_src + t_a
):
    """Transfer every valid src keyframe/landmark into dst's free slots,
    aligning src-world into dst-world by the given Sim3 (reference:
    MergeLocal's KF/MP ownership transfer, src/LoopClosing.cc:1529-1586 and
    MergeLocal2 :1880-1921; the SE3 stored for a Sim3-corrected pose is
    [R, t/s], src/LoopClosing.cc:1127)."""
    Ks, N = src.kf_obs.shape
    Ls = src.lm_pos.shape[0]
    Kd = dst.kf_obs.shape[0]
    Ld = dst.lm_pos.shape[0]

    # keyframe poses: x_cam = R_cw x_src + t_cw with x_src=(1/s)R_a^T(x_dst-t_a)
    # composed Sim3 has rotation R_cw R_a^T, scale 1/s; stored SE3 (R', t'):
    # R' = R_cw R_a^T ; t' = s * t_cw - R' t_a
    Rp = jnp.einsum("kij,lj->kil", src.kf_R, R_a)  # (K,3,3) R_cw @ R_a^T
    tp = s_a * src.kf_t - jnp.einsum("kij,j->ki", Rp, t_a)
    vel = s_a * jnp.einsum("ij,kj->ki", R_a, src.kf_vel)
    Xw = s_a * jnp.einsum("ij,lj->li", R_a, src.lm_pos) + t_a
    nrm = jnp.einsum("ij,lj->li", R_a, src.lm_normal)

    kf_slot = jnp.where(src.kf_valid,
                        jnp.arange(Ks, dtype=jnp.int32) + n_kf_dst, Kd - 1)
    lm_slot = jnp.where(src.lm_valid,
                        jnp.arange(Ls, dtype=jnp.int32) + n_lm_dst, Ld - 1)
    kv = src.kf_valid
    lv = src.lm_valid

    # remap observation ids and prev pointers
    obs = jnp.where(src.kf_obs >= 0, src.kf_obs + n_lm_dst, -1)
    prev = jnp.where(src.kf_prev >= 0, src.kf_prev + n_kf_dst, -1)
    first = jnp.where(src.lm_first_kf >= 0, src.lm_first_kf + n_kf_dst, -1)

    def w(dst_arr, src_arr, slot, valid):
        v = valid.reshape(valid.shape + (1,) * (src_arr.ndim - 1))
        return dst_arr.at[slot].set(
            jnp.where(v, src_arr, dst_arr[slot]))

    dst = dst._replace(
        kf_R=w(dst.kf_R, Rp, kf_slot, kv),
        kf_t=w(dst.kf_t, tp, kf_slot, kv),
        kf_ts=w(dst.kf_ts, src.kf_ts, kf_slot, kv),
        kf_vel=w(dst.kf_vel, vel, kf_slot, kv),
        kf_bg=w(dst.kf_bg, src.kf_bg, kf_slot, kv),
        kf_ba=w(dst.kf_ba, src.kf_ba, kf_slot, kv),
        kf_prev=w(dst.kf_prev, prev, kf_slot, kv),
        kf_valid=dst.kf_valid.at[kf_slot].set(
            jnp.where(kv, True, dst.kf_valid[kf_slot])),
        kf_uv=w(dst.kf_uv, src.kf_uv, kf_slot, kv),
        kf_ur=w(dst.kf_ur, src.kf_ur, kf_slot, kv),
        kf_octave=w(dst.kf_octave, src.kf_octave, kf_slot, kv),
        kf_angle=w(dst.kf_angle, src.kf_angle, kf_slot, kv),
        kf_desc=w(dst.kf_desc, src.kf_desc, kf_slot, kv),
        kf_feat_valid=w(dst.kf_feat_valid, src.kf_feat_valid, kf_slot, kv),
        kf_obs=w(dst.kf_obs, obs, kf_slot, kv),
        kf_depth=w(dst.kf_depth, src.kf_depth, kf_slot, kv),
        lm_pos=w(dst.lm_pos, Xw, lm_slot, lv),
        lm_valid=dst.lm_valid.at[lm_slot].set(
            jnp.where(lv, True, dst.lm_valid[lm_slot])),
        lm_desc=w(dst.lm_desc, src.lm_desc, lm_slot, lv),
        lm_normal=w(dst.lm_normal, nrm, lm_slot, lv),
        lm_mindist=w(dst.lm_mindist, s_a * src.lm_mindist, lm_slot, lv),
        lm_maxdist=w(dst.lm_maxdist, s_a * src.lm_maxdist, lm_slot, lv),
        lm_first_kf=w(dst.lm_first_kf, first, lm_slot, lv),
        lm_found=w(dst.lm_found, src.lm_found, lm_slot, lv),
        lm_visible=w(dst.lm_visible, src.lm_visible, lm_slot, lv),
        epoch=dst.epoch + 1,
    )
    return ms.update_landmark_stats(dst)


class Atlas:
    """Host-side multi-map manager. The tracker owns the ACTIVE map; the
    Atlas owns the stored ones and the stash/merge transitions."""

    def __init__(self, map_cfg: ms.MapConfig, vocab: voc.Vocabulary,
                 cam: Camera, inv_sigma2_oct,
                 cfg: AtlasConfig = AtlasConfig()):
        self.map_cfg = map_cfg
        self.vocab = vocab
        self.cam = cam
        self.inv_sigma2_oct = jnp.asarray(inv_sigma2_oct)
        self.cfg = cfg
        self.stored: List[StoredMap] = []
        self.key = jax.random.PRNGKey(23)
        self.n_merges = 0

    # -- stash on loss --

    def stash_active(self, state: ms.MapState, n_kf: int, n_lm: int,
                     hists: np.ndarray) -> bool:
        """Store the active map if it is big enough to keep (reference:
        CreateMapInAtlas keeps maps with >=10 KFs, ResetActiveMap otherwise,
        src/Tracking.cc:2019-2024)."""
        if n_kf < self.cfg.min_stash_kfs:
            return False
        self.stored.append(StoredMap(state, n_kf, n_lm, hists[:n_kf].copy()))
        return True

    # -- merge detection against stored maps --

    def detect_merge(self, state: ms.MapState, kf_id: int):
        """Query every stored map's histograms with the new keyframe's BoW
        vector. Returns (map_idx, cand_kf_id) of the best candidate or None
        (reference: DetectNBestCandidates' other-map split,
        src/KeyFrameDatabase.cc:604)."""
        if not self.stored:
            return None
        hist = voc.bow_histogram(
            self.vocab,
            voc.assign_words(self.vocab, state.kf_desc[kf_id],
                             state.kf_feat_valid[kf_id]))
        hist = np.asarray(hist)
        best = None
        for mi, sm in enumerate(self.stored):
            # DBoW2 L1 similarity (histograms are stored L1-normalized)
            scores = 1.0 - 0.5 * np.abs(sm.hists - hist[None]).sum(-1)
            ci = int(np.argmax(scores))
            if best is None or scores[ci] > best[0]:
                best = (float(scores[ci]), mi, ci)
        if best is None or best[0] < self.cfg.min_score:
            return None
        return best[1], best[2]

    def try_merge(self, state: ms.MapState, kf_id: int, n_kf: int, n_lm: int):
        """Verify + merge the active map into a stored map. Returns
        (merged_state, n_kf', n_lm', kf_offset, old_hists) or None."""
        cand = self.detect_merge(state, kf_id)
        if cand is None:
            return None
        mi, ci = cand
        sm = self.stored[mi]
        if sm.n_kf + n_kf > self.map_cfg.max_keyframes or \
           sm.n_lm + n_lm > self.map_cfg.max_landmarks:
            return None
        # the active map may live in a bigger capacity tier (tracker growth);
        # pad the stored map up before the scatter-merge
        Kd, Nd = sm.state.kf_obs.shape
        Ld = sm.state.lm_pos.shape[0]
        mc = self.map_cfg
        if (Kd, Ld) != (mc.max_keyframes, mc.max_landmarks):
            old_cfg = ms.MapConfig(Kd, Ld, Nd, mc.n_levels, mc.scale)
            sm = sm._replace(state=ms.grow_map(sm.state, old_cfg, mc))
            self.stored[mi] = sm
        self.key, sub = jax.random.split(self.key)
        n_m, n_proj, sim = verify_cross_candidate(
            sub, state, jnp.int32(kf_id), sm.state, jnp.int32(ci), self.cam,
            self.inv_sigma2_oct, self.cfg.n_hyp, self.cfg.fix_scale,
            n_levels=self.map_cfg.n_levels, scale=self.map_cfg.scale,
        )
        gates = np.asarray(jnp.stack([n_m, n_proj, sim.n_inliers]))
        if int(gates[0]) < self.cfg.min_bow_matches or \
           int(gates[2]) < self.cfg.min_sim3_inliers or \
           int(gates[1]) < self.cfg.min_proj_matches:
            return None
        # world alignment src(active)->dst(stored):
        # S_cand_cam<-cur_cam = sim^{-1}; S_dst<-src = T_wc_cand ∘ sim^{-1} ∘ T_cw_cur
        R_s, t_s, s_s = (np.asarray(sim.R), np.asarray(sim.t), float(sim.s))
        R_cur = np.asarray(state.kf_R[kf_id])
        t_cur = np.asarray(state.kf_t[kf_id])
        R_cand = np.asarray(sm.state.kf_R[ci])
        t_cand = np.asarray(sm.state.kf_t[ci])
        # sim maps cand-cam -> cur-cam: x_cur = s R x_cand + t
        # inverse: x_cand = (1/s) R^T (x_cur - t)
        # x_dst = R_cand^T (x_cand_cam - t_cand)  [cand cam -> dst world, SE3]
        # compose: x_dst = R_cand^T((1/s) R_s^T (R_cur x_src + t_cur - t_s) - t_cand)
        Rw = R_cand.T @ R_s.T @ R_cur
        sw = 1.0 / s_s
        tw = R_cand.T @ ((1.0 / s_s) * R_s.T @ (t_cur - t_s)) - R_cand.T @ t_cand
        merged = merge_maps(
            sm.state, state, jnp.int32(sm.n_kf), jnp.int32(sm.n_lm),
            jnp.asarray(Rw), jnp.asarray(tw), jnp.float32(sw),
        )
        self.stored.pop(mi)
        self.n_merges += 1
        return merged, sm.n_kf + n_kf, sm.n_lm + n_lm, sm.n_kf, sm.hists
