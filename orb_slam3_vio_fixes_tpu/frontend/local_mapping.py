"""Local mapping: new-landmark triangulation, duplicate fusion, culling.

TPU-native re-design of the reference's LocalMapping thread stages
(reference: src/LocalMapping.cc — Run pipeline order :83-250,
MapPointCulling :346-385, CreateNewMapPoints :388-712 (epipolar search via
SearchForTriangulation src/ORBmatcher.cc:907 + GeometricTools::Triangulate +
reprojection/parallax/scale gates :613-691), SearchInNeighbors fuse :714-900,
KeyFrameCulling :902-1054).

Re-design: every stage is a fixed-shape batched kernel over the SoA MapState.
Epipolar search is a dense masked Hamming matrix with an essential-matrix
line-distance gate (the BoW feature-vector acceleration of the reference is
replaced by the mask — the full matrix is one MXU/VPU-friendly reduction).
Triangulation is a batched 4x4 eigen-solve. Fusion is a projection match plus
an id-remap gather — the reference's MapPoint::Replace pointer surgery
becomes one vectorized relabel of the observation table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops import image as image_ops
from orb_slam3_vio_fixes_tpu.ops import matching
from orb_slam3_vio_fixes_tpu.ops.triangulate import triangulate_dlt, triangulation_checks
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, in_image, project, unproject


def _epipolar_mask(cam: Camera, R1, t1, R2, t2, uv1, uv2, sigma2_2):
    """Squared epipolar-line distance gate in image 2 for keypoints of image 1
    (reference: ORBmatcher::CheckDistEpipolarLine — dsqr < 3.84 * sigma2 of
    the candidate keypoint's octave)."""
    # relative pose: Xc2 = R21 Xc1 + t21 with T2w * T1w^-1
    R21 = R2 @ R1.T
    t21 = t2 - R21 @ t1
    tx = jnp.array(
        [
            [0.0, -t21[2], t21[1]],
            [t21[2], 0.0, -t21[0]],
            [-t21[1], t21[0], 0.0],
        ]
    )
    E = tx @ R21
    Kinv = jnp.linalg.inv(cam.K)
    F = Kinv.T @ E @ Kinv
    ones1 = jnp.ones((uv1.shape[0], 1), uv1.dtype)
    x1 = jnp.concatenate([uv1, ones1], axis=-1)
    lines = x1 @ F.T  # (N1, 3) epipolar lines in image 2
    ones2 = jnp.ones((uv2.shape[0], 1), uv2.dtype)
    x2 = jnp.concatenate([uv2, ones2], axis=-1)
    num = (lines @ x2.T) ** 2  # (N1, N2)
    den = lines[:, 0:1] ** 2 + lines[:, 1:2] ** 2
    dsqr = num / jnp.maximum(den, 1e-12)
    return dsqr < 3.84 * sigma2_2[None, :]


class LocalMapConfig:
    """Static knobs (hashable for jit static args)."""

    def __init__(self, n_neighbors=4, new_lm_budget=512, n_levels=8, scale=1.2,
                 width=752, height=480, cull_min_obs=2, cull_grace_kfs=2,
                 fuse_radius=3.0, kf_cull_redundancy=0.9):
        self.n_neighbors = n_neighbors
        self.new_lm_budget = new_lm_budget
        self.n_levels = n_levels
        self.scale = scale
        self.width = width
        self.height = height
        self.cull_min_obs = cull_min_obs
        self.cull_grace_kfs = cull_grace_kfs
        self.fuse_radius = fuse_radius
        self.kf_cull_redundancy = kf_cull_redundancy

    def _key(self):
        return (self.n_neighbors, self.new_lm_budget, self.n_levels, self.scale,
                self.width, self.height, self.cull_min_obs, self.cull_grace_kfs,
                self.fuse_radius, self.kf_cull_redundancy)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, LocalMapConfig) and self._key() == other._key()


def create_new_landmarks_impl(
    state: ms.MapState,
    kf_id,             # scalar int32 — the newly inserted keyframe
    neighbor_ids,      # (W,) int32 covisible keyframe ids (-1 pad)
    n_lm,              # scalar int32 — current landmark count (alloc cursor)
    cam: Camera,
    bf,
    cfg: LocalMapConfig,
):
    """Triangulate new landmarks between the new keyframe and its covisible
    neighbors (reference: LocalMapping::CreateNewMapPoints
    src/LocalMapping.cc:388-712).

    Sequential passes over the (static, small) neighbor list: each pass only
    considers still-unbound features, so a feature triangulated against the
    best neighbor is not re-created against the next one.

    Returns (state, n_created).
    """
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    sf = image_ops.scale_factors(cfg.n_levels, cfg.scale)
    s2 = sf * sf
    k = jnp.clip(kf_id, 0, K - 1)

    R1 = state.kf_R[k]
    t1 = state.kf_t[k]
    uv1 = state.kf_uv[k]
    desc1 = state.kf_desc[k]
    oct1 = state.kf_octave[k]
    fv1 = state.kf_feat_valid[k]
    baseline = bf / cam.fx

    def one_neighbor(state, n_lm, nb):
        nb_ok = (nb >= 0) & state.kf_valid[jnp.clip(nb, 0, K - 1)]
        n = jnp.clip(nb, 0, K - 1)
        R2 = state.kf_R[n]
        t2 = state.kf_t[n]
        uv2 = state.kf_uv[n]
        desc2 = state.kf_desc[n]
        oct2 = state.kf_octave[n]
        fv2 = state.kf_feat_valid[n]
        obs1 = state.kf_obs[k]
        obs2 = state.kf_obs[n]

        # baseline check (reference :430-446): skip neighbors closer than the
        # stereo baseline (mono: medianDepthRatio — stereo rule used here)
        C1 = -R1.T @ t1
        C2 = -R2.T @ t2
        base_ok = jnp.linalg.norm(C2 - C1) > baseline

        # dense epipolar-constrained Hamming match over unbound features
        dist = matching.hamming_matrix(desc1, desc2)
        epi = _epipolar_mask(cam, R1, t1, R2, t2, uv1, uv2,
                             s2[jnp.clip(oct2, 0, cfg.n_levels - 1)])
        free1 = fv1 & (obs1 < 0)
        free2 = fv2 & (obs2 < 0)
        mask = epi & free1[:, None] & free2[None, :] & nb_ok & base_ok
        best_idx, best, second = matching.masked_best2(dist, mask)
        ok = best <= matching.TH_LOW
        ok &= matching.mutual_filter(best_idx, best, dist, mask)

        j = jnp.clip(best_idx, 0, N - 1)
        ray1 = unproject(cam, uv1)
        ray2 = unproject(cam, uv2[j])
        Xw = triangulate_dlt(
            jnp.broadcast_to(R1, (N, 3, 3)), jnp.broadcast_to(t1, (N, 3)),
            jnp.broadcast_to(R2, (N, 3, 3)), jnp.broadcast_to(t2, (N, 3)),
            ray1, ray2,
        )
        good = triangulation_checks(
            cam,
            jnp.broadcast_to(R1, (N, 3, 3)), jnp.broadcast_to(t1, (N, 3)),
            jnp.broadcast_to(R2, (N, 3, 3)), jnp.broadcast_to(t2, (N, 3)),
            uv1, uv2[j], Xw, oct1, oct2[j], sf, s2,
        )
        is_new = ok & good

        # allocate slots for accepted points
        slot_off = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        budget_ok = slot_off < cfg.new_lm_budget
        cap_ok = (n_lm + slot_off) < (L - 1)
        is_new &= budget_ok & cap_ok
        slots = jnp.where(is_new, n_lm + slot_off, L - 1).astype(jnp.int32)

        d = Xw - C1[None]
        dn = jnp.linalg.norm(d, axis=-1)
        normal = d / jnp.maximum(dn[:, None], 1e-9)
        lvl_sf = sf[jnp.clip(oct1, 0, cfg.n_levels - 1)]
        maxdist = dn * lvl_sf
        mindist = maxdist / sf[-1]
        state = ms.add_landmarks(
            state, slots, Xw, desc1, normal, mindist, maxdist, kf_id, is_new
        )
        # bind observations in BOTH keyframes. The neighbor-side write must
        # redirect non-created rows to a dead slot: scattering the old value
        # back at a clipped index races a real write to the same index
        # (duplicate-index scatter order is unspecified).
        new_obs1 = jnp.where(is_new, slots, state.kf_obs[k])
        state = state._replace(kf_obs=state.kf_obs.at[k].set(new_obs1))
        row2 = jnp.concatenate([state.kf_obs[n], jnp.full(1, -1, jnp.int32)])
        jj = jnp.where(is_new, j, N)
        row2 = row2.at[jj].set(jnp.where(is_new, slots, -1))[:N]
        state = state._replace(kf_obs=state.kf_obs.at[n].set(
            jnp.where(nb_ok, row2, state.kf_obs[n])))
        n_lm = n_lm + jnp.sum(is_new.astype(jnp.int32))
        return state, n_lm

    n0 = n_lm
    for w in range(cfg.n_neighbors):
        state, n_lm = one_neighbor(state, n_lm, neighbor_ids[w])
    # stats for the new landmarks were computed inline per pass; the
    # once-per-cycle full refresh happens at the end of fuse_duplicates
    return state._replace(epoch=state.epoch + 1), n_lm - n0


create_new_landmarks = functools.partial(jax.jit, static_argnames=("cfg",),
                                         donate_argnums=(0,))(
    create_new_landmarks_impl)


def fuse_duplicates_impl(
    state: ms.MapState,
    kf_id,
    neighbor_ids,      # (W,) int32
    cam: Camera,
    cfg: LocalMapConfig,
):
    """Fuse duplicated landmarks between the new keyframe and its neighbors
    (reference: LocalMapping::SearchInNeighbors src/LocalMapping.cc:714-900 +
    ORBmatcher::Fuse src/ORBmatcher.cc:1148).

    For each neighbor: project the new KF's landmarks into it; where the
    matched feature is already bound to a DIFFERENT landmark, the two are
    duplicates — merge into the lower id (vectorized MapPoint::Replace via an
    id-remap gather over the whole observation table); where the feature is
    free, bind it (new observation).
    """
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    sf = image_ops.scale_factors(cfg.n_levels, cfg.scale)
    k = jnp.clip(kf_id, 0, K - 1)
    obs_k = state.kf_obs[k]
    lm_ids = jnp.clip(obs_k, 0, L - 1)
    has = (obs_k >= 0) & state.lm_valid[lm_ids] & state.kf_feat_valid[k]
    X = state.lm_pos[lm_ids]
    desc = state.lm_desc[lm_ids]

    remap = jnp.arange(L, dtype=jnp.int32)
    lm_valid = state.lm_valid

    for w in range(cfg.n_neighbors):
        nb = neighbor_ids[w]
        nb_ok = (nb >= 0) & state.kf_valid[jnp.clip(nb, 0, K - 1)]
        n = jnp.clip(nb, 0, K - 1)
        Rn = state.kf_R[n]
        tn = state.kf_t[n]
        Xc = jnp.einsum("ij,mj->mi", Rn, X) + tn
        uvp = project(cam, Xc)
        z = Xc[:, 2]
        Cn = -Rn.T @ tn
        dist = jnp.linalg.norm(X - Cn[None], axis=-1)
        vis = has & nb_ok & (z > 0) & in_image(uvp, cfg.width, cfg.height)
        vis &= (dist >= 0.8 * state.lm_mindist[lm_ids]) & (
            dist <= 1.2 * state.lm_maxdist[lm_ids])
        ratio = jnp.maximum(state.lm_maxdist[lm_ids] / jnp.maximum(dist, 1e-9), 1e-9)
        octv = jnp.clip(
            jnp.ceil(jnp.log(ratio) / jnp.log(cfg.scale)).astype(jnp.int32),
            0, cfg.n_levels - 1)
        radius = cfg.fuse_radius * sf[octv]
        res = matching.search_by_projection(
            uvp, vis, desc, octv, radius,
            state.kf_uv[n], state.kf_feat_valid[n], state.kf_desc[n],
            state.kf_octave[n],
            max_dist=matching.TH_LOW,
        )
        matched = res.idx >= 0
        j = jnp.clip(res.idx, 0, N - 1)
        tgt_obs = state.kf_obs[n][j]                  # landmark bound at match
        dup = matched & (tgt_obs >= 0) & (tgt_obs != obs_k)
        free = matched & (tgt_obs < 0)
        # merge duplicates into the smaller id (older landmark wins, like the
        # reference which keeps the more-observed point)
        a = jnp.where(dup, jnp.minimum(obs_k, tgt_obs), 0)
        b = jnp.where(dup, jnp.maximum(obs_k, tgt_obs), 0)
        remap = remap.at[jnp.where(dup, b, L - 1)].set(
            jnp.where(dup, a, remap[L - 1]))
        lm_valid = lm_valid.at[jnp.where(dup, b, L - 1)].set(
            jnp.where(dup, False, lm_valid[L - 1]))
        # bind free features of the neighbor to our landmark (dead-slot
        # redirect for non-matches — see create_new_landmarks)
        row = jnp.concatenate([state.kf_obs[n], jnp.full(1, -1, jnp.int32)])
        jj = jnp.where(free, j, N)
        row = row.at[jj].set(jnp.where(free, obs_k, -1))[:N]
        state = state._replace(kf_obs=state.kf_obs.at[n].set(
            jnp.where(nb_ok, row, state.kf_obs[n])))

    # one global relabel pass (duplicate chains: follow remap twice — depth>2
    # chains are rare within one fuse call and resolve next call)
    remap = remap[remap]
    obs = state.kf_obs
    relabeled = jnp.where(obs >= 0, remap[jnp.clip(obs, 0, L - 1)], obs)
    state = state._replace(
        kf_obs=relabeled, lm_valid=lm_valid, epoch=state.epoch + 1
    )
    return ms.update_landmark_stats(state, cfg.n_levels, cfg.scale)


fuse_duplicates = functools.partial(jax.jit, static_argnames=("cfg",),
                                    donate_argnums=(0,))(fuse_duplicates_impl)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def cull_landmarks(state: ms.MapState, n_kf, cfg: LocalMapConfig,
                   recent_slots=None):
    """Remove weak landmarks (reference: LocalMapping::MapPointCulling
    src/LocalMapping.cc:346-385 — found/visible ratio < 0.25, or still
    under-observed `cull_grace_kfs` keyframes after creation).

    Here: a landmark created more than `cull_grace_kfs` keyframes ago must be
    observed by >= cull_min_obs keyframes. With keyframe-slot reuse the slot
    id no longer encodes age, so pass `recent_slots` — the last
    cull_grace_kfs keyframe SLOTS (temporal order) — and a landmark is young
    iff its anchor keyframe is among them; without it, the contiguous-id
    rule applies.
    """
    n_obs = ms.landmark_obs_count(state)
    if recent_slots is None:
        old_enough = state.lm_first_kf <= (n_kf - 1 - cfg.cull_grace_kfs)
    else:
        K = state.kf_R.shape[0]
        young_kf = jnp.zeros(K, bool).at[
            jnp.clip(recent_slots, 0, K - 1)].max(recent_slots >= 0)
        old_enough = ~young_kf[
            jnp.clip(state.lm_first_kf, 0, K - 1)] & (state.lm_first_kf >= 0)
    weak = state.lm_valid & old_enough & (n_obs < cfg.cull_min_obs)
    ratio = state.lm_found / jnp.maximum(state.lm_visible, 1.0)
    weak |= state.lm_valid & (state.lm_visible > 8.0) & (ratio < 0.25)
    lm_valid = state.lm_valid & ~weak
    # unbind dead landmarks from all observation rows
    L = state.lm_pos.shape[0]
    obs = state.kf_obs
    dead = ~lm_valid[jnp.clip(obs, 0, L - 1)] & (obs >= 0)
    return state._replace(
        lm_valid=lm_valid,
        kf_obs=jnp.where(dead, -1, obs),
        epoch=state.epoch + 1,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def redundant_keyframes(state: ms.MapState, protect_ids, cfg: LocalMapConfig):
    """Flag redundant keyframes (reference: LocalMapping::KeyFrameCulling
    src/LocalMapping.cc:902-1054 — a KF is redundant when >=90% of its
    landmarks are observed by >=3 other keyframes at same-or-finer scale;
    scale refinement is dropped here: >=4 total observers).

    Returns a (K,) bool mask of cullable keyframes. The caller decides which
    to actually remove (the reference also protects the spanning tree /
    inertial chain).
    """
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    n_obs = ms.landmark_obs_count(state)     # (L,)
    obs = state.kf_obs
    bound = (obs >= 0) & state.kf_feat_valid & state.kf_valid[:, None]
    well_obs = bound & (n_obs[jnp.clip(obs, 0, L - 1)] >= 4)
    n_bound = bound.sum(-1)
    n_well = well_obs.sum(-1)
    redundant = state.kf_valid & (
        n_well.astype(jnp.float32)
        > cfg.kf_cull_redundancy * jnp.maximum(n_bound, 1).astype(jnp.float32)
    ) & (n_bound > 0)
    prot = jnp.zeros(K, bool).at[jnp.clip(protect_ids, 0, K - 1)].max(
        protect_ids >= 0)
    return redundant & ~prot
