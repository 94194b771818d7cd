"""Map state: fixed-capacity SoA arrays for keyframes + landmarks.

TPU-native replacement for the reference's pointer-graph map model
(reference: src/KeyFrame.cc / src/MapPoint.cc / src/Map.cc — mutex-guarded
objects with observation dictionaries, covisibility edge lists and a spanning
tree). Re-design (SURVEY.md §7): one immutable pytree of dense arrays with
validity masks; an epoch counter replaces the reference's map-change indices
(src/Map.cc:335-357) as the consistency mechanism between pipeline actors.

Key layout insight: the reference's MapPoint::mObservations (landmark ->
(keyframe, feature-index)) is stored INVERTED here as `kf_obs[k, i] =
landmark id observed by feature i of keyframe k` (-1 if none). That single
(K, N) int array *is* the factor list for bundle adjustment, the source of
the covisibility graph (one MXU matmul), and the observation store — no
dictionaries, no locks.

Capacities are static (jit specialization); overflow is handled by the host
orchestrator choosing bigger tiers (recompile) — same trade the reference
makes with its per-dataset feature counts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapConfig(NamedTuple):
    max_keyframes: int = 256
    max_landmarks: int = 32768
    max_features: int = 1536      # feature slots per keyframe
    n_levels: int = 8
    scale: float = 1.2


class MapState(NamedTuple):
    """All arrays fixed-capacity; `*_valid` masks define existence.

    Keyframe block (K = max_keyframes):
      kf_R, kf_t:  (K,3,3),(K,3) — T_cw (world->camera), reference convention
      kf_ts:       (K,) timestamps
      kf_vel:      (K,3) world-frame velocity (inertial)
      kf_bg/kf_ba: (K,3) gyro/acc bias
      kf_prev:     (K,) temporal predecessor id (-1 none) — the inertial
                   chain mPrevKF (include/KeyFrame.h:306+)
      kf_valid:    (K,) bool

    Feature block (N = max_features per KF):
      kf_uv:(K,N,2) kf_ur:(K,N) kf_octave:(K,N) kf_angle:(K,N)
      kf_desc:(K,N,8) uint32  kf_feat_valid:(K,N)
      kf_obs:(K,N) int32 — landmark id per feature (-1 unbound)
      kf_depth:(K,N) — stereo/RGBD depth (<=0 unknown)

    Landmark block (L = max_landmarks):
      lm_pos:(L,3) lm_valid:(L,) lm_desc:(L,8) — distinctive descriptor
      lm_normal:(L,3) viewing direction; lm_mindist/lm_maxdist scale range
      lm_first_kf:(L,) creating KF id (culling bookkeeping,
        src/LocalMapping.cc:346-385)
      lm_found/lm_visible:(L,) found/visible counters (src/MapPoint.cc:311-327)

    epoch: scalar int32 — bumped by every structural commit; actors compare
    epochs instead of taking Map::mMutexMapUpdate.
    """

    kf_R: jax.Array
    kf_t: jax.Array
    kf_ts: jax.Array
    kf_vel: jax.Array
    kf_bg: jax.Array
    kf_ba: jax.Array
    kf_prev: jax.Array
    kf_valid: jax.Array

    kf_uv: jax.Array
    kf_ur: jax.Array
    kf_octave: jax.Array
    kf_angle: jax.Array
    kf_desc: jax.Array
    kf_feat_valid: jax.Array
    kf_obs: jax.Array
    kf_depth: jax.Array

    lm_pos: jax.Array
    lm_valid: jax.Array
    lm_desc: jax.Array
    lm_normal: jax.Array
    lm_mindist: jax.Array
    lm_maxdist: jax.Array
    lm_first_kf: jax.Array
    lm_found: jax.Array
    lm_visible: jax.Array

    epoch: jax.Array


def empty(cfg: MapConfig) -> MapState:
    K, L, N = cfg.max_keyframes, cfg.max_landmarks, cfg.max_features
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_R=jnp.tile(jnp.eye(3, dtype=f32), (K, 1, 1)),
        kf_t=jnp.zeros((K, 3), f32),
        kf_ts=jnp.zeros(K, f32),
        kf_vel=jnp.zeros((K, 3), f32),
        kf_bg=jnp.zeros((K, 3), f32),
        kf_ba=jnp.zeros((K, 3), f32),
        kf_prev=jnp.full(K, -1, i32),
        kf_valid=jnp.zeros(K, bool),
        kf_uv=jnp.zeros((K, N, 2), f32),
        kf_ur=jnp.full((K, N), -1.0, f32),
        kf_octave=jnp.zeros((K, N), i32),
        kf_angle=jnp.zeros((K, N), f32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_obs=jnp.full((K, N), -1, i32),
        kf_depth=jnp.full((K, N), -1.0, f32),
        lm_pos=jnp.zeros((L, 3), f32),
        lm_valid=jnp.zeros(L, bool),
        lm_desc=jnp.zeros((L, 8), jnp.uint32),
        lm_normal=jnp.zeros((L, 3), f32),
        lm_mindist=jnp.zeros(L, f32),
        lm_maxdist=jnp.full(L, 1e9, f32),
        lm_first_kf=jnp.full(L, -1, i32),
        lm_found=jnp.ones(L, f32),
        lm_visible=jnp.ones(L, f32),
        epoch=jnp.int32(0),
    )


@jax.jit
def insert_keyframe(
    state: MapState,
    kf_id: jax.Array,
    R, t, ts, vel, bg, ba, prev_id,
    uv, ur, octave, angle, desc, feat_valid, obs, depth,
) -> MapState:
    """Write one keyframe slot (functional; donate for in-place updates)."""
    return state._replace(
        kf_R=state.kf_R.at[kf_id].set(R),
        kf_t=state.kf_t.at[kf_id].set(t),
        kf_ts=state.kf_ts.at[kf_id].set(ts),
        kf_vel=state.kf_vel.at[kf_id].set(vel),
        kf_bg=state.kf_bg.at[kf_id].set(bg),
        kf_ba=state.kf_ba.at[kf_id].set(ba),
        kf_prev=state.kf_prev.at[kf_id].set(prev_id),
        kf_valid=state.kf_valid.at[kf_id].set(True),
        kf_uv=state.kf_uv.at[kf_id].set(uv),
        kf_ur=state.kf_ur.at[kf_id].set(ur),
        kf_octave=state.kf_octave.at[kf_id].set(octave),
        kf_angle=state.kf_angle.at[kf_id].set(angle),
        kf_desc=state.kf_desc.at[kf_id].set(desc),
        kf_feat_valid=state.kf_feat_valid.at[kf_id].set(feat_valid),
        kf_obs=state.kf_obs.at[kf_id].set(obs),
        kf_depth=state.kf_depth.at[kf_id].set(depth),
        epoch=state.epoch + 1,
    )


@jax.jit
def add_landmarks(
    state: MapState,
    slots: jax.Array,       # (M,) int32 target landmark ids
    pos: jax.Array,         # (M, 3)
    desc: jax.Array,        # (M, 8)
    normal: jax.Array,      # (M, 3)
    mindist: jax.Array,
    maxdist: jax.Array,
    first_kf: jax.Array,    # scalar or (M,)
    valid: jax.Array,       # (M,) bool — which rows to actually write
) -> MapState:
    """Batch-allocate landmarks into given slots (invalid rows write nothing
    by scattering into a dead slot L-1... we instead predicate with where)."""
    L = state.lm_pos.shape[0]
    safe = jnp.where(valid, slots, L - 1)
    # Write valid rows; the dead slot (L-1) is reserved as scratch.
    first_kf = jnp.broadcast_to(first_kf, slots.shape)
    st = state._replace(
        lm_pos=state.lm_pos.at[safe].set(jnp.where(valid[:, None], pos, state.lm_pos[safe])),
        lm_desc=state.lm_desc.at[safe].set(
            jnp.where(valid[:, None], desc, state.lm_desc[safe])
        ),
        lm_normal=state.lm_normal.at[safe].set(
            jnp.where(valid[:, None], normal, state.lm_normal[safe])
        ),
        lm_mindist=state.lm_mindist.at[safe].set(
            jnp.where(valid, mindist, state.lm_mindist[safe])
        ),
        lm_maxdist=state.lm_maxdist.at[safe].set(
            jnp.where(valid, maxdist, state.lm_maxdist[safe])
        ),
        lm_first_kf=state.lm_first_kf.at[safe].set(
            jnp.where(valid, first_kf, state.lm_first_kf[safe])
        ),
        lm_valid=state.lm_valid.at[safe].set(
            jnp.where(valid, True, state.lm_valid[safe])
        ),
        epoch=state.epoch + 1,
    )
    return st


def observation_matrix(state: MapState) -> jax.Array:
    """(K, L) bool — keyframe k observes landmark l. One scatter."""
    K = state.kf_obs.shape[0]
    L = state.lm_pos.shape[0]
    obs = jnp.where(state.kf_feat_valid & state.kf_valid[:, None], state.kf_obs, -1)
    flat_k = jnp.repeat(jnp.arange(K), state.kf_obs.shape[1])
    flat_l = obs.reshape(-1)
    good = flat_l >= 0
    ind = jnp.zeros((K, L), bool)
    return ind.at[flat_k, jnp.where(good, flat_l, 0)].max(good)


@jax.jit
def covisibility(state: MapState) -> jax.Array:
    """(K, K) int32 — shared-landmark counts between keyframes (the
    covisibility graph, reference: KeyFrame::UpdateConnections
    src/KeyFrame.cc:379-470). Dense matmul on the MXU instead of hash-map
    counting."""
    ind = observation_matrix(state).astype(jnp.float32)
    cov = ind @ ind.T
    cov = cov * (1.0 - jnp.eye(cov.shape[0]))
    return cov.astype(jnp.int32)


@jax.jit
def landmark_obs_count(state: MapState) -> jax.Array:
    """(L,) int32 — number of keyframes observing each landmark."""
    return observation_matrix(state).sum(0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_levels", "scale"))
def update_landmark_stats(state: MapState, n_levels: int = 8,
                          scale: float = 1.2) -> MapState:
    """Recompute landmark normals, scale-invariance distances, and
    representative descriptors from current observations.

    Reference semantics: MapPoint::UpdateNormalAndDepth (src/MapPoint.cc:
    426-494) — normal = mean of directions from observing camera centers;
    distance range from the reference KF's octave; ComputeDistinctiveDescriptors
    (src/MapPoint.cc:329-403) — descriptor with min median Hamming to the
    others. Here: batched over ALL landmarks at once; the "median" is
    replaced by min *mean* Hamming (same argmin in practice, one matmul-like
    reduction instead of per-point sorting).
    """
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    obs = jnp.where(state.kf_feat_valid & state.kf_valid[:, None], state.kf_obs, -1)
    flat_l = obs.reshape(-1)
    good = flat_l >= 0
    tgt = jnp.where(good, flat_l, L - 1)

    # camera centers: C = -R^T t; per-observation viewing directions (flat)
    C = -jnp.einsum("kji,kj->ki", state.kf_R, state.kf_t)  # (K,3)
    cam_of_obs = jnp.repeat(jnp.arange(K), N)
    d = state.lm_pos[tgt] - C[cam_of_obs]
    d_norm = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    normal_sum = jnp.zeros((L, 3)).at[tgt].add(jnp.where(good[:, None], d_norm, 0.0))
    cnt = jnp.zeros(L).at[tgt].add(good.astype(jnp.float32))
    normal = normal_sum / jnp.maximum(cnt[:, None], 1.0)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # scale range from mean observation distance + octave
    dist = jnp.linalg.norm(d, axis=-1)
    oct_flat = state.kf_octave.reshape(-1)
    sf = scale ** oct_flat.astype(jnp.float32)
    level_dist = dist * sf  # distance normalized to level-0 (max dist)
    maxd_sum = jnp.zeros(L).at[tgt].add(jnp.where(good, level_dist, 0.0))
    maxdist = maxd_sum / jnp.maximum(cnt, 1.0)
    mindist = maxdist / (scale ** (n_levels - 1))

    keep = state.lm_valid
    return state._replace(
        lm_normal=jnp.where(keep[:, None], normal, state.lm_normal),
        lm_maxdist=jnp.where(keep, jnp.maximum(maxdist, 1e-6), state.lm_maxdist),
        lm_mindist=jnp.where(keep, mindist, state.lm_mindist),
    )


@jax.jit
def excise_keyframes(state: MapState, cull_ids: jax.Array) -> MapState:
    """Remove keyframes (reference: KeyFrame::SetBadFlag
    src/KeyFrame.cc:573-679 — graph excision + observation unbinding; the
    spanning-tree child re-parenting is subsumed by kf_prev chain splicing
    and the covisibility graph being recomputed from kf_obs on demand).

    cull_ids: (C,) int32 keyframe slots to remove (-1 = no-op pad).
    Landmarks anchored at a culled keyframe (lm_first_kf) are re-anchored to
    their first remaining observer so loop corrections still move them.
    """
    K, N = state.kf_obs.shape
    L = state.lm_pos.shape[0]
    safe = jnp.clip(cull_ids, 0, K - 1)
    doit = cull_ids >= 0
    kf_valid = state.kf_valid.at[safe].set(
        jnp.where(doit, False, state.kf_valid[safe]))
    dead_row = ~kf_valid[:, None]
    kf_obs = jnp.where(dead_row, -1, state.kf_obs)
    kf_feat_valid = jnp.where(dead_row, False, state.kf_feat_valid)

    # splice the temporal chain: prev pointers THROUGH culled keyframes.
    # One hop is resolved per iteration, so C iterations reach a fixed point
    # for any batch of up to C culled slots, consecutive or not (C is small,
    # the loop unrolls at trace time).
    prev = state.kf_prev
    for _ in range(int(cull_ids.shape[0])):
        p_ok = prev >= 0
        p = jnp.clip(prev, 0, K - 1)
        prev = jnp.where(p_ok & ~kf_valid[p], state.kf_prev[p], prev)

    # re-anchor landmarks whose anchor died: first valid observer
    st2 = state._replace(kf_valid=kf_valid, kf_obs=kf_obs,
                         kf_feat_valid=kf_feat_valid)
    obs_mat = observation_matrix(st2)                    # (K, L)
    first_obs = jnp.argmax(obs_mat, axis=0).astype(jnp.int32)
    has_obs = jnp.any(obs_mat, axis=0)
    anchor = jnp.clip(state.lm_first_kf, 0, K - 1)
    anchor_dead = (state.lm_first_kf >= 0) & ~kf_valid[anchor]
    lm_first_kf = jnp.where(
        anchor_dead, jnp.where(has_obs, first_obs, -1), state.lm_first_kf)
    return st2._replace(kf_prev=prev, lm_first_kf=lm_first_kf,
                        epoch=state.epoch + 1)


def grow_map(state: MapState, old: MapConfig, new: MapConfig) -> MapState:
    """Pad all arrays to a bigger capacity tier (host-side; jitted kernels
    recompile on the new shapes). This is the capacity-doubling promised by
    the module docstring / SURVEY §7 hard-part #1: dynamic map growth on a
    static-shape machine = discrete recompile tiers."""
    import numpy as np

    assert new.max_keyframes >= old.max_keyframes
    assert new.max_landmarks >= old.max_landmarks
    assert new.max_features == old.max_features
    tmpl = empty(new)
    out = {}
    for name in MapState._fields:
        a = np.asarray(getattr(state, name))
        t = np.asarray(getattr(tmpl, name))
        if a.shape == t.shape:
            out[name] = jnp.asarray(a)
            continue
        b = t.copy()
        sl = tuple(slice(0, s) for s in a.shape)
        b[sl] = a
        # the old dead scratch slot (L_old - 1) may carry garbage writes;
        # it is now a live slot in the bigger tier — clear it
        if name.startswith("lm_"):
            b[old.max_landmarks - 1] = t[old.max_landmarks - 1]
        out[name] = jnp.asarray(b)
    out["epoch"] = state.epoch + 1
    return MapState(**out)


def ba_factors_from_map(state: MapState, kf_window: jax.Array, inv_sigma2_per_octave):
    """Build ReprojFactors covering the observations of `kf_window` keyframes.

    kf_window: (W,) int32 keyframe ids (may include invalid/-1 -> masked).
    Returns (pose_idx_local, lm_idx, uvr, inv_sigma2, valid) where
    pose_idx_local indexes into the window (0..W-1).
    """
    W = kf_window.shape[0]
    N = state.kf_obs.shape[1]
    safe_kf = jnp.clip(kf_window, 0, state.kf_obs.shape[0] - 1)
    win_ok = (kf_window >= 0) & state.kf_valid[safe_kf]
    obs = state.kf_obs[safe_kf]          # (W, N)
    fv = state.kf_feat_valid[safe_kf]
    uv = state.kf_uv[safe_kf]
    ur = state.kf_ur[safe_kf]
    octv = state.kf_octave[safe_kf]
    valid = win_ok[:, None] & fv & (obs >= 0)
    pose_idx = jnp.broadcast_to(jnp.arange(W)[:, None], (W, N)).reshape(-1).astype(jnp.int32)
    lm_idx = jnp.clip(obs, 0, state.lm_pos.shape[0] - 1).reshape(-1)
    uvr = jnp.concatenate([uv, ur[..., None]], axis=-1).reshape(-1, 3)
    inv_s2 = inv_sigma2_per_octave[jnp.clip(octv, 0, inv_sigma2_per_octave.shape[0] - 1)]
    return pose_idx, lm_idx, uvr, inv_s2.reshape(-1), valid.reshape(-1)
