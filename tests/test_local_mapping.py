"""Unit tests for local mapping: triangulation, fusion, culling.

Reference semantics under test: LocalMapping::CreateNewMapPoints
(src/LocalMapping.cc:388-712), SearchInNeighbors/Fuse (:714-900),
MapPointCulling (:346-385), KeyFrameCulling (:902-1054).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.frontend import local_mapping as lmm
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project
from orb_slam3_vio_fixes_tpu.utils import lie

CAM = Camera.pinhole(300.0, 300.0, 160.0, 120.0)
W, H = 320, 240


def _cfg(**kw):
    kw.setdefault("n_neighbors", 2)
    kw.setdefault("width", W)
    kw.setdefault("height", H)
    kw.setdefault("n_levels", 4)
    return lmm.LocalMapConfig(**kw)


def _make_state(n_feat=64, n_kf=4, n_lm=256):
    return ms.empty(ms.MapConfig(max_keyframes=n_kf, max_landmarks=n_lm,
                                 max_features=n_feat, n_levels=4))


def _insert_kf(state, kf_id, R, t, uv, desc, obs=None, prev=-1, depth=None):
    n = uv.shape[0]
    N = state.kf_uv.shape[1]
    pad = N - n
    uv = jnp.concatenate([jnp.asarray(uv, jnp.float32), jnp.zeros((pad, 2))])
    desc = jnp.concatenate([jnp.asarray(desc, jnp.uint32), jnp.zeros((pad, 8), jnp.uint32)])
    valid = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    if obs is None:
        obs_full = jnp.full(N, -1, jnp.int32)
    else:
        obs_full = jnp.concatenate([jnp.asarray(obs, jnp.int32), jnp.full(pad, -1, jnp.int32)])
    d = jnp.full(N, -1.0) if depth is None else jnp.concatenate(
        [jnp.asarray(depth, jnp.float32), jnp.full(pad, -1.0)])
    return ms.insert_keyframe(
        state, jnp.int32(kf_id), jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.float32(kf_id), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.int32(prev),
        uv, jnp.full(N, -1.0), jnp.zeros(N, jnp.int32), jnp.zeros(N), desc, valid,
        obs_full, d,
    )


def test_triangulation_creates_accurate_points(rng):
    """Two keyframes with a wide baseline: unbound matching features should
    triangulate back to the ground-truth 3D points."""
    n = 48
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4.0, 8.0, n)], 1).astype(np.float32)
    R0, t0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    R1 = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0], jnp.float32)))
    C1 = np.array([0.6, 0.0, 0.0], np.float32)
    t1 = -R1 @ C1
    uv0 = np.asarray(project(CAM, jnp.asarray(X)))
    uv1 = np.asarray(project(CAM, jnp.asarray(X @ R1.T + t1)))
    inb = ((uv0 > 8).all(1) & (uv0 < [W - 8, H - 8]).all(1)
           & (uv1 > 8).all(1) & (uv1 < [W - 8, H - 8]).all(1))
    desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)

    state = _make_state()
    state = _insert_kf(state, 0, R0, t0, uv0, desc)
    state = _insert_kf(state, 1, R1, t1, uv1, desc, prev=0)

    nbrs = jnp.asarray([0, -1], jnp.int32)
    state, n_new = lmm.create_new_landmarks(
        state, jnp.int32(1), nbrs, jnp.int32(0), CAM, jnp.float32(30.0), _cfg()
    )
    n_new = int(n_new)
    assert n_new >= int(inb.sum()) * 0.8, f"only {n_new} of {inb.sum()} triangulated"
    # every created landmark should be near its ground-truth point
    obs1 = np.asarray(state.kf_obs[1])
    created = obs1[:n] >= 0
    lm = np.asarray(state.lm_pos)[obs1[:n][created]]
    err = np.linalg.norm(lm - X[created], axis=1)
    assert np.median(err) < 0.02, f"median triangulation error {np.median(err)}"
    # observations bound in BOTH keyframes
    obs0 = np.asarray(state.kf_obs[0])
    assert (obs0[:n] >= 0).sum() >= n_new


def test_triangulation_respects_budget():
    rng = np.random.default_rng(3)
    n = 48
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(4.0, 8.0, n)], 1).astype(np.float32)
    R0, t0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    R1 = np.eye(3, dtype=np.float32)
    t1 = -R1 @ np.array([0.6, 0.0, 0.0], np.float32)
    uv0 = np.asarray(project(CAM, jnp.asarray(X)))
    uv1 = np.asarray(project(CAM, jnp.asarray(X @ R1.T + t1)))
    desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    state = _make_state()
    state = _insert_kf(state, 0, R0, t0, uv0, desc)
    state = _insert_kf(state, 1, R1, t1, uv1, desc, prev=0)
    state, n_new = lmm.create_new_landmarks(
        state, jnp.int32(1), jnp.asarray([0, -1], jnp.int32), jnp.int32(0),
        CAM, jnp.float32(30.0), _cfg(new_lm_budget=10),
    )
    assert int(n_new) <= 10


def test_fuse_merges_duplicates(rng):
    """Two landmarks at the same 3D position observed by two keyframes should
    merge into the lower id, with all observations relabeled."""
    X = np.array([[0.5, 0.2, 5.0]], np.float32)
    desc = rng.integers(0, 2**32, size=(1, 8), dtype=np.uint32)
    R0, t0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    R1 = np.eye(3, dtype=np.float32)
    t1 = -R1 @ np.array([0.3, 0.0, 0.0], np.float32)
    uv0 = np.asarray(project(CAM, jnp.asarray(X)))
    uv1 = np.asarray(project(CAM, jnp.asarray(X @ R1.T + t1)))

    state = _make_state()
    state = _insert_kf(state, 0, R0, t0, uv0, desc, obs=np.array([0]))
    state = _insert_kf(state, 1, R1, t1, uv1, desc, obs=np.array([1]), prev=0)
    slots = jnp.asarray([0, 1], jnp.int32)
    pos = jnp.asarray(np.concatenate([X, X]), jnp.float32)
    dd = jnp.asarray(np.concatenate([desc, desc]), jnp.uint32)
    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
    state = ms.add_landmarks(
        state, slots, pos, dd, nrm, jnp.asarray([1.0, 1.0]),
        jnp.asarray([6.0, 6.0]), jnp.int32(0), jnp.ones(2, bool),
    )
    state = lmm.fuse_duplicates(
        state, jnp.int32(1), jnp.asarray([0, -1], jnp.int32), CAM, _cfg()
    )
    lm_valid = np.asarray(state.lm_valid)
    assert lm_valid[0] and not lm_valid[1], "duplicate not merged"
    assert int(state.kf_obs[1, 0]) == 0, "observation not relabeled to survivor"
    assert int(state.kf_obs[0, 0]) == 0


def test_cull_underobserved_landmarks(rng):
    state = _make_state()
    desc = rng.integers(0, 2**32, size=(2, 8), dtype=np.uint32)
    uv = np.array([[100.0, 100.0], [150.0, 120.0]], np.float32)
    # kf0 observes lm0 and lm1; kf1/kf2 observe only lm1
    state = _insert_kf(state, 0, np.eye(3), np.zeros(3), uv, desc, obs=np.array([0, 1]))
    state = _insert_kf(state, 1, np.eye(3), np.zeros(3), uv, desc, obs=np.array([-1, 1]))
    state = _insert_kf(state, 2, np.eye(3), np.zeros(3), uv, desc, obs=np.array([-1, 1]))
    state = ms.add_landmarks(
        state, jnp.asarray([0, 1], jnp.int32),
        jnp.asarray([[0, 0, 5.0], [1, 0, 5.0]], jnp.float32),
        jnp.asarray(desc, jnp.uint32), jnp.tile(jnp.asarray([[0.0, 0, 1.0]]), (2, 1)),
        jnp.asarray([0.1, 0.1]), jnp.asarray([50.0, 50.0]), jnp.int32(0),
        jnp.ones(2, bool),
    )
    state = lmm.cull_landmarks(state, jnp.int32(3), _cfg(cull_min_obs=2, cull_grace_kfs=2))
    lm_valid = np.asarray(state.lm_valid)
    assert not lm_valid[0], "single-observation old landmark should be culled"
    assert lm_valid[1], "well-observed landmark should survive"
    assert int(state.kf_obs[0, 0]) == -1, "culled landmark still bound"


def test_redundant_keyframe_detection(rng):
    state = _make_state(n_feat=64, n_kf=8, n_lm=256)
    n = 20
    desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    uv = rng.uniform(20, 200, size=(n, 2)).astype(np.float32)
    obs = np.arange(n)
    # 5 keyframes all observing the same n landmarks -> middle ones redundant
    for k in range(5):
        state = _insert_kf(state, k, np.eye(3), np.zeros(3), uv, desc, obs=obs)
    state = ms.add_landmarks(
        state, jnp.asarray(obs, jnp.int32),
        jnp.asarray(rng.uniform(-1, 1, (n, 3)) + [0, 0, 5.0], jnp.float32),
        jnp.asarray(desc, jnp.uint32),
        jnp.tile(jnp.asarray([[0.0, 0, 1.0]]), (n, 1)),
        jnp.full(n, 0.1), jnp.full(n, 50.0), jnp.int32(0), jnp.ones(n, bool),
    )
    protect = jnp.asarray([0, 4, -1, -1], jnp.int32)
    red = np.asarray(lmm.redundant_keyframes(state, protect, _cfg()))
    assert red[1] and red[2] and red[3]
    assert not red[0] and not red[4], "protected keyframes must not be flagged"
