"""Global bundle adjustment: matrix-free CG Schur solver + full-map GBA.

Reference semantics under test: Optimizer::GlobalBundleAdjustemnt /
BundleAdjustment (src/Optimizer.cc:52-390) and its invocation from
LoopClosing::CorrectLoop (src/LoopClosing.cc:1199-1207). The reference solves
the reduced camera system with g2o sparse Cholesky; ours uses matrix-free
preconditioned CG (optim/ba_core.schur_cg_solve) — these tests check the CG
path converges to the same optimum as the dense path, and that the MapState
entry points (single-chip + sharded mesh) recover a perturbed map.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.optim import global_ba
from orb_slam3_vio_fixes_tpu.parallel import sharded_ba
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

from tests.test_ba import make_scene, perturb, CAM, BF


def _centers(R, t):
    return -np.einsum("pji,pj->pi", np.asarray(R), np.asarray(t))


def test_cg_matches_dense(rng):
    """solver="cg" must land at the same optimum as the dense Schur path."""
    R_gt, t_gt, pts, factors, _ = make_scene(rng, noise_px=0.0)
    R0, t0 = perturb(rng, R_gt, t_gt, 0.02, 0.05)
    lm0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    problem = ba_core.BAProblem(
        R=jnp.asarray(R0).at[0].set(jnp.asarray(R_gt[0])),
        t=jnp.asarray(t0).at[0].set(jnp.asarray(t_gt[0])),
        pose_fixed=jnp.zeros(6, bool).at[0].set(True),
        lm=jnp.asarray(lm0),
        lm_valid=jnp.ones(pts.shape[0], bool),
        lm_fixed=jnp.zeros(pts.shape[0], bool),
        factors=factors, cam=CAM, bf=BF,
    )
    out_cg, inl_cg, chi2_cg = ba_core.bundle_adjust(
        problem, ba_core.LMConfig(solver="cg", cg_iters=40))
    assert np.asarray(inl_cg).mean() > 0.97
    assert np.median(np.asarray(chi2_cg)) < 1e-2
    C_cg = _centers(out_cg.R, out_cg.t)
    C_gt = _centers(R_gt, t_gt)
    assert np.abs(C_cg - C_gt).max() < 5e-3


def _build_map(rng, K=6, N=48, L=96, noise=0.0):
    """MapState with K keyframes observing a shared cloud of L landmarks."""
    cfg = ms.MapConfig(max_keyframes=K, max_landmarks=L, max_features=N,
                       n_levels=4)
    pts = rng.uniform(-3, 3, size=(L, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(5, 10, L)
    kf_R = np.zeros((K, 3, 3), np.float32)
    kf_t = np.zeros((K, 3), np.float32)
    kf_obs = np.full((K, N), -1, np.int32)
    kf_uv = np.zeros((K, N, 2), np.float32)
    kf_ur = np.full((K, N), -1.0, np.float32)
    for k in range(K):
        w = rng.normal(0, 0.02, 3).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        C = np.array([k * 0.3, 0.0, 0.0], np.float32)
        t = -(R @ C)
        kf_R[k], kf_t[k] = R, t
        for i in range(N):
            lm = (k * 7 + i) % L
            Xc = R @ pts[lm] + t
            uv = np.asarray(project(CAM, jnp.asarray(Xc[None])))[0]
            kf_obs[k, i] = lm
            kf_uv[k, i] = uv + rng.normal(0, noise, 2)
            kf_ur[k, i] = uv[0] - float(BF) / Xc[2]
    state = ms.empty(cfg)._replace(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_valid=jnp.ones(K, bool),
        kf_obs=jnp.asarray(kf_obs), kf_uv=jnp.asarray(kf_uv),
        kf_ur=jnp.asarray(kf_ur),
        kf_feat_valid=jnp.ones((K, N), bool),
        lm_pos=jnp.asarray(pts), lm_valid=jnp.ones(L, bool),
    )
    return state, kf_R.copy(), kf_t.copy(), pts.copy()


def _perturb_map(rng, state, rot=0.01, trans=0.03, lm_sigma=0.03):
    K = state.kf_R.shape[0]
    dw = rng.normal(0, rot, (K, 3)).astype(np.float32)
    dR = np.array(lie.so3_exp(jnp.asarray(dw)))
    dR[0] = np.eye(3)       # keep the gauge anchor at ground truth
    dt = rng.normal(0, trans, (K, 3)).astype(np.float32)
    dt[0] = 0
    return state._replace(
        kf_R=jnp.einsum("pij,pjk->pik", jnp.asarray(dR), state.kf_R),
        kf_t=state.kf_t + jnp.asarray(dt),
        lm_pos=state.lm_pos + jnp.asarray(
            rng.normal(0, lm_sigma, state.lm_pos.shape).astype(np.float32)),
    )


def test_run_global_ba_recovers_map(rng):
    state, R_gt, t_gt, pts = _build_map(rng)
    noisy = _perturb_map(rng, state)
    inv_s2 = jnp.ones(4, jnp.float32)
    K, N = state.kf_obs.shape
    # compute before the call: run_global_ba donates its input state
    multi = np.asarray(ms.landmark_obs_count(state)) >= 2
    out, n_inl = global_ba.run_global_ba(
        noisy, inv_s2, CAM, BF, jnp.int32(0), n_levels=4)
    assert int(n_inl) > 0.9 * K * N
    C_out = _centers(out.kf_R, out.kf_t)
    C_gt = _centers(R_gt, t_gt)
    assert np.abs(C_out - C_gt).max() < 1e-2
    # optimizable (>=2-view) landmarks recovered too; under-observed ones
    # are excluded from the problem and keep their prior positions
    assert np.abs(np.asarray(out.lm_pos) - pts)[multi].max() < 0.05


def test_run_global_ba_unbinds_outliers(rng):
    state, R_gt, t_gt, pts = _build_map(rng, noise=0.2)
    # corrupt 20 observations of keyframe 2
    kf_uv = np.array(state.kf_uv)
    kf_uv[2, :20] += 50.0
    state = state._replace(kf_uv=jnp.asarray(kf_uv))
    noisy = _perturb_map(rng, state, rot=0.003, trans=0.01, lm_sigma=0.01)
    inv_s2 = jnp.ones(4, jnp.float32)
    out, n_inl = global_ba.run_global_ba(
        noisy, inv_s2, CAM, BF, jnp.int32(0), n_levels=4)
    dropped = np.asarray(out.kf_obs[2, :20])
    assert (dropped < 0).mean() > 0.8, "outlier observations not unbound"


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("lm",))


def test_distributed_global_ba_matches_single(rng, mesh):
    state, R_gt, t_gt, pts = _build_map(rng, L=96)
    noisy = _perturb_map(rng, state)
    inv_s2 = jnp.ones(4, jnp.float32)
    K, N = state.kf_obs.shape
    multi = np.asarray(ms.landmark_obs_count(state)) >= 2
    out_d, n_inl = sharded_ba.distributed_global_ba(
        noisy, inv_s2, CAM, BF, mesh, n_levels=4)
    assert int(n_inl) > 0.9 * K * N
    C_out = _centers(out_d.kf_R, out_d.kf_t)
    C_gt = _centers(R_gt, t_gt)
    assert np.abs(C_out - C_gt).max() < 1e-2
    assert np.abs(np.asarray(out_d.lm_pos) - pts)[multi].max() < 0.05
