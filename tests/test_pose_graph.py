"""Pose-graph (essential-graph) optimizer tests.

Scenario mirrors the reference's loop-closing use (Optimizer::
OptimizeEssentialGraph src/Optimizer.cc:1501): a drifted odometry chain plus
one loop edge carrying the true relative pose; optimization should spread the
loop error over the chain and pull every pose toward ground truth.
"""

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.optim import pose_graph as pg
from orb_slam3_vio_fixes_tpu.utils import lie


def _circle_gt(K, radius=5.0):
    """Ground-truth T_cw poses along a circle, camera yawing with it."""
    Rs, ts = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        Rwc = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
            np.float32,
        )
        C = np.array([radius * np.cos(a), radius * np.sin(a), 0], np.float32)
        R_cw = Rwc.T
        t_cw = -R_cw @ C
        Rs.append(R_cw)
        ts.append(t_cw)
    return np.stack(Rs), np.stack(ts)


def _drifted(R_gt, t_gt, drift_per_step=0.02, rot_drift=0.004, seed=0):
    """Integrate GT relative motions with a small systematic drift."""
    rng = np.random.default_rng(seed)
    K = R_gt.shape[0]
    R = [R_gt[0]]
    t = [t_gt[0]]
    for k in range(1, K):
        R_rel = R_gt[k] @ R_gt[k - 1].T
        t_rel = t_gt[k] - R_rel @ t_gt[k - 1]
        w = rng.normal(0, rot_drift, 3).astype(np.float32)
        dR = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R.append(dR @ R_rel @ R[-1])
        t.append(
            R_rel @ t[-1]
            + t_rel
            + rng.normal(0, drift_per_step, 3).astype(np.float32)
        )
    return np.stack(R), np.stack(t)


def _pose_err(Ra, ta, Rb, tb):
    """Mean camera-center distance."""
    Ca = -np.einsum("kji,kj->ki", Ra, ta)
    Cb = -np.einsum("kji,kj->ki", Rb, tb)
    return float(np.linalg.norm(Ca - Cb, axis=-1).mean())


def test_loop_closure_reduces_drift():
    K = 24
    R_gt, t_gt = _circle_gt(K)
    R0, t0 = _drifted(R_gt, t_gt)
    err_before = _pose_err(R0, t0, R_gt, t_gt)

    max_e = 64
    edges = pg.PoseGraphEdges.empty(max_e)
    # odometry chain edges from the drifted poses (measurement = current rel)
    n = 0
    ones = jnp.float32(1.0)
    for k in range(1, K):
        Rm, tm, sm = pg.relative_sim3(
            jnp.asarray(R0[k]), jnp.asarray(t0[k]), ones,
            jnp.asarray(R0[k - 1]), jnp.asarray(t0[k - 1]), ones,
        )
        edges = pg.add_loop_edge(edges, n, k - 1, k, Rm, tm, sm, weight=1.0)
        n += 1
    # loop edge with the TRUE relative pose (last -> first)
    Rm, tm, sm = pg.relative_sim3(
        jnp.asarray(R_gt[K - 1]), jnp.asarray(t_gt[K - 1]), ones,
        jnp.asarray(R_gt[0]), jnp.asarray(t_gt[0]), ones,
    )
    edges = pg.add_loop_edge(edges, n, 0, K - 1, Rm, tm, sm, weight=100.0)

    fixed = jnp.zeros(K, bool).at[0].set(True)
    R2, t2, s2, chi2 = pg.optimize_pose_graph(
        jnp.asarray(R0), jnp.asarray(t0), jnp.ones(K), fixed, edges,
        pg.PoseGraphConfig(n_iters=10, fix_scale=True),
    )
    err_after = _pose_err(np.asarray(R2), np.asarray(t2), R_gt, t_gt)
    assert np.all(np.isfinite(np.asarray(t2)))
    assert np.allclose(np.asarray(s2), 1.0, atol=1e-4)
    # the loop edge should pull the chain substantially toward GT
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_fixed_vertices_stay_fixed():
    K = 8
    R_gt, t_gt = _circle_gt(K)
    R0, t0 = _drifted(R_gt, t_gt, seed=3)
    edges = pg.PoseGraphEdges.empty(16)
    ones = jnp.float32(1.0)
    for k in range(1, K):
        Rm, tm, sm = pg.relative_sim3(
            jnp.asarray(R_gt[k]), jnp.asarray(t_gt[k]), ones,
            jnp.asarray(R_gt[k - 1]), jnp.asarray(t_gt[k - 1]), ones,
        )
        edges = pg.add_loop_edge(edges, k - 1, k - 1, k, Rm, tm, sm)
    fixed = jnp.zeros(K, bool).at[0].set(True)
    R2, t2, _, _ = pg.optimize_pose_graph(
        jnp.asarray(R0), jnp.asarray(t0), jnp.ones(K), fixed, edges,
        pg.PoseGraphConfig(n_iters=8, fix_scale=True),
    )
    np.testing.assert_allclose(np.asarray(R2[0]), R0[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2[0]), t0[0], atol=1e-6)
    # with perfect edges and one anchor, the rest should snap to GT exactly
    assert _pose_err(np.asarray(R2), np.asarray(t2), R_gt, t_gt) < 1e-3


def test_sim3_scale_recovery():
    """Mono case: a loop edge carrying a non-unit relative SCALE (as produced
    by the Sim3 solver when the map has scale drift, reference:
    src/LoopClosing.cc mg2oLoopScw) must propagate scale through the chain
    when fix_scale=False, and must NOT when fix_scale=True."""
    K = 8
    eye = jnp.eye(3)
    zero = jnp.zeros(3)
    edges = pg.PoseGraphEdges.empty(16)
    # identity chain edges: want s_{k} = s_{k-1}
    for k in range(1, K):
        edges = pg.add_loop_edge(edges, k - 1, k - 1, k, eye, zero,
                                 jnp.float32(1.0), weight=1.0)
    # loop edge demanding s_{K-1} = 2 * s_0 (sigma residual = log(s_m s_i/s_j))
    edges = pg.add_loop_edge(edges, K - 1, 0, K - 1, eye, zero,
                             jnp.float32(2.0), weight=100.0)

    R0 = jnp.tile(jnp.eye(3), (K, 1, 1))
    t0 = jnp.zeros((K, 3))
    fixed = jnp.zeros(K, bool).at[0].set(True)

    _, _, s_free, _ = pg.optimize_pose_graph(
        R0, t0, jnp.ones(K), fixed, edges,
        pg.PoseGraphConfig(n_iters=12, fix_scale=False),
    )
    s_free = np.asarray(s_free)
    assert np.all(np.isfinite(s_free))
    # heavy loop edge should win: last scale close to 2, ramping along chain
    assert float(s_free[K - 1]) > 1.5, s_free
    assert float(s_free[1]) > 1.0

    _, _, s_fix, _ = pg.optimize_pose_graph(
        R0, t0, jnp.ones(K), fixed, edges,
        pg.PoseGraphConfig(n_iters=12, fix_scale=True),
    )
    np.testing.assert_allclose(np.asarray(s_fix), 1.0, atol=1e-5)
