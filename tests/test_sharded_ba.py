"""Distributed Schur BA on a virtual 8-device CPU mesh (SURVEY.md §7 stage 9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh

from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.parallel import sharded_ba

from tests.test_ba import CAM, BF, make_scene, perturb


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(devs[:8], ("lm",))


def test_partition_preserves_factors(rng):
    R_gt, t_gt, pts, factors, _ = make_scene(rng, n_poses=4, n_points=50)
    problem = ba_core.BAProblem(
        R=jnp.asarray(R_gt), t=jnp.asarray(t_gt),
        pose_fixed=jnp.zeros(4, bool).at[0].set(True),
        lm=jnp.asarray(pts),
        lm_valid=jnp.ones(50, bool), lm_fixed=jnp.zeros(50, bool),
        factors=factors, cam=CAM, bf=BF,
    )
    part = sharded_ba.partition_problem(problem, 8)
    assert part.lm.shape[0] % 8 == 0
    assert part.factors.valid.shape[0] % 8 == 0
    assert int(part.factors.valid.sum()) == int(factors.valid.sum())
    # every valid factor's landmark lives on its shard
    block = part.lm.shape[0] // 8
    Fs = part.factors.valid.shape[0] // 8
    lm_idx = np.asarray(part.factors.lm_idx).reshape(8, Fs)
    valid = np.asarray(part.factors.valid).reshape(8, Fs)
    for s in range(8):
        sel = lm_idx[s][valid[s]]
        assert np.all(sel // block == s)


def test_distributed_matches_single_device(rng, mesh):
    R_gt, t_gt, pts, factors, _ = make_scene(rng, n_poses=4, n_points=48, noise_px=0.0)
    R0, t0 = perturb(rng, R_gt, t_gt, 0.01, 0.03)
    lm0 = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    problem = ba_core.BAProblem(
        R=jnp.asarray(R0).at[0].set(jnp.asarray(R_gt[0])),
        t=jnp.asarray(t0).at[0].set(jnp.asarray(t_gt[0])),
        pose_fixed=jnp.zeros(4, bool).at[0].set(True),
        lm=jnp.asarray(lm0),
        lm_valid=jnp.ones(48, bool), lm_fixed=jnp.zeros(48, bool),
        factors=factors, cam=CAM, bf=BF,
    )
    part = sharded_ba.partition_problem(problem, 8)
    out, inlier, chi2 = sharded_ba.distributed_bundle_adjust(part, mesh)
    # converges to ground truth like the single-device solver
    C_est = -np.einsum("pji,pj->pi", np.asarray(out.R), np.asarray(out.t))
    C_gt = -np.einsum("pji,pj->pi", R_gt, t_gt)
    assert np.abs(C_est - C_gt).max() < 1e-2
    assert np.asarray(inlier).mean() > 0.9
