"""Bundle-adjustment engine tests on synthetic problems with known optimum."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

CAM = Camera.pinhole(458.0, 457.0, 320.0, 240.0)
BF = jnp.float32(47.9)


def make_scene(rng, n_poses=6, n_points=80, stereo=True, noise_px=0.3, outlier_frac=0.0):
    """Cameras looking at a point cloud from a small arc."""
    pts = rng.uniform(-4, 4, size=(n_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(6, 14, n_points)
    R_gt, t_gt = [], []
    for i in range(n_poses):
        w = rng.normal(0, 0.03, 3)
        R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        tw = np.array([i * 0.4, 0.02 * i, 0.0], np.float32)  # camera centers along x
        # T_cw: Xc = R (Xw - C) -> t = -R C
        t = -(R @ tw)
        R_gt.append(R)
        t_gt.append(t.astype(np.float32))
    R_gt = np.stack(R_gt)
    t_gt = np.stack(t_gt)

    # observations: all poses x all points
    f_pose, f_lm, f_uvr, f_w, f_valid = [], [], [], [], []
    for p in range(n_poses):
        Xc = pts @ R_gt[p].T + t_gt[p]
        uv = np.array(project(CAM, jnp.asarray(Xc)))
        ur = uv[:, 0] - np.asarray(BF) / Xc[:, 2]
        uv += rng.normal(0, noise_px, uv.shape)
        for l in range(n_points):
            f_pose.append(p)
            f_lm.append(l)
            if stereo:
                f_uvr.append([uv[l, 0], uv[l, 1], ur[l]])
            else:
                f_uvr.append([uv[l, 0], uv[l, 1], -1.0])
            f_w.append(1.0)
            f_valid.append(True)
    f_uvr = np.array(f_uvr, np.float32)
    n_f = len(f_pose)
    n_out = int(outlier_frac * n_f)
    if n_out:
        sel = rng.choice(n_f, n_out, replace=False)
        f_uvr[sel, :2] += rng.uniform(20, 60, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    factors = ba_core.ReprojFactors(
        pose_idx=jnp.asarray(f_pose, jnp.int32),
        lm_idx=jnp.asarray(f_lm, jnp.int32),
        uvr=jnp.asarray(f_uvr),
        inv_sigma2=jnp.asarray(f_w, jnp.float32),
        valid=jnp.asarray(f_valid),
    )
    return R_gt, t_gt, pts, factors, (np.sort(sel) if n_out else np.array([], int))


def perturb(rng, R, t, rot_sigma, trans_sigma):
    dw = rng.normal(0, rot_sigma, (R.shape[0], 3)).astype(np.float32)
    dR = np.asarray(lie.so3_exp(jnp.asarray(dw)))
    return np.einsum("pij,pjk->pik", dR, R), t + rng.normal(0, trans_sigma, t.shape).astype(
        np.float32
    )


def test_jacobians_match_autodiff(rng):
    R_gt, t_gt, pts, factors, _ = make_scene(rng, n_poses=2, n_points=10)
    problem = ba_core.BAProblem(
        R=jnp.asarray(R_gt), t=jnp.asarray(t_gt),
        pose_fixed=jnp.zeros(2, bool),
        lm=jnp.asarray(pts) + 0.01,
        lm_valid=jnp.ones(10, bool), lm_fixed=jnp.zeros(10, bool),
        factors=factors, cam=CAM, bf=BF,
    )
    err, Jp, Jl, chi2, depth = ba_core.reproj_jacobians(problem)

    # numeric: d err / d xi for pose block of factor k
    def err_of_xi(xi, k):
        dR, dt = lie.se3_exp(xi)
        R2 = problem.R.at[factors.pose_idx[k]].set(dR @ problem.R[factors.pose_idx[k]])
        t2 = problem.t.at[factors.pose_idx[k]].set(
            dR @ problem.t[factors.pose_idx[k]] + dt
        )
        e, _, _, _ = ba_core.reproj_residuals(problem, R2, t2, problem.lm)
        return e[k]

    for k in [0, 7, 13]:
        Jnum = jax.jacfwd(lambda xi: err_of_xi(xi, k))(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(Jp[k]), np.asarray(Jnum), atol=2e-2, rtol=1e-3)

    def err_of_dl(dl, k):
        lm2 = problem.lm.at[factors.lm_idx[k]].add(dl)
        e, _, _, _ = ba_core.reproj_residuals(problem, problem.R, problem.t, lm2)
        return e[k]

    for k in [0, 7, 13]:
        Jnum = jax.jacfwd(lambda dl: err_of_dl(dl, k))(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(Jl[k]), np.asarray(Jnum), atol=2e-2, rtol=1e-3)


def test_full_ba_converges(rng):
    R_gt, t_gt, pts, factors, _ = make_scene(rng, noise_px=0.0)
    R0, t0 = perturb(rng, R_gt, t_gt, 0.02, 0.05)
    lm0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    problem = ba_core.BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0),
        pose_fixed=jnp.zeros(6, bool).at[0].set(True),  # gauge anchor
        lm=jnp.asarray(lm0),
        lm_valid=jnp.ones(pts.shape[0], bool),
        lm_fixed=jnp.zeros(pts.shape[0], bool),
        factors=factors, cam=CAM, bf=BF,
    )
    out, inlier, chi2 = ba_core.bundle_adjust(problem)
    # with zero noise and anchored first pose (same as GT pose 0 up to the
    # perturbation... anchor the TRUE first pose):
    problem = problem._replace(
        R=problem.R.at[0].set(jnp.asarray(R_gt[0])), t=problem.t.at[0].set(jnp.asarray(t_gt[0]))
    )
    out, inlier, chi2 = ba_core.bundle_adjust(problem)
    chi2 = np.asarray(chi2)
    assert np.asarray(inlier).mean() > 0.97
    # residual chi2 near zero
    assert np.median(chi2) < 1e-2
    # pose error vs ground truth (gauge fixed by anchored pose 0)
    for p in range(6):
        dR = np.asarray(out.R)[p] @ R_gt[p].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.1, f"pose {p} rotation error {ang} deg"
    # camera centers
    C_est = -np.einsum("pji,pj->pi", np.asarray(out.R), np.asarray(out.t))
    C_gt = -np.einsum("pji,pj->pi", R_gt, t_gt)
    assert np.abs(C_est - C_gt).max() < 5e-3


def test_ba_rejects_outliers(rng):
    R_gt, t_gt, pts, factors, out_idx = make_scene(rng, noise_px=0.2, outlier_frac=0.1)
    R0, t0 = perturb(rng, R_gt, t_gt, 0.01, 0.02)
    problem = ba_core.BAProblem(
        R=jnp.asarray(R0), t=jnp.asarray(t0),
        pose_fixed=jnp.zeros(6, bool).at[0].set(True),
        lm=jnp.asarray(pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)),
        lm_valid=jnp.ones(pts.shape[0], bool),
        lm_fixed=jnp.zeros(pts.shape[0], bool),
        factors=factors, cam=CAM, bf=BF,
    )
    problem = problem._replace(
        R=problem.R.at[0].set(jnp.asarray(R_gt[0])), t=problem.t.at[0].set(jnp.asarray(t_gt[0]))
    )
    out, inlier, chi2 = ba_core.bundle_adjust(problem)
    inlier = np.asarray(inlier)
    # outliers gated out
    assert inlier[out_idx].mean() < 0.1
    assert inlier.mean() > 0.8
    C_est = -np.einsum("pji,pj->pi", np.asarray(out.R), np.asarray(out.t))
    C_gt = -np.einsum("pji,pj->pi", R_gt, t_gt)
    assert np.abs(C_est - C_gt).max() < 0.05


def test_pose_optimize(rng):
    """Motion-only: recover a perturbed camera pose from fixed landmarks."""
    pts = rng.uniform(-4, 4, size=(120, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(6, 14, 120)
    w = rng.normal(0, 0.1, 3).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_gt = np.array([0.3, -0.2, 0.1], np.float32)
    Xc = pts @ R_gt.T + t_gt
    uv = np.array(project(CAM, jnp.asarray(Xc)))
    ur = uv[:, 0] - np.asarray(BF) / Xc[:, 2]
    uvr = np.concatenate([uv + rng.normal(0, 0.3, uv.shape), ur[:, None]], axis=1).astype(
        np.float32
    )
    # 15 outliers
    uvr[:15, :2] += 40.0
    R0 = np.asarray(lie.so3_exp(jnp.asarray(w + rng.normal(0, 0.02, 3).astype(np.float32))))
    t0 = t_gt + rng.normal(0, 0.05, 3).astype(np.float32)
    res = ba_core.pose_optimize(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts), jnp.asarray(uvr),
        jnp.ones(120, jnp.float32), jnp.ones(120, bool), CAM, BF,
    )
    dR = np.asarray(res.R) @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.1
    assert np.abs(np.asarray(res.t) - t_gt).max() < 0.01
    assert int(res.n_inliers) > 95
    assert np.asarray(res.inlier)[:15].mean() < 0.2
