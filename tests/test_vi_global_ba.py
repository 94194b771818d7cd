"""Full-map visual-inertial GBA (matrix-free 15-DoF CG Schur).

Contract (reference: FullInertialBA src/Optimizer.cc:392-812): given a map
whose keyframe poses/velocities were perturbed away from a consistent
visual+inertial ground truth, the solver pulls them back — reprojection AND
preintegration residuals drop; gauge fixed by anchoring KF0."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.optim import vi_ba, vi_global_ba
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils import lie
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

from test_vi_ba import _simulate_states, BF, CAM

CALIB = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0)


def _build_map(n_kf=6, n_lm=150, seed=0, px_noise=0.2, calib=CALIB):
    """MapState populated from a simulated VI trajectory.

    IMU states live in the body frame; camera poses are T_cw = T_cb * T_bw
    through calib's extrinsics (identity by default, so body == camera)."""
    rng = np.random.default_rng(seed)
    kf_R_wb, kf_p, kf_v, windows = _simulate_states(n_kf=n_kf, seed=seed)
    lm = rng.uniform(-3, 3, (n_lm, 3)).astype(np.float32)
    lm[:, 2] = rng.uniform(4, 10, n_lm)

    N = 256
    cfg = ms.MapConfig(max_keyframes=8, max_landmarks=256, max_features=N,
                       n_levels=4, scale=1.2)
    st = ms.empty(cfg)
    from orb_slam3_vio_fixes_tpu.frontend.inertial_tracking import cam_from_body
    R_cb = np.asarray(calib.R_bc).T
    t_cb = -R_cb @ np.asarray(calib.t_bc)
    kf_R, kf_t = cam_from_body(jnp.asarray(kf_R_wb), jnp.asarray(kf_p),
                               jnp.asarray(R_cb), jnp.asarray(t_cb))
    kf_R = np.asarray(kf_R)
    kf_t = np.asarray(kf_t)
    # keep the cloud in front of camera 0 regardless of the rig rotation
    lm = (lm - kf_t[0]) @ kf_R[0]          # world points, camera-0 z in 4..10
    obs = np.full((n_kf, N), -1, np.int32)
    uv_arr = np.zeros((n_kf, N, 2), np.float32)
    ur_arr = np.full((n_kf, N), -1.0, np.float32)
    fv = np.zeros((n_kf, N), bool)
    for w in range(n_kf):
        Xc = lm @ kf_R[w].T + kf_t[w]
        uv = np.stack([400 * Xc[:, 0] / Xc[:, 2] + 320,
                       400 * Xc[:, 1] / Xc[:, 2] + 240], 1)
        ur = uv[:, 0] - float(BF) / Xc[:, 2]
        ok = (Xc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & \
             (uv[:, 1] > 0) & (uv[:, 1] < 480)
        idx = np.nonzero(ok)[0][:N]
        n = len(idx)
        obs[w, :n] = idx
        uv_arr[w, :n] = uv[idx] + rng.normal(0, px_noise, (n, 2))
        ur_arr[w, :n] = ur[idx] + rng.normal(0, px_noise, n)
        fv[w, :n] = True

    K = cfg.max_keyframes
    L = cfg.max_landmarks
    st = st._replace(
        kf_R=st.kf_R.at[:n_kf].set(jnp.asarray(kf_R)),
        kf_t=st.kf_t.at[:n_kf].set(jnp.asarray(kf_t)),
        kf_vel=st.kf_vel.at[:n_kf].set(jnp.asarray(kf_v)),
        kf_valid=st.kf_valid.at[:n_kf].set(True),
        kf_obs=st.kf_obs.at[:n_kf].set(jnp.asarray(obs)),
        kf_uv=st.kf_uv.at[:n_kf].set(jnp.asarray(uv_arr)),
        kf_ur=st.kf_ur.at[:n_kf].set(jnp.asarray(ur_arr)),
        kf_feat_valid=st.kf_feat_valid.at[:n_kf].set(jnp.asarray(fv)),
        kf_prev=st.kf_prev.at[:n_kf].set(
            jnp.arange(n_kf, dtype=jnp.int32) - 1),
        lm_pos=st.lm_pos.at[:n_lm].set(jnp.asarray(lm)),
        lm_valid=st.lm_valid.at[:n_lm].set(True),
    )
    # full-map IMU chain factors at zero bias
    P = windows.shape[0]
    zero = jnp.zeros(3)
    pres = jax.vmap(lambda w: pre.integrate(jnp.asarray(w), zero, zero,
                                            calib))(jnp.asarray(windows))
    maxP = K - 1
    idx_i = np.zeros(maxP, np.int32)
    idx_j = np.zeros(maxP, np.int32)
    valid = np.zeros(maxP, bool)
    idx_i[:P] = np.arange(P)
    idx_j[:P] = np.arange(1, P + 1)
    valid[:P] = True

    def _pad(a):
        out = np.zeros((maxP,) + np.asarray(a).shape[1:], np.asarray(a).dtype)
        out[:P] = np.asarray(a)
        return jnp.asarray(out)

    pres_pad = pre.Preintegrated(*[_pad(getattr(pres, f))
                                   for f in pres._fields])
    inertial = vi_ba.VIInertialFactors.from_preintegrations(
        idx_i, idx_j, pres_pad, valid)
    return st, inertial, kf_R, kf_t, kf_v, lm


def _reproj_rmse(st, n_kf):
    errs = []
    for w in range(n_kf):
        obs = np.asarray(st.kf_obs[w])
        fv = np.asarray(st.kf_feat_valid[w])
        ok = fv & (obs >= 0)
        X = np.asarray(st.lm_pos)[np.clip(obs, 0, st.lm_pos.shape[0] - 1)]
        Xc = X @ np.asarray(st.kf_R[w]).T + np.asarray(st.kf_t[w])
        uv = np.stack([400 * Xc[:, 0] / np.maximum(Xc[:, 2], 1e-6) + 320,
                       400 * Xc[:, 1] / np.maximum(Xc[:, 2], 1e-6) + 240], 1)
        e = np.linalg.norm(uv - np.asarray(st.kf_uv[w]), axis=-1)
        errs.append(e[ok])
    e = np.concatenate(errs)
    return float(np.sqrt((e ** 2).mean()))


def test_vi_gba_recovers_perturbed_map():
    n_kf = 6
    st, inertial, kf_R, kf_t, kf_v, lm = _build_map(n_kf=n_kf)
    rng = np.random.default_rng(3)
    # perturb all but KF0
    pert_R = np.array(st.kf_R)
    pert_t = np.array(st.kf_t)
    pert_v = np.array(st.kf_vel)
    for w in range(1, n_kf):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3).astype(np.float32))))
        pert_R[w] = pert_R[w] @ dR
        pert_t[w] = pert_t[w] + rng.normal(0, 0.05, 3)
        pert_v[w] = pert_v[w] + rng.normal(0, 0.1, 3)
    st_p = st._replace(kf_R=jnp.asarray(pert_R), kf_t=jnp.asarray(pert_t),
                       kf_vel=jnp.asarray(pert_v))
    rmse_before = _reproj_rmse(st_p, n_kf)

    K = st.kf_R.shape[0]
    pose_fixed = np.zeros(K, bool)
    pose_fixed[0] = True
    inv_s2 = jnp.ones(4)
    out, n_inl = vi_global_ba.run_global_vi_ba(
        st_p, inertial, inv_s2, CAM, BF, CALIB, jnp.asarray(pose_fixed),
        n_levels=4, scale=1.2)
    rmse_after = _reproj_rmse(out, n_kf)
    assert rmse_after < 0.25 * rmse_before, (rmse_before, rmse_after)
    assert int(n_inl) > 500
    # velocities pulled toward truth
    v_err_before = np.linalg.norm(pert_v[1:n_kf] - kf_v[1:n_kf], axis=-1).mean()
    v_err_after = np.linalg.norm(
        np.asarray(out.kf_vel[1:n_kf]) - kf_v[1:n_kf], axis=-1).mean()
    assert v_err_after < v_err_before


def test_vi_gba_respects_pose_fixed_mask():
    """Window-restricted run (MergeInertialBA shape): fixed keyframes do not
    move."""
    n_kf = 6
    st, inertial, *_ = _build_map(n_kf=n_kf, seed=1)
    rng = np.random.default_rng(4)
    pert_t = np.array(st.kf_t)
    pert_t[3:n_kf] += rng.normal(0, 0.05, (n_kf - 3, 3))
    st_p = st._replace(kf_t=jnp.asarray(pert_t))
    K = st.kf_R.shape[0]
    pose_fixed = np.ones(K, bool)
    pose_fixed[3:n_kf] = False
    inv_s2 = jnp.ones(4)
    out, _ = vi_global_ba.run_global_vi_ba(
        st_p, inertial, inv_s2, CAM, BF, CALIB, jnp.asarray(pose_fixed),
        n_levels=4, scale=1.2)
    np.testing.assert_allclose(np.asarray(out.kf_t[:3]), pert_t[:3],
                               atol=1e-6)
    moved = np.abs(np.asarray(out.kf_t[3:n_kf]) - pert_t[3:n_kf]).max()
    assert moved > 1e-4


def _nonidentity_calib():
    """EuRoC-like camera-IMU extrinsics: large rotation + offset."""
    R_bc = np.asarray(lie.so3_exp(jnp.asarray([0.3, -1.2, 0.7],
                                              jnp.float32)))
    t_bc = np.array([-0.02, 0.06, 0.01], np.float32)
    return pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0,
                             R_bc=R_bc, t_bc=t_bc)


def test_body_cam_round_trip_nonidentity_extrinsics():
    """Regression for the round-3 advisor HIGH finding: _body_states must be
    the exact inverse of _cam_states for non-identity camera-IMU extrinsics
    (the old code used R_cb.T and routed t_bc through the wrong rotation,
    corrupting every free keyframe on a real rig)."""
    calib = _nonidentity_calib()
    R_cb = jnp.asarray(np.asarray(calib.R_bc).T)
    t_cb = -R_cb @ calib.t_bc
    st, *_ = _build_map(n_kf=6, seed=2, calib=calib)
    R_wb, p_wb = vi_global_ba._body_states(st, R_cb, t_cb)
    kf_R, kf_t = vi_global_ba._cam_states(R_wb, p_wb, R_cb, t_cb)
    np.testing.assert_allclose(np.asarray(kf_R[:6]), np.asarray(st.kf_R[:6]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(kf_t[:6]), np.asarray(st.kf_t[:6]),
                               atol=1e-5)


def test_vi_gba_sharded_parity_8_devices():
    """run_global_vi_ba_sharded on the virtual 8-device CPU mesh must agree
    with the single-device solver (round-4 verdict item 5's done criterion).
    Bitwise equality is not expected (psum reassociates float sums); poses
    and landmarks must match to optimization-noise level."""
    from jax.sharding import Mesh

    n_kf = 6
    st, inertial, *_ = _build_map(n_kf=n_kf, seed=0)
    rng = np.random.default_rng(3)
    pert_R = np.array(st.kf_R)
    pert_t = np.array(st.kf_t)
    for w in range(1, n_kf):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3).astype(np.float32))))
        pert_R[w] = pert_R[w] @ dR
        pert_t[w] = pert_t[w] + rng.normal(0, 0.05, 3)
    st_p = st._replace(kf_R=jnp.asarray(pert_R), kf_t=jnp.asarray(pert_t))
    K = st.kf_R.shape[0]
    pose_fixed = np.zeros(K, bool)
    pose_fixed[0] = True
    inv_s2 = jnp.ones(4)

    def copy(s):
        return jax.tree.map(jnp.copy, s)

    out1, n1 = vi_global_ba.run_global_vi_ba(
        copy(st_p), inertial, inv_s2, CAM, BF, CALIB,
        jnp.asarray(pose_fixed), n_levels=4, scale=1.2)
    n_dev = min(8, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("lm",))
    out8, n8 = vi_global_ba.run_global_vi_ba_sharded(
        copy(st_p), inertial, inv_s2, CAM, BF, CALIB,
        jnp.asarray(pose_fixed), mesh, n_levels=4, scale=1.2)
    np.testing.assert_allclose(np.asarray(out8.kf_t[:n_kf]),
                               np.asarray(out1.kf_t[:n_kf]), atol=2e-3)
    # rotation agreement: trace of relative rotation ~ 3
    for w in range(n_kf):
        dR = np.asarray(out1.kf_R[w]) @ np.asarray(out8.kf_R[w]).T
        assert np.trace(dR) > 3 - 1e-4
    assert abs(int(n1) - int(n8)) <= 0.02 * max(int(n1), 1)
    lmv = np.asarray(st.lm_valid)
    dlm = np.linalg.norm(
        np.asarray(out8.lm_pos) - np.asarray(out1.lm_pos), axis=-1)[lmv]
    assert np.median(dlm) < 1e-3, float(np.median(dlm))


def test_vi_gba_nonidentity_extrinsics_recovers():
    """Full solver on a rig with non-identity T_bc: a perturbed map must be
    pulled back (it was corrupted by the extrinsics bug before the fix)."""
    calib = _nonidentity_calib()
    n_kf = 6
    st, inertial, kf_R, kf_t, kf_v, lm = _build_map(
        n_kf=n_kf, seed=2, calib=calib)
    rng = np.random.default_rng(7)
    pert_R = np.array(st.kf_R)
    pert_t = np.array(st.kf_t)
    pert_v = np.array(st.kf_vel)
    for w in range(1, n_kf):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.02, 3).astype(np.float32))))
        pert_R[w] = pert_R[w] @ dR
        pert_t[w] = pert_t[w] + rng.normal(0, 0.05, 3)
        pert_v[w] = pert_v[w] + rng.normal(0, 0.1, 3)
    st_p = st._replace(kf_R=jnp.asarray(pert_R), kf_t=jnp.asarray(pert_t),
                       kf_vel=jnp.asarray(pert_v))
    rmse_before = _reproj_rmse(st_p, n_kf)
    K = st.kf_R.shape[0]
    pose_fixed = np.zeros(K, bool)
    pose_fixed[0] = True
    out, n_inl = vi_global_ba.run_global_vi_ba(
        st_p, inertial, jnp.ones(4), CAM, BF, calib,
        jnp.asarray(pose_fixed), n_levels=4, scale=1.2)
    rmse_after = _reproj_rmse(out, n_kf)
    assert rmse_after < 0.25 * rmse_before, (rmse_before, rmse_after)
    assert int(n_inl) > 500
