"""Stereo-inertial loop closing e2e: the circular revisit must close the
loop AND keep the map gravity-aligned (round-2 verdict item 4's done
criterion: inertial loop corrections use the 4-DoF essential graph, a scale
gate, a yaw-only clamp and velocity rotation — reference
src/LoopClosing.cc:141-164, :1045-1100, :1176-1184)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import inertial_tracking as it
from orb_slam3_vio_fixes_tpu.frontend import loop_closing as lc
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

N_FRAMES = 88
N_LOOP = 72


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(5)
    s = synthetic.make_loop_stereo_inertial_sequence(
        rng, n_frames=N_FRAMES, n_loop=N_LOOP, h=240, w=352, fx=260.0,
        baseline=0.2, radius=3.0, wall_radius=9.0, n_points=1400)
    noise = rng.normal(0, 2.0, s.imgs_l.shape).astype(np.float32)
    noise_r = rng.normal(0, 2.0, s.imgs_r.shape).astype(np.float32)
    return s._replace(imgs_l=s.imgs_l + noise, imgs_r=s.imgs_r + noise_r)


@pytest.mark.slow
def test_stereo_inertial_loop_keeps_gravity(seq):
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=384, n_levels=4),
        map=ms.MapConfig(max_keyframes=96, max_landmarks=12288,
                         max_features=384),
        width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=4,
    )
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=128, init_min_kfs=4, init_min_time=0.5,
        vi_window=6, max_local_lm=1024, fix_scale=True,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])

    # vocabulary from the sequence itself (same recipe as the visual loop e2e)
    from orb_slam3_vio_fixes_tpu.frontend.frame import build_stereo_frame
    pool = []
    for i in range(0, N_FRAMES, N_FRAMES // 6):
        f = build_stereo_frame(
            jnp.asarray(seq.imgs_l[i]), jnp.asarray(seq.imgs_r[i]),
            jnp.float32(0.0), cam, jnp.float32(seq.K[0, 0] * seq.baseline),
            cfg.orb)
        pool.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = voc.train(np.concatenate(pool), branching=10, depth=3, seed=0)
    inv_s2 = tracking.octave_inv_sigma2(cfg.orb)
    closer = lc.LoopCloser(
        vocab, cam, cfg.map.max_keyframes, inv_s2,
        lc.LoopConfig(min_gap_kfs=8, n_consistency=2, fix_scale=True,
                      inertial=True, run_gba=False),
        bf=seq.K[0, 0] * seq.baseline, n_levels=cfg.orb.n_levels,
        scale=cfg.orb.scale)

    tr = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                                  cfg, icfg, loop_closer=closer)
    tr.match_radius = (15.0, 30.0)
    for i in range(N_FRAMES):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        tr.process_stereo_inertial(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i],
                                   imu)
    assert tr.track_state == tracking.TrackState.OK
    assert tr.imu_ready
    assert closer.n_corrections >= 1, "inertial loop never closed"

    st = tr.state
    # ---- gravity stays aligned THROUGH the loop correction ----
    # generator world gravity is (0,-1,0); map world gravity is (0,0,-1)
    # after inertial init. For every live keyframe the BODY-frame gravity
    # from the estimated pose must match the true body-frame gravity — a
    # correction with roll/pitch leakage breaks this on the loop side.
    g_map = np.array([0.0, 0.0, -1.0])
    g_true_w = np.array([0.0, -1.0, 0.0])
    errs = []
    kf_ts = np.asarray(st.kf_ts)
    dt = seq.ts[1] - seq.ts[0]
    for k in tr.kf_order:
        fi = int(round(kf_ts[k] / dt))
        if fi >= N_FRAMES:
            continue
        R_wb_true = seq.R_wc[fi]                 # body == camera
        R_cw_est = np.asarray(st.kf_R[k])
        g_b_est = R_cw_est @ g_map               # map-world -> body(=cam)
        g_b_true = R_wb_true.T @ g_true_w
        cosang = float(np.clip(np.dot(g_b_est, g_b_true), -1.0, 1.0))
        errs.append(np.degrees(np.arccos(cosang)))
    errs = np.asarray(errs)
    assert np.median(errs) < 3.0, f"gravity misaligned: median {errs} deg"
    assert errs.max() < 8.0, f"gravity misaligned at some KF: {errs.max()}"

    # ---- velocities stay consistent with the corrected poses ----
    # finite-difference the keyframe positions and compare with kf_vel
    # (apply_correction must rotate velocities along with the poses)
    order = tr.kf_order
    C = np.stack([-np.asarray(st.kf_R[k]).T @ np.asarray(st.kf_t[k])
                  for k in order])
    tss = kf_ts[np.asarray(order)]
    v_fd = (C[2:] - C[:-2]) / (tss[2:] - tss[:-2])[:, None]
    v_kf = np.stack([np.asarray(st.kf_vel[k]) for k in order])[1:-1]
    speed = np.linalg.norm(v_kf, axis=1)
    err_v = np.linalg.norm(v_fd - v_kf, axis=1)
    ok = speed > 0.1
    assert np.median(err_v[ok] / speed[ok]) < 0.35, (
        f"velocities inconsistent with corrected poses: "
        f"{np.median(err_v[ok] / speed[ok]):.2f}")

    # ---- and the loop still helps the trajectory ----
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n == N_FRAMES
    assert rmse < 0.25, f"stereo-inertial loop ATE {rmse:.3f}"
