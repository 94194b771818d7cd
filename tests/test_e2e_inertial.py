"""End-to-end stereo-inertial tracking on a synthetic sequence
(SURVEY.md §7 stage 6: IMU init + VI tracking + inertial window BA).

The TPU analogue of the reference's EuRoC stereo-inertial runs: a synthetic
world rendered along an accelerating trajectory with exact IMU, run through
the full inertial pipeline — visual bootstrap, 3-stage IMU initialization
(gravity / velocity / bias), joint VI motion tracking with a marginalized
prior, inertial window BA — then scored with Horn-aligned ATE.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import inertial_tracking as it
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    return synthetic.make_stereo_inertial_sequence(
        rng, n_frames=36, h=240, w=352, fx=260.0, baseline=0.2, world=world,
        imu_hz=200.0, accel_amp=0.6,
    )


def test_stereo_inertial_ate(seq):
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024, ba_window=6, ba_fixed=2, new_lm_budget=256,
        max_frames_between_kf=6,
    )
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=128, init_min_kfs=4, init_min_time=0.5,
        vi_window=6, max_local_lm=1024, fix_scale=True,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                                  cfg, icfg)
    T = seq.imgs_l.shape[0]
    for i in range(T):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        tr.process_stereo_inertial(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i], imu)
    assert tr.track_state == tracking.TrackState.OK
    assert tr.imu_ready, "IMU initialization never ran"
    assert tr.n_vi_ba >= 2, "inertial window BA never ran"

    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, scale, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n == T
    assert rmse < 0.03, f"stereo-inertial ATE RMSE {rmse:.4f} m too high"

    # after init the estimated velocity should track the true speed
    if tr.velocity_log:
        v_est = np.linalg.norm(tr.velocity_log[-1])
        v_gt = np.linalg.norm(seq.vel_gt[-1])
        assert abs(v_est - v_gt) < 0.25 * max(v_gt, 0.2), (v_est, v_gt)


@pytest.mark.slow
def test_blank_frames_dead_reckoning_recovery(seq):
    """Blank out imagery mid-sequence: the tracker must dead-reckon on IMU
    (RECENTLY_LOST), NOT reset, and recover when imagery returns (reference:
    PredictStateIMU in the RECENTLY_LOST branch src/Tracking.cc:1993-2011 —
    the round-1 verdict's missing inertial failure mode)."""
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024, ba_window=6, ba_fixed=2, new_lm_budget=256,
        max_frames_between_kf=6,
    )
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=128, init_min_kfs=4, init_min_time=0.5,
        vi_window=6, max_local_lm=1024, fix_scale=True,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                                  cfg, icfg)
    T = seq.imgs_l.shape[0]
    blank = np.zeros_like(seq.imgs_l[0])
    BLANK = range(20, 28)  # 8 frames (0.4 s) of no imagery after IMU init
    saw_lost = False
    for i in range(T):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        if i in BLANK:
            tr.process_stereo_inertial(blank, blank, seq.ts[i], imu)
            saw_lost = saw_lost or (
                tr.track_state == tracking.TrackState.RECENTLY_LOST)
            assert tr.track_state != tracking.TrackState.NOT_INITIALIZED, (
                "tracker reset instead of dead-reckoning")
        else:
            tr.process_stereo_inertial(seq.imgs_l[i], seq.imgs_r[i],
                                       seq.ts[i], imu)
    assert tr.imu_ready
    assert saw_lost, "blank frames never put the tracker in RECENTLY_LOST"
    assert tr.track_state == tracking.TrackState.OK, "never recovered"
    # accuracy after recovery: the final pose must still be near GT
    C_est = -np.asarray(tr.R).T @ np.asarray(tr.t)
    err = np.linalg.norm(C_est - seq.t_wc[-1])
    assert err < 0.15, f"post-recovery drift {err:.3f} m"


def test_gravity_alignment(seq):
    """After IMU init the world Z axis must be gravity-aligned: keyframe
    'up' in the corrected map matches the renderer's -gravity direction
    (reference: ApplyScaledRotation contract, src/Map.cc:252-284)."""
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024, ba_window=6, ba_fixed=2, new_lm_budget=256,
        max_frames_between_kf=6,
    )
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=128, init_min_kfs=4, init_min_time=0.5,
        vi_window=6, max_local_lm=1024, fix_scale=True,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                                  cfg, icfg)
    T = seq.imgs_l.shape[0]
    for i in range(T):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        tr.process_stereo_inertial(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i], imu)
        if tr.imu_ready:
            break
    assert tr.imu_ready
    # the generator's world was already gravity-aligned, so the estimated
    # world should stay aligned: each KF's R_cw should match GT R_cw up to a
    # yaw-only (Z) rotation of the world
    k = tr.n_kf - 1
    R_est = np.asarray(tr.state.kf_R[k])
    # estimated world z axis expressed via the GT frame of the same KF
    R_gt_cw = seq.R_wc[min(len(seq.ts) - 1, i)].T
    # world-z in camera coords must agree (yaw rotations keep z fixed)
    z_est_cam = R_est @ np.array([0.0, 0, 1.0])
    z_gt_cam = R_gt_cw @ np.array([0.0, 0, 1.0])
    cos = float(z_est_cam @ z_gt_cam)
    assert cos > 0.999, f"gravity misaligned: cos={cos:.5f}"
