"""GT-trajectory INERTIAL accuracy gates (round-4 verdict item 9): render
synthetic stereo imagery + synthesized self-consistent IMU along real EuRoC
ground-truth trajectories and gate the stereo-inertial and mono-inertial
pipelines' ATE — the golden-dataset analogue of the reference's
euroc_examples.sh runs for the IMU_* sensor modes."""

import os

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import inertial_tracking as it
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

GT_DIR = "/root/reference/evaluation/Ground_truth/EuRoC_left_cam"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GT_DIR), reason="reference GT files not available")


def _seq(gt_file, n_frames=120):
    rng = np.random.default_rng(3)
    return synthetic.make_gt_stereo_inertial_sequence(
        rng, os.path.join(GT_DIR, gt_file), n_frames=n_frames,
        h=240, w=352, fx=260.0, baseline=0.2, n_points=20 * n_frames)


def _cfg(max_kf=64):
    return tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=max_kf, max_landmarks=8192,
                         max_features=400),
        width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=5,
    )


@pytest.mark.slow
def test_gt_mh01_stereo_inertial_ate():
    seq = _seq("MH01_GT.txt")
    cfg = _cfg()
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=256, init_min_kfs=6, init_min_time=1.0,
        vi_window=6, max_local_lm=1024, fix_scale=True,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                                  cfg, icfg)
    tr.match_radius = (12.0, 24.0)
    n = seq.imgs_l.shape[0]
    for i in range(n):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        tr.process_stereo_inertial(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i],
                                   imu)
    assert tr.track_state == tracking.TrackState.OK
    assert tr.imu_ready, "IMU never initialized on the GT sequence"
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n_a = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n_a == n
    assert rmse < 0.05, f"stereo-inertial MH01 ATE {rmse:.4f}"


@pytest.mark.slow
def test_gt_mh01_mono_inertial_metric():
    """Mono-inertial on a GT trajectory: the unaligned (metric) ATE gates
    that IMU init recovered the true scale from real-motion excitation."""
    seq = _seq("MH01_GT.txt", n_frames=160)
    cfg = _cfg()
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=256, init_min_kfs=8, init_min_time=2.0,
        vi_window=6, max_local_lm=1024, fix_scale=False,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = it.MonoInertialTracker(cam, calib, cfg, icfg)
    n = seq.imgs_l.shape[0]
    for i in range(n):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        tr.process_mono_inertial(seq.imgs_l[i], seq.ts[i], imu)
    assert tr.track_state == tracking.TrackState.OK
    assert tr.imu_ready, "mono IMU never initialized on the GT sequence"
    est = [x for x in tr.trajectory if x[0] >= tr.t_first_kf]
    est_ts = np.array([x[0] for x in est])
    est_pos = np.array([-x[1].T @ x[2] for x in est])
    rmse, _, n_a = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos,
                                with_scale=False)
    assert n_a >= 40
    # metric (no scale alignment): fails if IMU init did not recover scale
    assert rmse < 0.30, f"mono-inertial MH01 metric ATE {rmse:.4f}"
    rmse_s, scale, _ = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos,
                                    with_scale=True)
    assert abs(scale - 1.0) < 0.25, f"scale error {scale:.3f}"


@pytest.mark.slow
def test_gt_mh01_stereo_inertial_ate_noisy():
    """The same GT-trajectory stereo-inertial gate with REALISTIC sensors
    (round-4 verdict item 3): photometric degradation on both eyes
    (noise + blur + exposure/vignette drift + occluders, DEFAULT_NOISE) and
    EuRoC-class IMU white noise + bias random walk (perturb_imu). The ATE
    bound is 2x the clean gate's — the front end must survive, not match,
    the ideal-sensor number."""
    seq = _seq("MH01_GT.txt")
    rng = np.random.default_rng(13)
    seq = synthetic.degrade_stereo(seq, rng)
    seq = seq._replace(imu=synthetic.perturb_imu(seq.imu, rng))
    cfg = _cfg()
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=256, init_min_kfs=6, init_min_time=1.0,
        vi_window=6, max_local_lm=1024, fix_scale=True,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                                  cfg, icfg)
    tr.match_radius = (12.0, 24.0)
    n = seq.imgs_l.shape[0]
    for i in range(n):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        tr.process_stereo_inertial(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i],
                                   imu)
    assert tr.track_state == tracking.TrackState.OK
    assert tr.imu_ready, "IMU never initialized under sensor noise"
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n_a = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n_a == n
    assert rmse < 0.10, f"noisy stereo-inertial MH01 ATE {rmse:.4f}"
