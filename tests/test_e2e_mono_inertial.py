"""End-to-end monocular-inertial tracking on a synthetic sequence.

The mono-inertial capability the reference headlines (IMU_MONOCULAR): mono
two-view bootstrap at arbitrary scale, then IMU initialization with a FREE
scale vertex recovers metric scale and gravity (reference:
src/Optimizer.cc:3042 InertialOptimization with VertexScale, scale fixed
only for stereo :3123; src/Map.cc:252 ApplyScaledRotation)."""

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


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(11)
    world = synthetic.make_world(rng, n_points=700, extent=7.0,
                                 depth_range=(2.5, 9.0))
    return synthetic.make_stereo_inertial_sequence(
        rng, n_frames=40, h=240, w=352, fx=260.0, baseline=0.2, world=world,
        imu_hz=200.0, accel_amp=0.8,
    )


def test_mono_inertial_metric_scale(seq):
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024, ba_window=6, ba_fixed=2, new_lm_budget=256,
        max_frames_between_kf=6,
    )
    # init window 1.2 s / 8 KFs: mono-inertial scale is only OBSERVABLE with
    # enough accumulated excitation — the reference initializes mono-IMU
    # over ~2 s minimum (src/LocalMapping.cc:1178-1211); the round-3 value
    # (0.7 s / 5 KFs) sat below identifiability and passed only by luck of
    # the noise realization
    icfg = it.InertialConfig(
        frame_samples=16, kf_samples=256, init_min_kfs=8, init_min_time=1.2,
        vi_window=6, max_local_lm=1024, fix_scale=False,
    )
    calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = it.MonoInertialTracker(cam, calib, cfg, icfg)
    T = seq.imgs_l.shape[0]
    for i in range(T):
        imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
        tr.process_mono_inertial(seq.imgs_l[i], seq.ts[i], imu)
    assert tr.track_state == tracking.TrackState.OK
    assert tr.imu_ready, "mono IMU initialization never ran"

    # score only the post-IMU-init segment (pre-init mono poses are at an
    # arbitrary scale by construction, like the reference's pre-VIBA output)
    est = [x for x in tr.trajectory if x[0] >= tr.t_first_kf]
    est_ts = np.array([x[0] for x in est])
    est_pos = np.array([-x[1].T @ x[2] for x in est])
    sel = np.searchsorted(seq.ts, est_ts)

    # metric accuracy WITHOUT scale alignment: IMU must have recovered scale
    rmse_metric, _, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos,
                                     with_scale=False)
    assert n >= 10
    # Bar: the reference's own IMU-init contract is scale error <5% within
    # 2 s (Changelog.md:44); on this ~1.5 m-extent trajectory with only
    # ~1 s of post-init data that is ~0.1-0.15 m of unaligned ATE. The
    # failure mode guarded against is an unrecovered scale (0.4-0.6 m).
    assert rmse_metric < 0.15, (
        f"mono-inertial metric ATE {rmse_metric:.3f} m — scale not recovered")

    # Horn-optimal scale must be close to 1 (true metric)
    rmse_s, scale, _ = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos,
                                    with_scale=True)
    assert abs(scale - 1.0) < 0.12, f"scale error {scale:.3f}"
    assert rmse_s <= rmse_metric + 1e-6
