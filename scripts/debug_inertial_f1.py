"""Isolate the frame-0->1 tracking failure of the stereo-inertial loop e2e:
run (a) the plain visual StereoTracker and (b) the StereoInertialTracker on
the SAME inertial loop sequence, and print per-frame inliers for the first
10 frames."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import inertial_tracking as it
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

N_FRAMES = 16
rng = np.random.default_rng(5)
seq = synthetic.make_loop_stereo_inertial_sequence(
    rng, n_frames=88, n_loop=72, h=240, w=352, fx=260.0,
    baseline=0.2, radius=3.0, wall_radius=9.0, n_points=1400)
noise = rng.normal(0, 2.0, seq.imgs_l.shape).astype(np.float32)
noise_r = rng.normal(0, 2.0, seq.imgs_r.shape).astype(np.float32)
seq = seq._replace(imgs_l=seq.imgs_l + noise, imgs_r=seq.imgs_r + noise_r)

cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=384, n_levels=4),
    map=ms.MapConfig(max_keyframes=96, max_landmarks=12288,
                     max_features=384),
    width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
    new_lm_budget=256, max_frames_between_kf=4,
)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)

print("=== visual StereoTracker on the inertial loop sequence ===")
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
for i in range(N_FRAMES):
    tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    print(f"f{i:2d} st={tr.track_state:14s} inl={tr.last_n_inliers:4d} "
          f"nkf={tr.n_kf} nlm={tr.n_lm}")

print("=== StereoInertialTracker, same sequence ===")
icfg = it.InertialConfig(
    frame_samples=16, kf_samples=128, init_min_kfs=4, init_min_time=0.5,
    vi_window=6, max_local_lm=1024, fix_scale=True,
)
tr2 = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                               cfg, icfg)
tr2.match_radius = (15.0, 30.0)
for i in range(N_FRAMES):
    imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
    tr2.process_stereo_inertial(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i], imu)
    print(f"f{i:2d} st={tr2.track_state:14s} inl={tr2.last_n_inliers:4d} "
          f"nkf={tr2.n_kf} nlm={tr2.n_lm} imu_ready={tr2.imu_ready}")
