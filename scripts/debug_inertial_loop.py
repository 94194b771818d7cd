"""Debug harness for the stereo-inertial loop e2e (slow-gate failure):
per-frame inlier counts, track state, and keyframe events."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax.numpy as jnp

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

rng = np.random.default_rng(5)
seq = synthetic.make_loop_stereo_inertial_sequence(
    rng, n_frames=N_FRAMES, n_loop=N_LOOP, h=240, w=352, fx=260.0,
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
icfg = it.InertialConfig(
    frame_samples=16, kf_samples=128, init_min_kfs=4, init_min_time=0.5,
    vi_window=6, max_local_lm=1024, fix_scale=True,
)
calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])

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
prev_nkf = 0
prev_ncorr = 0
for i in range(N_FRAMES):
    imu = seq.imu[i - 1] if i > 0 else np.zeros((0, 7), np.float32)
    R, t, st = tr.process_stereo_inertial(
        seq.imgs_l[i], seq.imgs_r[i], seq.ts[i], imu)
    ev = []
    if tr.n_kf != prev_nkf:
        ev.append(f"KF{tr.n_kf - 1}")
        prev_nkf = tr.n_kf
    if closer.n_corrections != prev_ncorr:
        ev.append("LOOP_CORRECTED")
        prev_ncorr = closer.n_corrections
    C_est = -np.asarray(R).T @ np.asarray(t)
    err = np.linalg.norm(C_est - seq.t_wc[i])
    print(f"f{i:3d} st={st:14s} inl={tr.last_n_inliers:4d} "
          f"imu_ready={tr.imu_ready} pos_err={err:7.3f} {' '.join(ev)}",
          flush=True)
print("hits:", closer.hits)
print("corrections:", closer.n_corrections)
