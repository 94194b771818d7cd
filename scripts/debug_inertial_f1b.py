"""Instrument the inertial tracker's pre-init visual branch stage by stage."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import inertial_tracking as it
from orb_slam3_vio_fixes_tpu.frontend import tracking as trk
from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

rng = np.random.default_rng(5)
seq = synthetic.make_loop_stereo_inertial_sequence(
    rng, n_frames=88, n_loop=72, h=240, w=352, fx=260.0,
    baseline=0.2, radius=3.0, wall_radius=9.0, n_points=1400)
noise = rng.normal(0, 2.0, seq.imgs_l.shape).astype(np.float32)
seq = seq._replace(imgs_l=seq.imgs_l + noise)

cfg = trk.TrackerConfig(
    orb=orb.ORBConfig(n_features=384, n_levels=4),
    map=ms.MapConfig(max_keyframes=96, max_landmarks=12288,
                     max_features=384),
    width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
    new_lm_budget=256, max_frames_between_kf=4,
)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
calib = pre.ImuCalib.make(1.7e-4, 2e-3, 1.9e-5, 3e-3, seq.imu_hz)
icfg = it.InertialConfig(
    frame_samples=16, kf_samples=128, init_min_kfs=4, init_min_time=0.5,
    vi_window=6, max_local_lm=1024, fix_scale=True,
)
tr = it.StereoInertialTracker(cam, seq.K[0, 0] * seq.baseline, calib,
                              cfg, icfg)
tr.match_radius = (15.0, 30.0)
tr.process_stereo_inertial(seq.imgs_l[0], seq.imgs_r[0], seq.ts[0],
                           np.zeros((0, 7), np.float32))
print("after init:", tr.track_state, "nkf", tr.n_kf, "nlm", tr.n_lm)
print("prev_obs bound:", int((np.asarray(tr.prev_obs) >= 0).sum()))

# manual frame-1 pipeline
frame = tr._build_stereo(seq.imgs_l[1], seq.imgs_r[1], seq.ts[1])
R_pred, t_pred = tr.R, tr.t
for rad in (7.0, 15.0, 30.0):
    cur_obs, n_m = trk.match_previous(
        tr.state, tr.prev_obs, tr.prev_octave, tr.prev_angle, R_pred, t_pred,
        frame, tr.cam, tr.bf, jnp.float32(rad), cfg)
    print(f"radius {rad}: n_m={int(n_m)}")

cur_obs, n_m = trk.match_previous(
    tr.state, tr.prev_obs, tr.prev_octave, tr.prev_angle, R_pred, t_pred,
    frame, tr.cam, tr.bf, jnp.float32(15.0), cfg)
R1, t1, cur_obs1, n_inl = trk.pose_opt_from_obs(
    tr.state, R_pred, t_pred, frame, cur_obs, tr.cam, tr.bf, cfg)
print("pose_opt: n_inl =", int(n_inl))
window = tr._local_window()
R2, t2, cur_obs2, n_inl2 = trk.track_local_map(
    tr.state, R1, t1, frame, cur_obs1, window, tr.cam, tr.bf,
    jnp.float32(1.0), cfg)
print("track_local_map: n_inl2 =", int(n_inl2))

# compare: the fused visual track_step on the same inputs
R2b, t2b, cur_obs_b, packed = trk.track_step(
    tr.state, tr.prev_obs, tr.prev_octave, tr.prev_angle, R_pred, t_pred, frame, window,
    tr.cam, tr.bf, jnp.float32(7.0), jnp.float32(14.0), jnp.float32(1.0),
    cfg)
pk = np.asarray(packed)
print("track_step: n_m =", pk[12], "n_inl2 =", pk[13])

# ---- match correctness vs ground truth ----
# frame-1 GT camera pose
R_cw_gt = seq.R_wc[1].T
t_cw_gt = -R_cw_gt @ seq.t_wc[1]
ids = np.clip(np.asarray(cur_obs), 0, tr.state.lm_pos.shape[0] - 1)
act = (np.asarray(cur_obs) >= 0)
X = np.asarray(tr.state.lm_pos)[ids]
Xc = X @ R_cw_gt.T + t_cw_gt
uv_gt = np.stack([seq.K[0, 0] * Xc[:, 0] / Xc[:, 2] + seq.K[0, 2],
                  seq.K[1, 1] * Xc[:, 1] / Xc[:, 2] + seq.K[1, 2]], 1)
uv_obs = np.asarray(frame.uv)
err = np.linalg.norm(uv_gt - uv_obs, axis=1)[act]
print(f"match reproj err @GT pose: n={act.sum()} p50={np.median(err):.2f} "
      f"p90={np.percentile(err, 90):.2f} frac<3px={(err < 3).mean():.2f}")

# ---- pose_opt from the GT pose seed ----
R1g, t1g, _, n_inl_g = trk.pose_opt_from_obs(
    tr.state, jnp.asarray(R_cw_gt), jnp.asarray(t_cw_gt), frame, cur_obs,
    tr.cam, tr.bf, cfg)
print("pose_opt from GT seed: n_inl =", int(n_inl_g))

# ---- how far is the identity seed from GT, in pixels? ----
Xc0 = X @ np.asarray(tr.R).T + np.asarray(tr.t)
uv0 = np.stack([seq.K[0, 0] * Xc0[:, 0] / Xc0[:, 2] + seq.K[0, 2],
                seq.K[1, 1] * Xc0[:, 1] / Xc0[:, 2] + seq.K[1, 2]], 1)
flow = np.linalg.norm(uv0 - uv_gt, axis=1)[act]
print(f"seed->GT pixel gap: p50={np.median(flow):.1f} p90={np.percentile(flow, 90):.1f}")
