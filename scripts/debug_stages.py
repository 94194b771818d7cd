"""Stage-level diagnostics: pose error after predict / match / opt1 / local."""

import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import tracking, frame as frame_mod
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

rng = np.random.default_rng(7)
N_FRAMES = 10
seq = synthetic.make_stereo_sequence(rng, n_frames=N_FRAMES, h=240, w=352, fx=260.0)
cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=400, n_levels=4),
    map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
    width=352, height=240, max_local_lm=1024, ba_window=5, ba_fixed=2,
    new_lm_budget=256, th_depth_factor=150.0,
)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)


def gt_pose(i):
    R_cw = seq.R_wc[i].T
    return R_cw, -R_cw @ seq.t_wc[i]


def err(R, t, i):
    Rg, tg = gt_pose(i)
    C = -np.asarray(R).T @ np.asarray(t)
    Cg = -Rg.T @ tg
    dC = np.linalg.norm(C - Cg)
    dR = np.asarray(R) @ Rg.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return dC, ang


tr.process_stereo(seq.imgs_l[0], seq.imgs_r[0], seq.ts[0])
print(f"init: lm={tr.n_lm}")

# check initial landmark quality: depth error vs gt world points
st = tr.state
for i in range(1, N_FRAMES):
    frame = frame_mod.build_stereo_frame(
        jnp.asarray(seq.imgs_l[i], jnp.float32), jnp.asarray(seq.imgs_r[i], jnp.float32),
        jnp.float32(seq.ts[i]), cam, tr.bf, cfg.orb,
    )
    if tr.vel is not None:
        dR, dt = tr.vel
        R_pred = dR @ tr.R
        t_pred = dR @ tr.t + dt
    else:
        R_pred, t_pred = tr.R, tr.t
    e0 = err(R_pred, t_pred, i)
    cur_obs, n_m = tracking.match_previous(
        tr.state, tr.prev_obs, tr.prev_octave, tr.prev_angle, R_pred, t_pred, frame, cam, tr.bf,
        jnp.float32(7.0), cfg)
    R1, t1, cur_obs1, n1 = tracking.pose_opt_from_obs(
        tr.state, R_pred, t_pred, frame, cur_obs, cam, tr.bf, cfg)
    e1 = err(R1, t1, i)
    window = tr._local_window()
    R2, t2, cur_obs2, n2 = tracking.track_local_map(
        tr.state, R1, t1, frame, cur_obs1, window, cam, tr.bf, jnp.float32(1.0), cfg)
    e2 = err(R2, t2, i)
    print(
        f"[{i:02d}] pred dC={e0[0]:.4f} ang={e0[1]:.3f} | match={int(n_m):3d} "
        f"opt1 dC={e1[0]:.4f} ang={e1[1]:.3f} inl={int(n1):3d} | "
        f"local dC={e2[0]:.4f} ang={e2[1]:.3f} inl={int(n2):3d}"
    )
    # now run the real pipeline step to advance state
    tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    e3 = err(tr.R, tr.t, i)
    print(f"     final dC={e3[0]:.4f} kf={tr.n_kf} lm={tr.n_lm}")
