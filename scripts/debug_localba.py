"""Measure what local_ba does to keyframe poses vs ground truth."""

import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

rng = np.random.default_rng(7)
seq = synthetic.make_stereo_sequence(rng, n_frames=14, h=240, w=352, fx=260.0)
cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=400, n_levels=4),
    map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
    width=352, height=240, max_local_lm=1024, ba_window=5, ba_fixed=2,
    new_lm_budget=256, th_depth_factor=150.0,
)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)

orig_local_ba = tracking.local_ba
kf_frame = {}  # kf_id -> frame index


def kf_errs(state, n_kf):
    errs = []
    for k in range(n_kf):
        fi = kf_frame[k]
        Rg = seq.R_wc[fi].T
        tg = -Rg @ seq.t_wc[fi]
        C = -np.asarray(state.kf_R[k]).T @ np.asarray(state.kf_t[k])
        Cg = seq.t_wc[fi]
        errs.append(np.linalg.norm(C - Cg))
    return np.array(errs)


def wrapped(state, adj, fixed, cam_, bf_, cfg_):
    pre_lm = np.asarray(state.lm_pos)
    pre = kf_errs(state, tr.n_kf)
    out, n_tr = orig_local_ba(state, adj, fixed, cam_, bf_, cfg_)
    post = kf_errs(out, tr.n_kf)
    dlm = np.linalg.norm(np.asarray(out.lm_pos) - pre_lm, axis=-1)
    lmv = np.asarray(out.lm_valid)
    print(f"  [localBA] kf errs pre {np.round(pre,4)} -> post {np.round(post,4)}  "
          f"|dlm| med {np.median(dlm[lmv]):.4f} max {dlm[lmv].max():.4f}")
    return out, n_tr


tracking.local_ba = wrapped
orig_insert = tr._insert_keyframe


def insert_hook(frame, R, t, cur_obs):
    kf_frame[tr.n_kf] = cur_i
    orig_insert(frame, R, t, cur_obs)


tr._insert_keyframe = insert_hook

for cur_i in range(seq.imgs_l.shape[0]):
    if cur_i == 0:
        kf_frame[0] = 0
    R, t, state = tr.process_stereo(seq.imgs_l[cur_i], seq.imgs_r[cur_i], seq.ts[cur_i])
    Rg = seq.R_wc[cur_i].T
    C = -np.asarray(R).T @ np.asarray(t)
    print(f"[{cur_i:02d}] {state:14s} inl={tr.last_n_inliers:3d} kf={tr.n_kf} "
          f"C_err={np.linalg.norm(C - seq.t_wc[cur_i]):.4f}")
