"""Per-frame diagnostic run of the stereo tracker on the synthetic sequence."""

import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import tracking, frame as frame_mod
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

rng = np.random.default_rng(7)
seq = synthetic.make_stereo_sequence(rng, n_frames=24, h=240, w=352, fx=260.0)
cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=400, n_levels=4),
    map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
    width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
    max_local_lm=1024, ba_window=5, ba_fixed=2, new_lm_budget=256, th_depth_factor=150.0,
)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)

# instrument: wrap internals
orig_match_prev = tracking.match_previous
orig_pose_opt = tracking.pose_opt_from_obs

for i in range(seq.imgs_l.shape[0]):
    fr = frame_mod.build_stereo_frame(
        jnp.asarray(seq.imgs_l[i], jnp.float32), jnp.asarray(seq.imgs_r[i], jnp.float32),
        jnp.float32(seq.ts[i]), cam, tr.bf, cfg.orb,
    )
    n_feat = int(fr.n)
    n_stereo = int(jnp.sum((fr.depth > 0) & fr.valid))
    R, t, state = tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    # ground truth pose error
    R_cw_gt = seq.R_wc[i].T
    t_cw_gt = -R_cw_gt @ seq.t_wc[i]
    C_est = -np.asarray(R).T @ np.asarray(t)
    err = np.linalg.norm(C_est - seq.t_wc[i])
    print(
        f"[{i:02d}] state={state:14s} feats={n_feat:4d} stereo={n_stereo:4d} "
        f"inl={tr.last_n_inliers:4d} kf={tr.n_kf} lm={tr.n_lm:5d} C_err={err:.4f}"
    )

est_ts = np.array([x[0] for x in tr.trajectory])
est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
rmse, scale, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
print(f"ATE RMSE: {rmse:.4f} m over {n} frames")
