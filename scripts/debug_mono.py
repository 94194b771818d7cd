"""Debug driver: monocular tracking on a synthetic sequence."""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import tracking, mono_tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


def main():
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    seq = synthetic.make_stereo_sequence(
        rng, n_frames=30, h=240, w=352, fx=260.0, baseline=0.2, world=world,
        speed=(0.9, 0.0, 0.15), yaw_rate=0.05,
    )
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=6,
    )
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = mono_tracking.MonocularTracker(cam, cfg)
    for i in range(seq.imgs_l.shape[0]):
        R, t, st = tr.process_mono(seq.imgs_l[i], seq.ts[i])
        C = -R.T @ t
        print(f"[{i:02d}] state={st:<14s} inl={tr.last_n_inliers:4d} "
              f"kf={tr.n_kf} lm={tr.n_lm:5d} C=({C[0]:+.2f},{C[1]:+.2f},{C[2]:+.2f})")
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, scale, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos,
                                  with_scale=True)
    print(f"ATE RMSE (scale-aligned): {rmse:.4f} m, scale={scale:.3f}, n={n}")


if __name__ == "__main__":
    main()
