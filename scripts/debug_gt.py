"""Debug the V101/MH03 GT ATE misses: per-frame error accumulation and
sensitivity to the motion-model match radius."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

GT_DIR = "/root/reference/evaluation/Ground_truth/EuRoC_left_cam"


def run(gt_file, radius=(7.0, 14.0), th_local=1.0, n_frames=48, stride=3,
        verbose=False):
    rng = np.random.default_rng(3)
    seq = synthetic.make_gt_stereo_sequence(
        rng, os.path.join(GT_DIR, gt_file), n_frames=n_frames, stride=stride,
        h=240, w=352, fx=260.0, baseline=0.2, n_points=1200)
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=8192,
                         max_features=400),
        width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=5,
    )
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
    tr.match_radius = radius
    tr.th_local_base = th_local
    # per-frame displacement of GT (informational)
    d = np.linalg.norm(np.diff(seq.t_wc, axis=0), axis=1)
    print(f"{gt_file} stride={stride}: frame displacement "
          f"p50={np.median(d):.3f} max={d.max():.3f} m")
    for i in range(seq.imgs_l.shape[0]):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
        if verbose:
            est = np.array([-np.asarray(tr.R).T @ np.asarray(tr.t)])
            print(f"  f{i:3d} st={tr.track_state:14s} "
                  f"inl={tr.last_n_inliers:4d} nkf={tr.n_kf}")
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    print(f"{gt_file} radius={radius} th_local={th_local}: "
          f"ATE {rmse:.4f} (n={n}) state={tr.track_state}")
    return rmse


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "V101_GT.txt"
    run(which, verbose=("-v" in sys.argv))
    run(which, radius=(12.0, 24.0))
    run(which, radius=(12.0, 24.0), th_local=1.5)
