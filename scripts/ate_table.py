"""Per-sequence GT-trajectory ATE table -> ATE_r{N}.json (verdict item 9).

Renders synthetic stereo imagery along the reference's own EuRoC ground-truth
trajectories (evaluation/Ground_truth/EuRoC_left_cam) at the REAL camera rate
(GT files are 20 Hz; stride 1 = the 20 fps real-time setting of
Examples/Stereo-Inertial/EuRoC.yaml:47) and runs the production-config stereo
tracker over >=200 frames per sequence.

Usage: python scripts/ate_table.py [out.json] [n_frames]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

GT_DIR = "/root/reference/evaluation/Ground_truth/EuRoC_left_cam"
SEQUENCES = ["MH01", "MH02", "MH03", "MH04", "MH05",
             "V101", "V102", "V103", "V201"]


def run_sequence(name, n_frames=200, stride=1, n_features=1200, n_levels=8):
    rng = np.random.default_rng(3)
    seq = synthetic.make_gt_stereo_sequence(
        rng, os.path.join(GT_DIR, f"{name}_GT.txt"), n_frames=n_frames,
        stride=stride, h=480, w=752, fx=458.0, baseline=0.11, n_points=2000,
        depth_range=(3.0, 14.0))
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=n_features, n_levels=n_levels),
        map=ms.MapConfig(max_keyframes=128, max_landmarks=32768,
                         max_features=n_features),
        width=752, height=480, max_local_lm=2048, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=20,
    )
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
    tr.match_radius = (12.0, 24.0)
    t0 = time.perf_counter()
    n = seq.imgs_l.shape[0]
    for i in range(n):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    tr.flush()
    wall = time.perf_counter() - t0
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n_assoc = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    path = float(np.linalg.norm(np.diff(seq.t_wc, axis=0), axis=1).sum())
    return dict(sequence=name, ate_rmse_m=round(float(rmse), 4),
                n_frames=int(n), n_assoc=int(n_assoc),
                path_m=round(path, 2),
                drift_pct=round(100.0 * float(rmse) / max(path, 1e-9), 2),
                state=tr.track_state, n_keyframes=len(tr.kf_order),
                fps=round(n / wall, 1))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ATE_r04.json"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    rows = []
    for name in SEQUENCES:
        p = os.path.join(GT_DIR, f"{name}_GT.txt")
        if not os.path.isfile(p):
            continue
        r = run_sequence(name, n_frames=n_frames)
        rows.append(r)
        print(json.dumps(r), flush=True)
    summary = dict(
        config="stereo, 1200 features, 8 levels, 752x480, stride 1 (20 fps)",
        n_frames=n_frames,
        mean_ate_m=round(float(np.mean([r["ate_rmse_m"] for r in rows])), 4),
        sequences=rows,
    )
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {out_path}: mean ATE {summary['mean_ate_m']} m")


if __name__ == "__main__":
    main()
