"""Ground-truth-trajectory accuracy gates: render synthetic imagery along a
REAL EuRoC ground-truth trajectory (reference's own evaluation/Ground_truth
files) and gate the stereo pipeline's RMS ATE against it — the golden-dataset
analogue the reference uses as its only test strategy (SURVEY.md §4; GT files
/root/reference/evaluation/Ground_truth/EuRoC_left_cam/*.txt)."""

import os

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

GT_DIR = "/root/reference/evaluation/Ground_truth/EuRoC_left_cam"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GT_DIR), reason="reference GT files not available")


def _run_gt(gt_file, n_frames=48, stride=3, ate_bound=0.05):
    # calibrated: MH01 at this config tracks at ~0.013 m ATE over a ~2.7 m
    # path (bound keeps ~4x headroom); stride > 4 under-samples the motion
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
    for i in range(seq.imgs_l.shape[0]):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    assert tr.track_state == tracking.TrackState.OK
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n == len(seq.ts)
    assert rmse < ate_bound, f"{gt_file}: ATE {rmse:.4f} >= {ate_bound}"
    return rmse


def test_gt_mh01_stereo_ate():
    """MH01 (machine-hall, gentle drone flight)."""
    _run_gt("MH01_GT.txt")


@pytest.mark.slow
def test_gt_v101_stereo_ate():
    """V101 (Vicon room, hand-held-style motion with revisits)."""
    _run_gt("V101_GT.txt")


@pytest.mark.slow
def test_gt_mh03_stereo_ate():
    """MH03 (faster machine-hall flight)."""
    _run_gt("MH03_GT.txt")
