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


def _run_gt(gt_file, n_frames=120, stride=1, ate_bound=0.05):
    """GT-trajectory gate at the REFERENCE camera rate.

    The GT files sample at 20 Hz — exactly the EuRoC camera rate the
    reference runs real-time (Examples/Stereo-Inertial/EuRoC.yaml:47), so
    stride=1 is reference parity. (The round-3 gates used stride=3 = a
    6.7 fps camera, 3x harder inter-frame motion than any supported config —
    the V101/MH03 "accuracy" failures were that, plus a too-strict stereo
    init gate delaying initialization by seconds.) The production-config
    per-sequence table over all of MH01-05/V101-103/V201 is
    scripts/ate_table.py -> ATE_r04.json (mean 0.0085 m at 1200 features)."""
    rng = np.random.default_rng(3)
    # n_points scales with trajectory length: the generator spreads sprites
    # along anchor poses, so per-view density (what tracking sees) drops as
    # frames grow — 20 sprites/frame keeps ~150 tracked inliers per frame
    seq = synthetic.make_gt_stereo_sequence(
        rng, os.path.join(GT_DIR, gt_file), n_frames=n_frames, stride=stride,
        h=240, w=352, fx=260.0, baseline=0.2, n_points=20 * n_frames)
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=64, max_landmarks=8192,
                         max_features=400),
        width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=5,
    )
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
    tr.match_radius = (12.0, 24.0)
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
    """V101 (Vicon room: static start, takeoff jerk, hand-held-like)."""
    _run_gt("V101_GT.txt")


@pytest.mark.slow
def test_gt_mh03_stereo_ate():
    """MH03 (faster machine-hall flight) — the hardest stereo gate; bound
    keeps ~1.6x headroom over the measured 0.05."""
    _run_gt("MH03_GT.txt", ate_bound=0.08)


@pytest.mark.slow
def test_gt_mh05_stereo_ate():
    """MH05 (fast + dark-section analogue)."""
    _run_gt("MH05_GT.txt")


@pytest.mark.slow
def test_gt_v201_stereo_ate():
    """V201 (second Vicon room)."""
    _run_gt("V201_GT.txt")
