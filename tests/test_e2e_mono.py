"""End-to-end monocular tracking on a synthetic sequence.

Mirrors the reference's monocular golden-dataset runs (two-view
initialization, up-to-scale trajectory; reference: MonocularInitialization
src/Tracking.cc:2448 + CreateInitialMapMonocular :2526): score RMS ATE with
the scale-aligned Horn harness (evaluate_ate_scale.py's mono mode).
"""

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import mono_tracking, tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    return synthetic.make_stereo_sequence(
        rng, n_frames=26, h=240, w=352, fx=260.0, baseline=0.2, world=world,
        speed=(0.9, 0.0, 0.15), yaw_rate=0.05,
    )


def test_mono_tracking_ate(seq):
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
        tr.process_mono(seq.imgs_l[i], seq.ts[i])
    assert tr.track_state == tracking.TrackState.OK
    assert tr.n_kf >= 3

    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, scale, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos,
                                  with_scale=True)
    assert n == len(seq.ts)
    # mono is up-to-scale: the Horn scale absorbs the global gauge, the
    # residual ATE must be small relative to the ~2.4 m path
    assert rmse < 0.10, f"mono ATE {rmse:.3f} m too large (scale {scale:.2f})"
