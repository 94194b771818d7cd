"""End-to-end RGB-D tracking on a synthetic sequence (reference:
System::TrackRGBD src/System.cc:328, Frame::ComputeStereoFromRGBD
src/Frame.cc:984 — dense depth becomes synthetic right coordinates)."""

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


def test_rgbd_tracking_ate():
    rng = np.random.default_rng(11)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    seq = synthetic.make_rgbd_sequence(
        rng, n_frames=24, h=240, w=352, fx=260.0, world=world)
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs.shape[2], height=seq.imgs.shape[1],
        max_local_lm=1024, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=6,
    )
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    # synthetic bf for the ur residual (reference reads Camera.bf from yaml)
    tr = tracking.StereoTracker(cam, seq.K[0, 0] * 0.1, cfg)
    for i in range(seq.imgs.shape[0]):
        tr.process_rgbd(seq.imgs[i], seq.depths[i], seq.ts[i])
    assert tr.track_state == tracking.TrackState.OK
    assert tr.n_kf >= 3

    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n == len(seq.ts)
    assert rmse < 0.08, f"rgbd ATE {rmse:.3f} m too large"
