"""Keyframe culling + capacity-tier growth (VERDICT r1 item 5).

Reference semantics: LocalMapping::KeyFrameCulling removes keyframes whose
landmarks are redundantly observed (src/LocalMapping.cc:902-1054) and
KeyFrame::SetBadFlag excises them from the graph (src/KeyFrame.cc:573-679);
the TPU design additionally needs capacity-tier doubling because map arrays
are fixed-shape (SURVEY.md §7 hard-part #1).
"""

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import tracking
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
        rng, n_frames=36, h=240, w=352, fx=260.0, baseline=0.2, world=world
    )


def _cfg(seq, **kw):
    base = dict(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096,
                         max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024, ba_window=6, ba_fixed=2, new_lm_budget=256,
        max_frames_between_kf=6,
    )
    base.update(kw)
    return tracking.TrackerConfig(**base)


def _run(tr, seq, n=None):
    n = n or seq.imgs_l.shape[0]
    for i in range(n):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    return tr


def _ate(tr, seq):
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, _, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n == len(est_ts)
    return rmse


@pytest.mark.slow
def test_culling_bounds_keyframes(seq):
    # force a keyframe every 2 frames -> heavy redundancy -> culling fires
    cfg = _cfg(seq, max_frames_between_kf=2, kf_cull_every=2)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = _run(tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg),
              seq)
    assert tr.track_state == tracking.TrackState.OK
    n_live = len(tr.kf_order)
    assert n_live < tr.n_kf, "culling never removed a keyframe"
    # the map stays consistent: tracking accuracy survives culling
    assert _ate(tr, seq) < 0.02
    # excised slots are really dead
    valid = np.asarray(tr.state.kf_valid)
    assert valid.sum() == n_live
    live_set = set(tr.kf_order)
    for k in range(tr.n_kf):
        if k not in live_set:
            assert not valid[k]
            assert (np.asarray(tr.state.kf_obs[k]) == -1).all()


@pytest.mark.slow
def test_trajectory_survives_culling(seq):
    """Frames whose reference keyframe is culled are re-based onto its live
    predecessor (reference: mTcp chaining in SetBadFlag + SaveTrajectory)."""
    cfg = _cfg(seq, max_frames_between_kf=2, kf_cull_every=2)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = _run(tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg),
              seq)
    live = set(tr.kf_order)
    for e in tr.traj:
        assert e[1] == -1 or e[1] in live, "trajectory references a dead KF"


def test_capacity_growth(seq):
    # tiny initial tier: 8 keyframe slots, forced insertion -> must grow
    cfg = _cfg(seq, map=ms.MapConfig(max_keyframes=8, max_landmarks=4096,
                                     max_features=400),
               max_frames_between_kf=2, ba_window=4, ba_fixed=2,
               enable_kf_culling=False)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = _run(tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg),
              seq, n=24)
    assert tr.n_kf > 8, "sequence did not exceed the initial tier"
    assert tr.cfg.map.max_keyframes >= 16
    assert tr.track_state == tracking.TrackState.OK
    assert _ate(tr, seq) < 0.02
