"""End-to-end stereo tracking on a synthetic sequence (SURVEY.md §7 stage 5).

The TPU analogue of the reference's golden-dataset runs: render a synthetic
world along a known trajectory, run the full pipeline (ORB -> stereo match ->
motion-model tracking -> local map -> keyframes -> local BA), then score RMS
ATE with the Horn-alignment harness.
"""

import numpy as np
import jax.numpy as jnp
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
    return synthetic.make_stereo_sequence(rng, n_frames=30, h=240, w=352, fx=260.0)


def small_cfg(seq):
    return tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024,
        ba_window=5, ba_fixed=2,
        new_lm_budget=256,
    )


@pytest.mark.xfail(strict=False, reason="E2E accuracy tuning in progress (stage 5)")
def test_stereo_tracking_ate(seq):
    cfg = small_cfg(seq)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
    for i in range(seq.imgs_l.shape[0]):
        R, t, state = tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    assert tr.track_state == tracking.TrackState.OK
    assert tr.n_kf >= 2
    # estimated camera centers
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, scale, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n == len(seq.ts)
    # travelled ~0.45 m; demand centimetre-level tracking
    assert rmse < 0.03, f"ATE RMSE {rmse:.4f} m too high"
