"""End-to-end stereo tracking on a synthetic sequence (SURVEY.md §7 stage 5).

The TPU analogue of the reference's golden-dataset runs: render a synthetic
world along a known trajectory, run the full pipeline (ORB -> stereo match ->
motion-model tracking -> local mapping (triangulation/fusion/culling) ->
local BA), then score RMS ATE with the Horn-alignment harness.

Scene geometry matches EuRoC's stereo SNR regime (disparity 6-23 px): with a
too-small focal*baseline product the per-landmark depth noise creates an
errors-in-variables attenuation of the estimated motion that no SLAM system
can undo without IMU — the reference's own accuracy claims assume EuRoC
optics (fx=458, b=0.11 m, indoor depths).
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
    world = synthetic.make_world(rng, n_points=600, extent=7.0, depth_range=(2.5, 9.0))
    return synthetic.make_stereo_sequence(
        rng, n_frames=30, h=240, w=352, fx=260.0, baseline=0.2, world=world
    )


def small_cfg(seq):
    return tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=seq.imgs_l.shape[2], height=seq.imgs_l.shape[1],
        max_local_lm=1024,
        ba_window=6, ba_fixed=2,
        new_lm_budget=256,
        max_frames_between_kf=6,
    )


def test_stereo_tracking_ate(seq):
    cfg = small_cfg(seq)
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
    for i in range(seq.imgs_l.shape[0]):
        R, t, state = tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    assert tr.track_state == tracking.TrackState.OK
    assert tr.n_kf >= 3
    # estimated camera centers
    est_ts = np.array([x[0] for x in tr.trajectory])
    est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
    rmse, scale, n = ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos)
    assert n == len(seq.ts)
    # travelled ~1.2 m; demand centimetre-level tracking and no scale drift
    assert rmse < 0.015, f"ATE RMSE {rmse:.4f} m too high"
    d_est = np.linalg.norm(est_pos[-1] - est_pos[0])
    d_gt = np.linalg.norm(seq.t_wc[-1] - seq.t_wc[0])
    assert abs(d_est / d_gt - 1.0) < 0.02, f"scale drift {d_est / d_gt:.4f}"
