"""Relocalization e2e: lose tracking on blank frames, recover by BoW + PnP
(reference: Tracking::Relocalization src/Tracking.cc:3609-3777)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.frontend import loop_closing as lc
from orb_slam3_vio_fixes_tpu.frontend import relocalization as rl
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.frontend.frame import build_mono_frame
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


def test_relocalize_after_blackout():
    rng = np.random.default_rng(3)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    h, w, fx, baseline = 240, 352, 260.0, 0.2
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
    cam = Camera.pinhole(fx, fx, w / 2, h / 2)

    # out leg (12 frames), blackout (4), return to the pose of frame 6
    R_wc, t_wc = synthetic.orbit_trajectory(12, 0.05, speed=(0.8, 0.0, 0.1),
                                            yaw_rate=0.05)
    def stereo_at(Rw, tw):
        R_cw = Rw.T
        img_l = synthetic.render(world, K, R_cw, -R_cw @ tw, h, w)
        C_r = tw + Rw @ np.array([baseline, 0, 0], np.float32)
        img_r = synthetic.render(world, K, R_cw, -R_cw @ C_r, h, w)
        return img_l, img_r

    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
        width=w, height=h, max_local_lm=1024, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=4,
    )
    # vocabulary from the first frame's descriptors
    f0 = build_mono_frame(jnp.asarray(stereo_at(R_wc[0], t_wc[0])[0]),
                          jnp.float32(0.0), cfg.orb)
    pool = np.asarray(f0.desc)[np.asarray(f0.valid)]
    vocab = voc.train(pool, branching=8, depth=2, seed=0)

    closer = lc.LoopCloser(vocab, cam, cfg.map.max_keyframes,
                           tracking.octave_inv_sigma2(cfg.orb),
                           lc.LoopConfig(min_gap_kfs=10**6))  # detection off
    reloc = rl.Relocalizer(vocab, lambda: closer.db)
    tr = tracking.StereoTracker(cam, fx * baseline, cfg,
                                loop_closer=closer, relocalizer=reloc)

    ts = 0.0
    for i in range(12):
        img_l, img_r = stereo_at(R_wc[i], t_wc[i])
        tr.process_stereo(img_l, img_r, ts)
        ts += 0.05
    assert tr.track_state == tracking.TrackState.OK
    n_kf_before = tr.n_kf

    blank = np.zeros((h, w), np.float32)
    for _ in range(4):
        tr.process_stereo(blank, blank, ts)
        ts += 0.05
    assert tr.track_state in (tracking.TrackState.RECENTLY_LOST,
                              tracking.TrackState.LOST)

    # jump back to the viewpoint of frame 6 — only place recognition can
    # recover from here (motion model is invalid after the teleport)
    img_l, img_r = stereo_at(R_wc[6], t_wc[6])
    tr.process_stereo(img_l, img_r, ts)
    assert tr.track_state == tracking.TrackState.OK
    assert reloc.n_success == 1
    C_est = -np.asarray(tr.R).T @ np.asarray(tr.t)
    assert np.linalg.norm(C_est - t_wc[6]) < 0.05
