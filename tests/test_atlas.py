"""Atlas multi-map e2e: tracking loss spawns a new map, revisiting known
terrain merges it back (reference: Tracking::CreateMapInAtlas
src/Tracking.cc:2662 + LoopClosing::MergeLocal src/LoopClosing.cc:1215)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import loop_closing as lc
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.frontend.frame import build_mono_frame
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import atlas as atlas_mod
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


def test_atlas_spawn_and_merge():
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    h, w, fx, baseline = 240, 352, 260.0, 0.2
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
    cam = Camera.pinhole(fx, fx, w / 2, h / 2)
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
        map=ms.MapConfig(max_keyframes=32, max_landmarks=8192, max_features=400),
        width=w, height=h, max_local_lm=1024, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=3,
    )
    f0 = build_mono_frame(jnp.asarray(stereo_at(R_wc[0], t_wc[0])[0]),
                          jnp.float32(0.0), cfg.orb)
    pool = np.asarray(f0.desc)[np.asarray(f0.valid)]
    vocab = voc.train(pool, branching=8, depth=2, seed=0)
    inv_s2 = tracking.octave_inv_sigma2(cfg.orb)

    closer = lc.LoopCloser(vocab, cam, cfg.map.max_keyframes, inv_s2,
                           lc.LoopConfig(min_gap_kfs=10**6))  # loop det. off
    atl = atlas_mod.Atlas(cfg.map, vocab, cam, inv_s2,
                          atlas_mod.AtlasConfig(min_stash_kfs=3))
    tr = tracking.StereoTracker(cam, fx * baseline, cfg,
                                loop_closer=closer, atlas=atl)
    tr.max_lost_frames = 3

    ts = 0.0
    for i in range(12):
        tr.process_stereo(*stereo_at(R_wc[i], t_wc[i]), ts)
        ts += 0.05
    assert tr.track_state == tracking.TrackState.OK
    assert tr.n_kf >= 3

    blank = np.zeros((h, w), np.float32)
    for _ in range(6):
        tr.process_stereo(blank, blank, ts)
        ts += 0.05
    # active map stashed, tracker restarted on a fresh map
    assert len(atl.stored) == 1
    assert tr.map_id == 1
    assert tr.track_state == tracking.TrackState.NOT_INITIALIZED

    # replay the trajectory from pose 2: a NEW map is built whose world frame
    # is pose-2's camera frame; after a few keyframes the merge fires
    for i in range(2, 12):
        tr.process_stereo(*stereo_at(R_wc[i], t_wc[i]), ts)
        ts += 0.05
    assert tr.track_state == tracking.TrackState.OK
    assert atl.n_merges == 1, "map merge did not fire"
    assert len(atl.stored) == 0
    assert tr.map_id == 2

    # after the merge, poses live in the ORIGINAL map's world frame
    C_est = -np.asarray(tr.R).T @ np.asarray(tr.t)
    assert np.linalg.norm(C_est - t_wc[11]) < 0.10, C_est
