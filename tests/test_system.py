"""System facade tests: YAML settings, sensor dispatch, trajectory export,
atlas save/load + localization-only mode (reference: src/System.cc)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu import system as sysm
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.frontend.frame import build_mono_frame
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.io.settings import load_settings
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc

YAML = """
File.version: "1.0"
Camera.type: "Rectified"
Camera1.fx: 260.0
Camera1.fy: 260.0
Camera1.cx: 176.0
Camera1.cy: 120.0
Camera.width: 352
Camera.height: 240
Camera.fps: 20
Camera.RGB: 1
Camera.bf: 52.0
Stereo.ThDepth: 35.0
ORBextractor.nFeatures: 400
ORBextractor.nLevels: 4
ORBextractor.scaleFactor: 1.2
"""


@pytest.fixture(scope="module")
def settings_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "stereo.yaml"
    p.write_text(YAML)
    return str(p)


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    return synthetic.make_stereo_sequence(
        rng, n_frames=16, h=240, w=352, fx=260.0, baseline=0.2, world=world)


def small_map():
    return ms.MapConfig(max_keyframes=32, max_landmarks=4096,
                        max_features=400, n_levels=4)


def small_tracker_cfg():
    return tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=small_map(), width=352, height=240,
        max_local_lm=1024, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=4,
    )


def test_settings_parse(settings_path):
    s = load_settings(settings_path, sysm.Sensor.STEREO)
    assert s.cam1.fx == 260.0
    assert s.bf == 52.0
    assert s.n_features == 400


def test_settings_version_gate(tmp_path):
    p = tmp_path / "old.yaml"
    p.write_text("Camera.type: PinHole\n")
    with pytest.raises(Exception):
        load_settings(str(p), sysm.Sensor.STEREO)


def test_sensor_dispatch_guard(settings_path):
    slam = sysm.SLAMSystem(settings_path, sysm.Sensor.STEREO,
                           map_cfg=small_map())
    with pytest.raises(ValueError):
        slam.track_monocular(np.zeros((240, 352)), 0.0)


def test_system_stereo_and_snapshot(settings_path, seq, tmp_path):
    # vocab=None: this test attaches its own tiny vocabulary mid-run to
    # exercise the snapshot checksum; the default 10^4-word artifact would
    # leave a mismatched histogram database behind
    slam = sysm.SLAMSystem(settings_path, sysm.Sensor.STEREO, vocab=None,
                           map_cfg=small_map(),
                           tracker_cfg=small_tracker_cfg())
    for i in range(12):
        slam.track_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    assert slam.get_tracking_state() == tracking.TrackState.OK
    assert slam.n_keyframes() >= 2
    assert not slam.is_lost()

    tum = str(tmp_path / "traj_tum.txt")
    slam.save_trajectory_tum(tum)
    slam.save_trajectory_euroc(str(tmp_path / "traj_euroc.txt"))
    slam.save_trajectory_kitti(str(tmp_path / "traj_kitti.txt"))
    slam.save_keyframe_trajectory_tum(str(tmp_path / "kf_tum.txt"))
    lines = open(tum).read().strip().splitlines()
    assert len(lines) == 12 and len(lines[0].split()) == 8

    # snapshot round-trip with vocabulary checksum
    f0 = build_mono_frame(jnp.asarray(seq.imgs_l[0]), jnp.float32(0.0),
                          slam.cfg.orb)
    pool = np.asarray(f0.desc)[np.asarray(f0.valid)]
    vocab = voc.train(pool, branching=8, depth=2, seed=0)
    slam.vocab = vocab
    snap = str(tmp_path / "atlas.npz")
    slam.save_atlas(snap)

    slam2 = sysm.SLAMSystem(settings_path, sysm.Sensor.STEREO, vocab=vocab,
                            map_cfg=small_map(),
                            tracker_cfg=small_tracker_cfg())
    slam2.load_atlas(snap)
    assert slam2.n_keyframes() == slam.n_keyframes()
    assert slam2.n_landmarks() == slam.n_landmarks()

    # localization-only: relocalize into the loaded map, no map growth
    slam2.activate_localization_mode()
    n_kf = slam2.n_keyframes()
    for i in range(12, 16):
        slam2.track_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    assert slam2.get_tracking_state() == tracking.TrackState.OK
    assert slam2.n_keyframes() == n_kf, "localization mode must not add KFs"
    C_est = -np.asarray(slam2.tracker.R).T @ np.asarray(slam2.tracker.t)
    assert np.linalg.norm(C_est - seq.t_wc[15]) < 0.1


def test_vocab_checksum_mismatch(settings_path, seq, tmp_path):
    # share small_tracker_cfg with the other system tests: a unique
    # TrackerConfig here would compile its own kernel variants (the YAML-
    # derived config path is covered by test_settings_parse /
    # test_sensor_dispatch_guard, which never run the tracker)
    slam = sysm.SLAMSystem(settings_path, sysm.Sensor.STEREO, vocab=None,
                           map_cfg=small_map(),
                           tracker_cfg=small_tracker_cfg())
    for i in range(6):
        slam.track_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 2**32, size=(200, 8), dtype=np.uint32)
    v1 = voc.train(pool, branching=4, depth=2, seed=0)
    v2 = voc.train(pool, branching=4, depth=2, seed=1)
    slam.vocab = v1
    snap = str(tmp_path / "atlas2.npz")
    slam.save_atlas(snap)
    slam2 = sysm.SLAMSystem(settings_path, sysm.Sensor.STEREO, vocab=v2,
                            map_cfg=small_map(),
                            tracker_cfg=small_tracker_cfg())
    with pytest.raises(Exception):
        slam2.load_atlas(snap)
