"""End-to-end app runner test: YAML settings -> dataset dir -> trajectory."""

import json
import os

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.io import synthetic


SETTINGS_YAML = """\
%YAML:1.0
---
File.version: "1.0"
Camera.type: "Rectified"
Camera1.fx: {fx}
Camera1.fy: {fy}
Camera1.cx: {cx}
Camera1.cy: {cy}
Camera.width: {w}
Camera.height: {h}
Camera.fps: 20.0
Camera.RGB: 0
Camera.bf: {bf}
Stereo.ThDepth: 40.0
ORBextractor.nFeatures: 320
ORBextractor.nLevels: 4
ORBextractor.scaleFactor: 1.2
"""


@pytest.fixture(scope="module")
def disk_seq(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("euroc")
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=600, extent=7.0,
                                 depth_range=(2.5, 9.0))
    sseq = synthetic.make_stereo_sequence(
        rng, n_frames=6, h=240, w=352, fx=260.0, baseline=0.2, world=world)
    root = tmp / "MH_synth"
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
    for i in range(sseq.imgs_l.shape[0]):
        ts_ns = int(1e9 + i * 5e7)
        for cam, im in (("cam0", sseq.imgs_l[i]), ("cam1", sseq.imgs_r[i])):
            Image.fromarray(
                np.clip(np.asarray(im), 0, 255).astype(np.uint8)
            ).save(str(root / "mav0" / cam / "data" / f"{ts_ns}.png"))
    yaml_path = tmp / "settings.yaml"
    yaml_path.write_text(SETTINGS_YAML.format(
        fx=float(sseq.K[0, 0]), fy=float(sseq.K[1, 1]),
        cx=float(sseq.K[0, 2]), cy=float(sseq.K[1, 2]),
        w=352, h=240, bf=float(sseq.K[0, 0] * sseq.baseline)))
    return str(root), str(yaml_path), sseq


def test_run_sequence_euroc_stereo(disk_seq, tmp_path):
    from orb_slam3_vio_fixes_tpu.apps import run_sequence
    from orb_slam3_vio_fixes_tpu.frontend import tracking as trk
    from orb_slam3_vio_fixes_tpu.ops import orb as orb_mod
    from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms

    root, yaml_path, sseq = disk_seq
    out = str(tmp_path / "traj.txt")
    map_cfg = ms.MapConfig(max_keyframes=8, max_landmarks=2048,
                           max_features=320, n_levels=4)
    tracker_cfg = trk.TrackerConfig(
        orb=orb_mod.ORBConfig(n_features=320, n_levels=4),
        map=map_cfg, width=352, height=240,
        max_local_lm=512, ba_window=4, ba_fixed=2, new_lm_budget=128,
        max_frames_between_kf=6)
    summary = run_sequence(
        "euroc", "STEREO", yaml_path, root, out,
        map_cfg=map_cfg, tracker_cfg=tracker_cfg,
        viz_dir=str(tmp_path / "viz"),
        mavlink_cfg={"mode": "odometry"})
    assert summary["n_frames"] == 6
    assert summary["final_state"] == "OK"
    assert os.path.exists(out)
    lines = [l for l in open(out) if l.strip()]
    assert len(lines) == 6 and len(lines[0].split()) == 8  # TUM format
    assert os.path.exists(tmp_path / "viz" / "trajectory.png")
    assert "track" in summary["stage_times"]


def test_example_scripts_parse():
    """Example scripts share main_template and print usage on -h."""
    import subprocess
    import sys

    for script in ("examples/euroc_stereo.py", "examples/stereo_inertial_vio.py"):
        r = subprocess.run(
            [sys.executable, script, "-h"], capture_output=True, text=True,
            timeout=120,
        )
        assert r.returncode == 0, r.stderr
        assert "settings" in r.stdout


def test_run_multisession(disk_seq, tmp_path):
    """Two sessions through one system + Atlas (reference: multi-sequence
    example mode with System::ChangeDataset between sequences). Merge
    mechanics themselves are covered by test_atlas; here: the runner loops
    sessions, keeps one Atlas, and exports a combined trajectory."""
    from orb_slam3_vio_fixes_tpu.apps import run_multisession

    root, yaml_path, sseq = disk_seq
    out = str(tmp_path / "multi.txt")
    summary = run_multisession(
        "euroc", "STEREO", yaml_path, [root, root], out)
    assert len(summary["sessions"]) == 2
    assert os.path.exists(out)
    lines = [l for l in open(out) if l.strip()]
    assert len(lines) == 12  # both sessions' frames exported
