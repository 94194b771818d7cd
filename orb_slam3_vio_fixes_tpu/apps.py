"""Shared CLI runner behind the example apps (L7).

Reference semantics: each Examples/*/<app>.cc is main() = load dataset →
construct System → per-frame Track* loop with timing → SaveTrajectory*
(e.g. Examples/Stereo-Inertial/stereo_inertial_euroc.cc). Here one generic
runner covers all dataset/sensor combinations; the thin scripts in
examples/ mirror the reference's per-app entry points.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

import numpy as np


def run_sequence(
    dataset: str,
    sensor_name: str,
    settings_path: str,
    seq_dir: str,
    out_traj: str,
    timestamps: Optional[str] = None,
    associations: Optional[str] = None,
    max_frames: Optional[int] = None,
    traj_format: str = "tum",
    viz_dir: Optional[str] = None,
    mavlink_cfg: Optional[dict] = None,
    vocab_path: Optional[str] = None,
    map_cfg=None,
    tracker_cfg=None,
) -> dict:
    from orb_slam3_vio_fixes_tpu.io import datasets
    from orb_slam3_vio_fixes_tpu.io.settings import load_settings
    from orb_slam3_vio_fixes_tpu.runtime import PipelineRunner
    from orb_slam3_vio_fixes_tpu.sensors import Sensor
    from orb_slam3_vio_fixes_tpu.system import SLAMSystem

    sensor = Sensor[sensor_name]

    if dataset in ("euroc", "tumvi"):
        seq = datasets.load_euroc(
            seq_dir, timestamps_file=timestamps,
            stereo=sensor.is_stereo, with_imu=sensor.has_imu)
    elif dataset == "kitti":
        seq = datasets.load_kitti(seq_dir, stereo=sensor.is_stereo)
    elif dataset == "tum_rgbd":
        seq = (datasets.load_tum_rgbd(seq_dir, associations_file=associations)
               if sensor.is_rgbd else datasets.load_tum_mono(seq_dir))
    else:
        raise ValueError(f"unknown dataset {dataset}")

    vocab = None
    if vocab_path:
        from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc

        vocab = voc.load(vocab_path)

    settings = load_settings(settings_path, sensor)
    slam = SLAMSystem(settings, sensor, vocab=vocab, map_cfg=map_cfg,
                      tracker_cfg=tracker_cfg)

    mavlink = None
    if mavlink_cfg:
        from orb_slam3_vio_fixes_tpu.vio import (
            GPSCoord, LoopbackTransport, MAVLinkInterface, TxMode, UARTTransfer)

        port = mavlink_cfg.get("port")
        transport = LoopbackTransport()
        if port:
            uart = UARTTransfer(port, mavlink_cfg.get("baudrate", 115200))
            if uart.connect():
                transport = uart
            else:
                print(f"[vio] could not open {port}; using loopback",
                      file=sys.stderr)
        origin = None
        if "gps_origin" in mavlink_cfg:
            o = mavlink_cfg["gps_origin"]
            origin = GPSCoord(o["lat"], o["lon"], o["alt"])
        mavlink = MAVLinkInterface(
            transport, mode=TxMode(mavlink_cfg.get("mode", "odometry")),
            gps_origin=origin)

    runner = PipelineRunner(slam, seq, mavlink=mavlink, max_frames=max_frames)
    res = runner.run()
    if mavlink is not None:
        mavlink.drain()

    save = {
        "tum": slam.save_trajectory_tum,
        "euroc": slam.save_trajectory_euroc,
        "kitti": slam.save_trajectory_kitti,
    }[traj_format]
    save(out_traj)

    summary = {
        "n_frames": res.n_frames,
        "fps": round(res.fps, 2),
        "n_keyframes": slam.n_keyframes(),
        "n_landmarks": slam.n_landmarks(),
        "final_state": str(slam.get_tracking_state()),
        "stage_times": res.times.summary(),
        "trajectory": out_traj,
    }
    if viz_dir:
        from orb_slam3_vio_fixes_tpu.viz import OfflineViewer

        viewer = OfflineViewer(viz_dir)
        viewer.finalize(map_state=slam.tracker.state,
                        trajectory=res.trajectory)
        summary["viz_dir"] = viz_dir
    return summary


def run_multisession(
    dataset: str,
    sensor_name: str,
    settings_path: str,
    seq_dirs: list,
    out_traj: str,
    timestamps: Optional[list] = None,
    max_frames: Optional[int] = None,
    traj_format: str = "tum",
    vocab_path: Optional[str] = None,
) -> dict:
    """Multi-session SLAM: several sequences through ONE system.

    Reference semantics: the example binaries accept multiple
    (sequence, timestamps) pairs and call System::ChangeDataset between them
    (e.g. Examples/Stereo-Inertial/stereo_inertial_euroc.cc main loop) — the
    tracker loses the map at the seam, spawns a fresh map in the Atlas
    (Tracking::CreateMapInAtlas, src/Tracking.cc:2662), and place recognition
    merges the sessions when revisiting (LoopClosing::MergeLocal).

    Requires a vocabulary; if none is given, a small one is trained on the
    first sequence's first frame (self-contained default for experiments).
    """
    from orb_slam3_vio_fixes_tpu.io import datasets
    from orb_slam3_vio_fixes_tpu.io.settings import load_settings
    from orb_slam3_vio_fixes_tpu.runtime import PipelineRunner
    from orb_slam3_vio_fixes_tpu.sensors import Sensor
    from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
    from orb_slam3_vio_fixes_tpu.system import SLAMSystem

    sensor = Sensor[sensor_name]
    seqs = []
    for i, d in enumerate(seq_dirs):
        tf = timestamps[i] if timestamps else None
        if dataset in ("euroc", "tumvi"):
            seqs.append(datasets.load_euroc(
                d, timestamps_file=tf, stereo=sensor.is_stereo,
                with_imu=sensor.has_imu))
        elif dataset == "kitti":
            seqs.append(datasets.load_kitti(d, stereo=sensor.is_stereo))
        else:
            raise ValueError(f"multisession supports euroc/tumvi/kitti, "
                             f"got {dataset}")

    if vocab_path:
        vocab = voc.load(vocab_path)
    else:
        from orb_slam3_vio_fixes_tpu.ops import orb as orb_ops

        img0 = seqs[0].frame(0)[1]
        feats = orb_ops.extract(np.asarray(img0, np.float32),
                                orb_ops.ORBConfig(n_features=1000))
        pool = np.asarray(feats.desc)[np.asarray(feats.valid)]
        vocab = voc.train(pool, branching=8, depth=2, seed=0)

    settings = load_settings(settings_path, sensor)
    slam = SLAMSystem(settings, sensor, vocab=vocab)

    per_session = []
    for i, seq in enumerate(seqs):
        runner = PipelineRunner(slam, seq, max_frames=max_frames)
        res = runner.run()
        per_session.append({
            "n_frames": res.n_frames, "fps": round(res.fps, 2),
            "n_keyframes": slam.n_keyframes(),
            "maps_stored": len(slam.atlas.stored) if slam.atlas else 0,
            "n_merges": slam.atlas.n_merges if slam.atlas else 0,
        })

    save = {
        "tum": slam.save_trajectory_tum,
        "euroc": slam.save_trajectory_euroc,
        "kitti": slam.save_trajectory_kitti,
    }[traj_format]
    save(out_traj)
    return {
        "sessions": per_session,
        "n_merges": slam.atlas.n_merges if slam.atlas else 0,
        "trajectory": out_traj,
    }


def main_template(dataset: str, sensor_name: str, description: str,
                  argv=None) -> int:
    """argparse main shared by the examples/ scripts."""
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("settings", help="calibration YAML (v1.0 schema)")
    ap.add_argument("seq_dir", help="dataset sequence directory")
    ap.add_argument("out_traj", help="output trajectory file")
    ap.add_argument("--timestamps", default=None,
                    help="EuRoC-style timestamp list file")
    ap.add_argument("--associations", default=None,
                    help="TUM-RGBD associations file")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--format", default="tum",
                    choices=("tum", "euroc", "kitti"))
    ap.add_argument("--viz-dir", default=None)
    ap.add_argument("--vocab", default=None, help="BoW vocabulary .npz")
    ap.add_argument("--vio-config", default=None,
                    help="JSON config enabling MAVLink output (fork layer)")
    args = ap.parse_args(argv)
    mavlink_cfg = None
    if args.vio_config:
        with open(args.vio_config) as f:
            mavlink_cfg = json.load(f)
    summary = run_sequence(
        dataset, sensor_name, args.settings, args.seq_dir, args.out_traj,
        timestamps=args.timestamps, associations=args.associations,
        max_frames=args.max_frames, traj_format=args.format,
        viz_dir=args.viz_dir, mavlink_cfg=mavlink_cfg, vocab_path=args.vocab)
    print(json.dumps(summary, indent=2))
    return 0
