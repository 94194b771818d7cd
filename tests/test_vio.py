"""Fork-layer VIO tests: frame conversions, MAVLink framing, interface."""

import math

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.vio import (
    GPSCoord,
    LoopbackTransport,
    MAVLinkEncoder,
    MAVLinkInterface,
    OdometryData,
    TxMode,
    camera_to_ned,
    ned_to_gps,
    parse_frames,
)
from orb_slam3_vio_fixes_tpu.vio import mavlink as mv


def test_camera_to_ned_axes():
    # camera moves 1m forward (+Z cam) -> 1m north; 1m right (+X) -> 1m west
    out = camera_to_ned(np.eye(3), np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(out["pos"], [1.0, 0.0, 0.0], atol=1e-12)
    out = camera_to_ned(np.eye(3), np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(out["pos"], [0.0, -1.0, 0.0], atol=1e-12)
    # camera down (+Y) -> NED down
    out = camera_to_ned(np.eye(3), np.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(out["pos"], [0.0, 0.0, 1.0], atol=1e-12)
    # identity attitude -> yaw shifted by +pi/2 (reference fixup)
    assert abs(out["rpy"][2] - math.pi / 2) < 1e-9
    # velocity uses the same rotation
    out = camera_to_ned(np.eye(3), np.zeros(3), v_w=np.array([0, 0, 2.0]))
    np.testing.assert_allclose(out["vel"], [2.0, 0.0, 0.0], atol=1e-12)


def test_ned_to_gps_roundtrip_scale():
    origin = GPSCoord(47.0, 8.0, 500.0)
    g = ned_to_gps(111.194927, 0.0, -10.0, origin)  # ~1e-3 deg of latitude
    assert abs((g.lat - origin.lat) - 0.001) < 1e-6
    assert g.alt == pytest.approx(510.0)
    g = ned_to_gps(0.0, 100.0, 0.0, origin)
    expected_dlon = math.degrees(100.0 / (6371000.0 * math.cos(math.radians(47.0))))
    assert g.lon - origin.lon == pytest.approx(expected_dlon)


def test_mavlink_heartbeat_framing():
    enc = MAVLinkEncoder(system_id=7, component_id=42)
    buf = enc.heartbeat() + enc.heartbeat()
    frames = parse_frames(buf)
    assert len(frames) == 2
    for k, f in enumerate(frames):
        assert f["msgid"] == mv.MSG_HEARTBEAT
        assert f["sysid"] == 7 and f["compid"] == 42
        assert f["seq"] == k
        assert f["crc_ok"] is True


def test_mavlink_odometry_payload():
    enc = MAVLinkEncoder()
    d = OdometryData(
        time_usec=123456, x=1.5, y=-2.0, z=0.25, q=(1.0, 0.0, 0.0, 0.0),
        vx=0.1, vy=0.2, vz=0.3,
    )
    frames = parse_frames(enc.odometry(d))
    assert len(frames) == 1 and frames[0]["crc_ok"]
    p = frames[0]["payload"]
    import struct

    t = struct.unpack("<Q", p[:8])[0]
    x, y, z = struct.unpack("<3f", p[8:20])
    q = struct.unpack("<4f", p[20:36])
    assert t == 123456
    assert (x, y, z) == pytest.approx((1.5, -2.0, 0.25))
    assert q == pytest.approx((1.0, 0.0, 0.0, 0.0))


def test_mavlink_vision_position_yaw():
    enc = MAVLinkEncoder()
    yaw = 0.7
    q = (math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2))
    d = OdometryData(time_usec=1, x=0, y=0, z=0, q=q)
    frames = parse_frames(enc.vision_position_estimate(d))
    import struct

    p = frames[0]["payload"]
    vals = struct.unpack("<Q6f", p[:32].ljust(32, b"\0"))
    assert vals[6] == pytest.approx(yaw, abs=1e-6)
    assert frames[0]["crc_ok"]


def test_mavlink_gps_input_coords():
    enc = MAVLinkEncoder()
    frames = parse_frames(enc.gps_input(99, 47.5, 8.25, 432.1))
    import struct

    p = frames[0]["payload"]
    lat, lon = struct.unpack("<ii", p[12:20])
    assert lat == int(47.5e7) and lon == int(82500000)
    assert frames[0]["crc_ok"]


def test_interface_modes_and_queue():
    tp = LoopbackTransport()
    itf = MAVLinkInterface(tp, mode=TxMode.VISION_POSITION_SPEED)
    R = np.eye(3)
    for i in range(3):
        itf.publish_pose(i * 0.05, R, np.array([0.0, 0.0, 0.1 * i]))
    itf.drain()
    frames = parse_frames(bytes(tp.buffer))
    ids = [f["msgid"] for f in frames]
    assert ids == [
        mv.MSG_VISION_POSITION_ESTIMATE,
        mv.MSG_VISION_SPEED_ESTIMATE,
    ] * 3
    assert all(f["crc_ok"] for f in frames)


def test_interface_gps_mode_and_reset():
    tp = LoopbackTransport()
    itf = MAVLinkInterface(
        tp, mode=TxMode.GPS_INPUT, gps_origin=GPSCoord(47.0, 8.0, 100.0)
    )
    itf.publish_pose(1.0, np.eye(3), np.array([0.0, 0.0, 50.0]))  # 50m fwd = north
    itf.notify_reset()
    assert itf.reset_counter == 1
    itf.drain()
    frames = parse_frames(bytes(tp.buffer))
    assert frames[0]["msgid"] == mv.MSG_GPS_INPUT and frames[0]["crc_ok"]


def test_interface_queue_bounded():
    tp = LoopbackTransport()
    itf = MAVLinkInterface(tp, mode=TxMode.ODOMETRY, max_queue=5)
    for i in range(12):
        itf.publish_pose(float(i), np.eye(3), np.zeros(3))
    assert itf.queue.qsize() == 5  # oldest dropped, like the reference queue
    itf.drain()
    assert itf.n_sent == 5
