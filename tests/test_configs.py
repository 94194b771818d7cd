"""Shipped dataset configs parse through the v1.0 settings reader."""

import os

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.io.settings import load_settings
from orb_slam3_vio_fixes_tpu.sensors import Sensor

CFG = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def test_euroc_yaml():
    s = load_settings(os.path.join(CFG, "EuRoC.yaml"), Sensor.IMU_STEREO)
    assert s.cam1.fx == pytest.approx(458.654)
    assert s.cam2 is not None
    assert s.T_c1_c2.shape == (4, 4)
    # bf derived from the stereo baseline when Camera.bf is absent
    assert s.bf == pytest.approx(458.654 * 0.110074, rel=1e-3)
    assert s.imu_freq == 200.0 and s.T_bc.shape == (4, 4)
    assert s.n_features == 1200 and s.n_levels == 8
    assert s.width == 752 and s.height == 480


def test_tum_vi_yaml():
    s = load_settings(os.path.join(CFG, "TUM-VI.yaml"), Sensor.IMU_STEREO)
    assert s.camera_type == "KannalaBrandt8"
    assert s.cam1.fx == pytest.approx(190.978477)
    assert s.width == 512
    assert s.noise_acc == pytest.approx(0.0028)


def test_kitti_yaml():
    s = load_settings(os.path.join(CFG, "KITTI00-02.yaml"), Sensor.STEREO)
    assert s.camera_type == "Rectified"
    assert s.bf == pytest.approx(386.1448)
    assert s.cam2 is None  # rectified: single intrinsics


def test_tum1_and_d455_yaml():
    s = load_settings(os.path.join(CFG, "TUM1.yaml"), Sensor.RGBD)
    assert s.cam1.fx == pytest.approx(517.306408)
    assert s.bf == pytest.approx(40.0)
    s2 = load_settings(os.path.join(CFG, "D455.yaml"), Sensor.RGBD)
    assert s2.camera_type == "Rectified"
    assert s2.fps == 30.0
