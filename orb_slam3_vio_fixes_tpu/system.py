"""System facade: sensor modes and the top-level SLAM entry point.

TPU-native analogue of the reference's System class (reference:
include/System.h:87-94 sensor enum, src/System.cc:41-242 constructor wiring,
TrackStereo/TrackRGBD/TrackMonocular at src/System.cc:244-474).

The full facade is assembled as the pipeline layers land; this module always
exposes the public sensor-mode surface so downstream code has one import
point.
"""

from __future__ import annotations

import enum


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4
    IMU_RGBD = 5

    @property
    def has_imu(self) -> bool:
        return self in (Sensor.IMU_MONOCULAR, Sensor.IMU_STEREO, Sensor.IMU_RGBD)

    @property
    def is_stereo(self) -> bool:
        return self in (Sensor.STEREO, Sensor.IMU_STEREO)

    @property
    def is_rgbd(self) -> bool:
        return self in (Sensor.RGBD, Sensor.IMU_RGBD)

    @property
    def is_monocular(self) -> bool:
        return self in (Sensor.MONOCULAR, Sensor.IMU_MONOCULAR)


class SLAMSystem:
    """Top-level facade (under construction; see frontend/tracking once built)."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "SLAMSystem facade lands with the end-to-end tracking slice; "
            "use the layer modules directly for now."
        )
