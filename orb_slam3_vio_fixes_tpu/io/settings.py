"""Typed YAML settings parser (calibration files, v1.0 schema).

Reference semantics: include/Settings.h:39-231 / src/Settings.cc:184-520 —
`File.version: "1.0"` gate, Camera1/Camera2 intrinsics (PinHole /
KannalaBrandt8 / Rectified), Stereo.T_c1_c2 + bf, IMU noise/extrinsics/
frequency, ORBextractor params, and the same abort-with-offending-key
behavior for missing required fields. The reference's example YAMLs
(Examples/Stereo-Inertial/EuRoC.yaml, TUM-VI.yaml) parse unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from orb_slam3_vio_fixes_tpu.sensors import Sensor
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


class SettingsError(KeyError):
    pass


def _load_yaml(path: str) -> dict:
    """Parse an (possibly OpenCV-style) YAML file into a flat dict.

    OpenCV FileStorage YAML starts with '%YAML:1.0' which PyYAML rejects —
    strip the directive like everyone does.
    """
    import yaml

    with open(path) as f:
        text = f.read()
    lines = [
        ln for ln in text.splitlines()
        if not ln.startswith("%YAML") and not ln.startswith("---")
    ]
    return yaml.safe_load("\n".join(lines)) or {}


@dataclasses.dataclass
class Settings:
    sensor: Sensor
    camera_type: str
    cam1: Camera
    cam2: Optional[Camera]
    width: int
    height: int
    new_width: Optional[int]
    new_height: Optional[int]
    fps: float
    rgb: bool
    bf: float
    th_depth: float
    # stereo extrinsics (camera1 -> camera2)
    T_c1_c2: Optional[np.ndarray]
    # IMU
    noise_gyro: float = 0.0
    noise_acc: float = 0.0
    walk_gyro: float = 0.0
    walk_acc: float = 0.0
    imu_freq: float = 0.0
    T_bc: Optional[np.ndarray] = None
    insert_kfs_when_lost: bool = True
    # ORB
    n_features: int = 1200
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_th: int = 20
    fast_th_min: int = 7
    # Atlas
    load_file: str = ""
    save_file: str = ""
    # distortion (radial-tangential [k1,k2,p1,p2,k3]; empty = none)
    dist1: Optional[np.ndarray] = None
    dist2: Optional[np.ndarray] = None
    # precomputed rectification/undistortion (see precompute_rectification)
    rect: Optional[object] = None
    undist_map: Optional[np.ndarray] = None

    @property
    def needs_rectification(self) -> bool:
        """Distorted stereo pinhole rig → must remap both eyes per frame
        (reference: Settings::needToRectify, src/Settings.cc:81-96)."""
        return (
            self.sensor.is_stereo
            and self.camera_type == "PinHole"
            and self.T_c1_c2 is not None
            and (self.dist1 is not None or self.dist2 is not None)
        )

    @property
    def needs_undistortion(self) -> bool:
        """Distorted mono/RGB-D pinhole → undistort via image remap (the
        reference instead undistorts keypoints, src/Frame.cc:747; one remap
        per frame keeps all downstream math in a clean pinhole space)."""
        return (
            not self.sensor.is_stereo
            and self.camera_type == "PinHole"
            and self.dist1 is not None
        )

    def precompute_rectification(self) -> None:
        """Settings::precomputeRectificationMaps analogue
        (src/Settings.cc:485-528): compute rectify maps, rewrite cam1 + bf
        from P1, fold R_r1_u1 into T_bc for inertial rigs."""
        from orb_slam3_vio_fixes_tpu.ops import rectify as rec

        if self.rect is not None or not self.needs_rectification:
            return
        K1 = np.asarray(self.cam1.K, np.float64)
        K2 = np.asarray((self.cam2 if self.cam2 is not None else self.cam1).K, np.float64)
        d1 = self.dist1 if self.dist1 is not None else np.zeros(5)
        d2 = self.dist2 if self.dist2 is not None else np.zeros(5)
        w = self.new_width or self.width
        h = self.new_height or self.height
        r = rec.stereo_rectify(K1, d1, K2, d2, (w, h), self.T_c1_c2)
        self.rect = r
        self.cam1 = Camera.pinhole(
            r.P1[0, 0], r.P1[1, 1], r.P1[0, 2], r.P1[1, 2])
        self.cam2 = None
        self.bf = r.baseline * r.fx
        if self.T_bc is not None:
            T_r1_u1 = np.eye(4)
            T_r1_u1[:3, :3] = r.R1
            self.T_bc = self.T_bc @ np.linalg.inv(T_r1_u1)

    def precompute_undistortion(self) -> None:
        """Build the mono/RGB-D undistortion remap (identity rotation, same
        K) and mark cam1 as distortion-free afterwards."""
        from orb_slam3_vio_fixes_tpu.ops import rectify as rec

        if self.undist_map is not None or not self.needs_undistortion:
            return
        K = np.asarray(self.cam1.K, np.float64)
        w = self.new_width or self.width
        h = self.new_height or self.height
        self.undist_map = rec.init_undistort_rectify_map(
            K, self.dist1, np.eye(3), K, (w, h))


def _req(d: dict, key: str):
    if key not in d or d[key] is None:
        raise SettingsError(
            f"Missing required settings key: {key} (reference aborts the same "
            "way: include/Settings.h:127-145)"
        )
    return d[key]


def _opt(d: dict, key: str, default=None):
    return d.get(key, default)


def _read_camera(d: dict, prefix: str, cam_type: str) -> Camera:
    fx = _req(d, f"{prefix}.fx")
    fy = _req(d, f"{prefix}.fy")
    cx = _req(d, f"{prefix}.cx")
    cy = _req(d, f"{prefix}.cy")
    if cam_type == "KannalaBrandt8":
        return Camera.kb8(
            fx, fy, cx, cy,
            _req(d, f"{prefix}.k1"), _req(d, f"{prefix}.k2"),
            _req(d, f"{prefix}.k3"), _req(d, f"{prefix}.k4"),
        )
    return Camera.pinhole(fx, fy, cx, cy)


def _read_dist(d: dict, prefix: str) -> Optional[np.ndarray]:
    """Radial-tangential coefficients [k1,k2,p1,p2,k3]; None if all absent
    (src/Settings.cc reads the same optional keys for PinHole rigs)."""
    vals = [float(_opt(d, f"{prefix}.{k}", 0.0) or 0.0)
            for k in ("k1", "k2", "p1", "p2", "k3")]
    return np.asarray(vals, np.float64) if any(v != 0.0 for v in vals) else None


def _read_mat(d: dict, key: str) -> Optional[np.ndarray]:
    v = _opt(d, key)
    if v is None:
        return None
    if isinstance(v, dict) and "data" in v:
        rows, cols = int(v.get("rows", 4)), int(v.get("cols", 4))
        return np.asarray(v["data"], np.float64).reshape(rows, cols)
    return np.asarray(v, np.float64)


def load_settings(path: str, sensor: Sensor) -> Settings:
    d = _load_yaml(path)
    version = str(_opt(d, "File.version", ""))
    if version != "1.0":
        raise SettingsError(
            f"Settings file version '{version}' unsupported (need 1.0; the "
            "reference's legacy per-component parser is intentionally not "
            "reproduced)"
        )
    cam_type = _req(d, "Camera.type")
    cam1 = _read_camera(d, "Camera1", cam_type)
    cam2 = None
    T_c1_c2 = None
    bf = 0.0
    if sensor.is_stereo or sensor.is_rgbd:
        if sensor.is_stereo and cam_type != "Rectified":
            cam2 = _read_camera(d, "Camera2", cam_type)
            T_c1_c2 = _read_mat(d, "Stereo.T_c1_c2")
        if "Camera.bf" in d:
            bf = float(d["Camera.bf"])
        elif "Stereo.b" in d:
            bf = float(d["Stereo.b"]) * float(_req(d, "Camera1.fx"))
        elif T_c1_c2 is not None:
            bf = float(np.linalg.norm(T_c1_c2[:3, 3])) * float(_req(d, "Camera1.fx"))
    s = Settings(
        sensor=sensor,
        camera_type=cam_type,
        cam1=cam1,
        cam2=cam2,
        width=int(_req(d, "Camera.width")),
        height=int(_req(d, "Camera.height")),
        new_width=_opt(d, "Camera.newWidth"),
        new_height=_opt(d, "Camera.newHeight"),
        fps=float(_opt(d, "Camera.fps", 30.0)),
        rgb=bool(_opt(d, "Camera.RGB", 1)),
        bf=bf,
        dist1=_read_dist(d, "Camera1") if cam_type == "PinHole" else None,
        dist2=(_read_dist(d, "Camera2")
               if cam_type == "PinHole" and cam2 is not None else None),
        th_depth=float(_opt(d, "Stereo.ThDepth", _opt(d, "RGBD.ThDepth", 35.0)) or 35.0),
        T_c1_c2=T_c1_c2,
    )
    if sensor.has_imu:
        s.noise_gyro = float(_req(d, "IMU.NoiseGyro"))
        s.noise_acc = float(_req(d, "IMU.NoiseAcc"))
        s.walk_gyro = float(_req(d, "IMU.GyroWalk"))
        s.walk_acc = float(_req(d, "IMU.AccWalk"))
        s.imu_freq = float(_req(d, "IMU.Frequency"))
        s.T_bc = _read_mat(d, "IMU.T_b_c1")
        s.insert_kfs_when_lost = bool(_opt(d, "IMU.InsertKFsWhenLost", 1))
    s.n_features = int(_opt(d, "ORBextractor.nFeatures", 1200))
    s.n_levels = int(_opt(d, "ORBextractor.nLevels", 8))
    s.scale_factor = float(_opt(d, "ORBextractor.scaleFactor", 1.2))
    s.fast_th = int(_opt(d, "ORBextractor.iniThFAST", 20))
    s.fast_th_min = int(_opt(d, "ORBextractor.minThFAST", 7))
    s.load_file = str(_opt(d, "System.LoadAtlasFromFile", "") or "")
    s.save_file = str(_opt(d, "System.SaveAtlasToFile", "") or "")
    return s
