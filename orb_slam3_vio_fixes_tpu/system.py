"""System facade: sensor modes and the top-level SLAM entry point.

TPU-native analogue of the reference's System class (reference:
include/System.h:87-94 sensor enum, src/System.cc:41-242 constructor wiring,
TrackStereo/TrackRGBD/TrackMonocular :244-474, ActivateLocalizationMode
:478-488, Reset/ResetActiveMap :494-505, Shutdown :515-562, trajectory
writers :569-1263, SaveAtlas/LoadAtlas :1408-1511).

The reference wires four threads around shared mutable structures; here the
facade wires host actors around one functional MapState (tracker owns the
active map, LoopCloser owns the BoW database, Atlas owns stored maps) and
every compute stage is a jitted kernel.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import loop_closing as lc_mod
from orb_slam3_vio_fixes_tpu.frontend import relocalization as rl_mod
from orb_slam3_vio_fixes_tpu.frontend import tracking as trk
from orb_slam3_vio_fixes_tpu.frontend.inertial_tracking import (
    InertialConfig, StereoInertialTracker)
from orb_slam3_vio_fixes_tpu.frontend.mono_tracking import MonocularTracker
from orb_slam3_vio_fixes_tpu.imu import preintegration as pre
from orb_slam3_vio_fixes_tpu.io import trajectory as traj_io
from orb_slam3_vio_fixes_tpu.io.settings import Settings, load_settings
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import atlas as atlas_mod
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import snapshot
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc


from orb_slam3_vio_fixes_tpu.sensors import Sensor  # re-export (public API)


class SLAMSystem:
    """Top-level facade wiring tracker + loop closing + relocalization +
    Atlas for a given sensor configuration.

    Parameters
    ----------
    settings : Settings | str — parsed settings or a YAML path (v1.0 schema).
    sensor : Sensor
    vocab : vocabulary.Vocabulary | "default" | None — BoW vocabulary.
        "default" (the default) loads the checked-in 10^4-word artifact
        (assets/vocab_b10d4.npz — the framework's ORBvoc.txt analogue,
        reference include/ORBVocabulary.h:29-30). Pass None to disable place
        recognition (loop closing / relocalization / map merging) entirely.
    map_cfg : map_state.MapConfig | None — capacity override.
    """

    def __init__(self, settings, sensor: Sensor, vocab="default",
                 map_cfg: Optional[ms.MapConfig] = None,
                 tracker_cfg: Optional[trk.TrackerConfig] = None,
                 mesh=None):
        if isinstance(settings, str):
            settings = load_settings(settings, sensor)
        self.settings: Settings = settings
        self.sensor = sensor
        if isinstance(vocab, str):
            if vocab != "default":
                raise ValueError(f"unknown vocabulary spec {vocab!r}")
            vocab = voc.default_vocabulary()
        self.vocab = vocab

        # distorted rigs: precompute remaps and rewrite cam1/bf BEFORE the
        # trackers capture the calibration (reference: Settings ctor calls
        # precomputeRectificationMaps, src/Settings.cc:107-112)
        settings.precompute_rectification()
        settings.precompute_undistortion()
        self._rect_maps = None
        self._undist_map = None
        if settings.rect is not None:
            self._rect_maps = jnp.asarray(
                np.stack([settings.rect.map1, settings.rect.map2]))
        elif settings.undist_map is not None:
            self._undist_map = jnp.asarray(settings.undist_map)

        s = settings
        orb_cfg = orb.ORBConfig(
            n_features=s.n_features, n_levels=s.n_levels, scale=s.scale_factor,
        )
        if map_cfg is None:
            map_cfg = ms.MapConfig(n_levels=s.n_levels, scale=s.scale_factor,
                                   max_features=s.n_features)
        cfg = tracker_cfg or trk.TrackerConfig(
            orb=orb_cfg, map=map_cfg,
            width=s.new_width or s.width, height=s.new_height or s.height,
            th_depth_factor=s.th_depth,
            max_frames_between_kf=int(s.fps),
        )
        self.cfg = cfg
        inv_s2 = trk.octave_inv_sigma2(cfg.orb)

        # two-camera fisheye rig (KannalaBrandt8 stereo): keep both camera
        # models + T_c1_c2; bf := baseline * fx for depth thresholds
        # (reference: Settings::readCamera2 keeps Tlr and computes mBf,
        # src/Settings.cc:290-360)
        rig = None
        if (sensor.is_stereo and s.camera_type == "KannalaBrandt8"
                and s.cam2 is not None and s.T_c1_c2 is not None):
            T = np.asarray(s.T_c1_c2, np.float32)
            rig = (s.cam2, jnp.asarray(T[:3, :3]), jnp.asarray(T[:3, 3]))
            if not s.bf:
                s.bf = float(np.linalg.norm(T[:3, 3])) * float(s.cam1.fx)

        closer = reloc = atl = None
        if vocab is not None:
            # scale is fixed for every sensor but pure monocular (the
            # reference's mbFixScale: IMU and stereo/RGBD maps are metric,
            # src/System.cc:213); inertial maps use the 4-DoF essential
            # graph + scale gate + yaw clamp (src/LoopClosing.cc:141-164,
            # :1176-1184)
            closer = lc_mod.LoopCloser(
                vocab, s.cam1, map_cfg.max_keyframes, inv_s2,
                lc_mod.LoopConfig(
                    fix_scale=sensor != Sensor.MONOCULAR,
                    inertial=sensor.has_imu,
                    # inertial maps run FullInertialBA as the GBA from the
                    # tracker hook instead (src/LoopClosing.cc:2284-2286)
                    run_gba=not sensor.has_imu),
                bf=(s.bf or 0.0) if (sensor.is_stereo or sensor.is_rgbd)
                else 0.0,
                n_levels=cfg.orb.n_levels, scale=cfg.orb.scale, mesh=mesh)
            reloc = rl_mod.Relocalizer(vocab, lambda: closer.db, mesh=mesh)
            atl = atlas_mod.Atlas(
                map_cfg, vocab, s.cam1, inv_s2,
                atlas_mod.AtlasConfig(fix_scale=not sensor.is_monocular))
        self.loop_closer = closer
        self.relocalizer = reloc
        self.atlas = atl

        if sensor == Sensor.IMU_STEREO or sensor == Sensor.IMU_RGBD:
            T_bc = s.T_bc if s.T_bc is not None else np.eye(4, dtype=np.float32)
            calib = pre.ImuCalib.make(
                s.noise_gyro, s.noise_acc, s.walk_gyro, s.walk_acc,
                s.imu_freq, R_bc=jnp.asarray(T_bc[:3, :3]),
                t_bc=jnp.asarray(T_bc[:3, 3]))
            self.tracker = StereoInertialTracker(
                s.cam1, s.bf, calib, cfg, InertialConfig(),
                loop_closer=closer, rig=rig, relocalizer=reloc, atlas=atl)
        elif sensor == Sensor.IMU_MONOCULAR:
            from orb_slam3_vio_fixes_tpu.frontend.inertial_tracking import (
                MonoInertialTracker)

            T_bc = s.T_bc if s.T_bc is not None else np.eye(4, dtype=np.float32)
            calib = pre.ImuCalib.make(
                s.noise_gyro, s.noise_acc, s.walk_gyro, s.walk_acc,
                s.imu_freq, R_bc=jnp.asarray(T_bc[:3, :3]),
                t_bc=jnp.asarray(T_bc[:3, 3]))
            self.tracker = MonoInertialTracker(
                s.cam1, calib, cfg, loop_closer=closer,
                relocalizer=reloc, atlas=atl)
        elif sensor.is_monocular:
            self.tracker = MonocularTracker(
                s.cam1, cfg, loop_closer=closer, relocalizer=reloc, atlas=atl)
        else:
            self.tracker = trk.StereoTracker(
                s.cam1, s.bf, cfg, loop_closer=closer, relocalizer=reloc,
                atlas=atl, rig=rig)

        if sensor.is_rgbd:
            # RGBD searches a wider local window (reference th=3 schedule,
            # src/Tracking.cc:3390-3393)
            self.tracker.th_local_base = 1.5

        if s.load_file:
            self.load_atlas(s.load_file)

    # -- per-frame entries (reference: src/System.cc:244-474) --

    def _rectify_pair(self, img_l, img_r):
        """Per-frame stereo rectification remap, both eyes in one batched
        gather launch (reference: cv::remap x2 in System::TrackStereo
        src/System.cc:253-261)."""
        from orb_slam3_vio_fixes_tpu.ops import rectify as rec

        if self._rect_maps is None:
            return img_l, img_r
        il = rec.remap_bilinear(jnp.asarray(img_l, jnp.float32),
                                self._rect_maps[0])
        ir = rec.remap_bilinear(jnp.asarray(img_r, jnp.float32),
                                self._rect_maps[1])
        return il, ir

    def _undistort(self, img):
        from orb_slam3_vio_fixes_tpu.ops import rectify as rec

        if self._undist_map is None:
            return img
        return rec.remap_bilinear(jnp.asarray(img, jnp.float32),
                                  self._undist_map)

    def track_stereo(self, img_l, img_r, ts: float, imu=None):
        img_l, img_r = self._rectify_pair(img_l, img_r)
        if self.sensor == Sensor.IMU_STEREO:
            return self.tracker.process_stereo_inertial(
                img_l, img_r, ts, imu if imu is not None else
                np.zeros((0, 7), np.float32))
        if self.sensor != Sensor.STEREO:
            raise ValueError(f"track_stereo called in {self.sensor} mode")
        return self.tracker.process_stereo(img_l, img_r, ts)

    def track_rgbd(self, img, depth, ts: float, imu=None):
        if not self.sensor.is_rgbd:
            raise ValueError(f"track_rgbd called in {self.sensor} mode")
        if self.sensor == Sensor.IMU_RGBD:
            return self.tracker.process_rgbd_inertial(
                img, depth, ts,
                imu if imu is not None else np.zeros((0, 7), np.float32))
        if self._undist_map is not None:
            from orb_slam3_vio_fixes_tpu.ops import rectify as rec

            img = self._undistort(img)
            depth = rec.remap_nearest(jnp.asarray(depth, jnp.float32),
                                      self._undist_map)
        return self.tracker.process_rgbd(img, depth, ts)

    def track_monocular(self, img, ts: float, imu=None):
        if not self.sensor.is_monocular:
            raise ValueError(f"track_monocular called in {self.sensor} mode")
        img = self._undistort(img)
        if self.sensor == Sensor.IMU_MONOCULAR:
            return self.tracker.process_mono_inertial(
                img, ts,
                imu if imu is not None else np.zeros((0, 7), np.float32))
        return self.tracker.process_mono(img, ts)

    # -- mode switches / lifecycle (reference: src/System.cc:478-562) --

    def activate_localization_mode(self):
        """Track against the existing map without growing it (reference:
        ActivateLocalizationMode pauses LocalMapping)."""
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def reset(self):
        """Full reset: drop stored maps too (reference: System::Reset)."""
        if self.atlas is not None:
            self.atlas.stored = []
        self.reset_active_map()

    def reset_active_map(self):
        tr = self.tracker
        tr._kf_jobs.clear()      # pending stages reference dying slots
        tr._freeze_trajectory()  # keyframe slots are going away
        # read the map tier from the TRACKER's config — capacity growth
        # updates tracker.cfg (and the BoW db) but not the facade's cfg; a
        # reset at the original tier would mismatch the grown database
        tr.state = ms.empty(tr.cfg.map)
        tr.n_kf = 0
        tr.n_lm = 0
        tr.kf_order = []
        tr._free_kf_slots = []
        tr.track_state = trk.TrackState.NOT_INITIALIZED
        tr.vel = None
        tr.prev_obs = None
        tr.prev_octave = None
        tr.prev_angle = None
        tr.frames_since_kf = 0
        tr.lost_frames = 0
        if hasattr(tr, "ref_frame"):
            tr.ref_frame = None
        if self.loop_closer is not None:
            self.loop_closer.reset()

    def shutdown(self):
        """No threads to join in the functional design; kept for parity."""

    # -- state queries (reference: include/System.h:176-190) --

    def get_tracking_state(self) -> str:
        return self.tracker.track_state

    def is_lost(self) -> bool:
        return self.tracker.track_state in (
            trk.TrackState.RECENTLY_LOST, trk.TrackState.LOST)

    def get_velocity(self):
        if hasattr(self.tracker, "body") and self.tracker.body is not None:
            return np.asarray(self.tracker.body.v)
        return None

    def n_keyframes(self) -> int:
        return self.tracker.n_kf

    def n_landmarks(self) -> int:
        return self.tracker.n_lm

    # -- trajectory export (reference: src/System.cc:569-1263) --

    def save_trajectory_tum(self, path: str):
        traj_io.save_tum(path, self.tracker.trajectory)

    def save_trajectory_euroc(self, path: str):
        traj_io.save_euroc(path, self.tracker.trajectory)

    def save_trajectory_kitti(self, path: str):
        traj_io.save_kitti(path, self.tracker.trajectory)

    def save_keyframe_trajectory_tum(self, path: str):
        traj_io.save_tum(path, self.tracker.keyframe_trajectory())

    def save_keyframe_trajectory_euroc(self, path: str):
        traj_io.save_euroc(path, self.tracker.keyframe_trajectory())

    # -- atlas snapshots (reference: src/System.cc:1408-1511) --

    def save_atlas(self, path: str):
        """Serialize the WHOLE Atlas: active map, stored maps, BoW databases,
        counters, vocabulary checksum (reference: System::SaveAtlas
        src/System.cc:1408-1446)."""
        tr = self.tracker
        hists = (np.asarray(self.loop_closer.db.hist)
                 if self.loop_closer is not None else None)
        stored = self.atlas.stored if self.atlas is not None else ()
        snapshot.save_atlas(
            path, tr.state, tr.cfg.map, tr.n_kf, tr.n_lm, tr.kf_order,
            stored=stored, hists=hists, vocab=self.vocab)

    def load_atlas(self, path: str):
        """Restore a full Atlas; tracking resumes LOST and must relocalize
        into the loaded map (reference: LoadAtlas + PostLoad re-adds every
        keyframe to the BoW database, src/System.cc:1450-1511)."""
        state, cfg, meta, hists, stored, _voc = snapshot.load_atlas(
            path, vocab=self.vocab)
        tr = self.tracker
        tr._freeze_trajectory()  # old entries must not resolve via new slots
        tr.state = state
        # sync every holder of the map tier to the LOADED capacity (the
        # snapshot may come from a grown map): tracker cfg, facade cfg,
        # loop-closer database rows, atlas template
        if cfg != tr.cfg.map:
            tr.cfg = tr.cfg._replace(map=cfg)
            self.cfg = self.cfg._replace(map=cfg)
            if self.loop_closer is not None:
                self.loop_closer.grow(cfg.max_keyframes)
            if self.atlas is not None:
                self.atlas.map_cfg = cfg
        tr.n_kf = meta["n_kf"]
        tr.n_lm = meta["n_lm"]
        tr.kf_order = list(meta["kf_order"])
        tr.track_state = trk.TrackState.LOST  # must relocalize into the map
        tr.lost_frames = 0
        tr.vel = None
        if self.atlas is not None:
            self.atlas.stored = [atlas_mod.StoredMap(*sm) for sm in stored]
        if self.loop_closer is not None:
            if hists is not None:
                self.loop_closer.db = voc.KeyFrameDatabase(jnp.asarray(hists))
            else:
                # no stored histograms: rebuild like the reference's PostLoad
                # (sized to the LOADED tier, which reset() alone would not do)
                self.loop_closer.db = voc.KeyFrameDatabase.empty(
                    cfg.max_keyframes, self.loop_closer.vocab.n_words)
                self.loop_closer._pending_group = None
                self.loop_closer._pending_count = 0
                for k in tr.kf_order:
                    self.loop_closer.add_keyframe(state, k)
