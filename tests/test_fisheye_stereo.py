"""Fisheye (Kannala-Brandt8) two-camera stereo frame construction.

Capability under test: the reference's fisheye-stereo Frame path
(src/Frame.cc:1034-1166 + KannalaBrandt8::TriangulateMatches,
src/CameraModels/KannalaBrandt8.cpp:306-370) — brute-force descriptor
matching between the two eyes followed by ray triangulation must recover
metric depth through the KB8 model.
"""

import os

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend.frame import build_fisheye_stereo_frame
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project


# TUM-VI-like fisheye intrinsics (downscaled image)
FX, FY, CX, CY = 190.0, 190.0, 176.0, 120.0
DIST = (0.0034, 0.0007, -0.003, 0.0007)
H, W = 240, 352
BASELINE = 0.101


def _cams():
    cam1 = Camera.kb8(FX, FY, CX, CY, *DIST)
    cam2 = Camera.kb8(FX, FY, CX, CY, *DIST)
    return cam1, cam2


def _render_pair(rng):
    cam1, cam2 = _cams()
    world = synthetic.make_world(
        rng, n_points=500, extent=4.0, depth_range=(2.0, 7.0))
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)

    def proj(cam):
        return lambda Xc: np.asarray(project(cam, jnp.asarray(Xc, jnp.float32)))

    # world frame == left-camera frame; right camera displaced +x by BASELINE
    R = np.eye(3, dtype=np.float32)
    img_l, z_l = synthetic.render(
        world, K, R, np.zeros(3, np.float32), H, W,
        return_depth=True, project_fn=proj(cam1))
    img_r = synthetic.render(
        world, K, R, np.array([-BASELINE, 0, 0], np.float32), H, W,
        project_fn=proj(cam2))
    return cam1, cam2, img_l, img_r, z_l


def test_fisheye_exact_geometry():
    """Project known 3D points through both KB8 cameras, triangulate via the
    frame builder's internals (unproject + midpoint) — depth must come back
    to <0.5% (reference: KannalaBrandt8::TriangulateMatches correctness,
    src/CameraModels/KannalaBrandt8.cpp:306-370)."""
    from orb_slam3_vio_fixes_tpu.ops import triangulate as tri
    from orb_slam3_vio_fixes_tpu.utils.cameras import unproject

    cam1, cam2 = _cams()
    rng = np.random.default_rng(0)
    X = np.stack([
        rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200),
        rng.uniform(2, 7, 200)], 1).astype(np.float32)
    uv1 = project(cam1, jnp.asarray(X))
    uv2 = project(cam2, jnp.asarray(X - np.array([BASELINE, 0, 0], np.float32)))
    ray1 = unproject(cam1, uv1)
    ray2 = unproject(cam2, uv2)
    n = X.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    zero = jnp.zeros((n, 3), jnp.float32)
    t21 = jnp.broadcast_to(jnp.asarray([-BASELINE, 0, 0], jnp.float32), (n, 3))
    Xt = tri.triangulate_midpoint(eye, zero, eye, t21, ray1, ray2)
    rel = np.abs(np.asarray(Xt[:, 2]) - X[:, 2]) / X[:, 2]
    assert np.median(rel) < 0.005, f"median {np.median(rel):.5f}"
    assert rel.max() < 0.05, f"max {rel.max():.5f}"


def test_fisheye_stereo_depth_recovery():
    """Integration: rendered fisheye pair -> ORB -> BF match -> triangulate.

    Bounds are loose on purpose: the sprite renderer paints constant
    pixel disparity across each sprite, which under the equidistant model
    implies depth that VARIES over the sprite — keypoints at sprite corners
    legitimately triangulate several percent off the z-buffer. The exact
    geometry path is pinned tight by test_fisheye_exact_geometry."""
    rng = np.random.default_rng(3)
    cam1, cam2, img_l, img_r, z_l = _render_pair(rng)
    cfg = orb.ORBConfig(n_features=400, n_levels=4)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = BASELINE  # T_c1_c2: cam2 coords -> cam1 coords
    frame = build_fisheye_stereo_frame(
        jnp.asarray(img_l), jnp.asarray(img_r), jnp.float32(0.0),
        cam1, cam2, jnp.asarray(T[:3, : 3]), jnp.asarray(T[:3, 3]), cfg)

    depth = np.asarray(frame.depth)
    uv = np.asarray(frame.uv)
    valid = np.asarray(frame.valid)
    has_d = valid & (depth > 0)
    assert has_d.sum() >= 60, f"too few triangulated: {has_d.sum()}"

    # compare against the z-buffer at each keypoint
    xi = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
    yi = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
    z_gt = z_l[yi, xi]
    ok = has_d & (z_gt > 0)
    rel = np.abs(depth[ok] - z_gt[ok]) / z_gt[ok]
    assert np.median(rel) < 0.15, f"median depth err {np.median(rel):.4f}"
    assert (rel < 0.3).mean() > 0.8, f"only {(rel < 0.3).mean():.2f} within 30%"


def test_system_wires_kb8_rig():
    """SLAMSystem built from the TUM-VI calibration must hand the two-camera
    rig (cam2 + T_c1_c2) to the tracker and derive bf = |t| * fx
    (reference: Settings::readCamera2, src/Settings.cc:290-360)."""
    from orb_slam3_vio_fixes_tpu.io.settings import load_settings
    from orb_slam3_vio_fixes_tpu.sensors import Sensor
    from orb_slam3_vio_fixes_tpu.system import SLAMSystem

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "TUM-VI.yaml")
    st = load_settings(cfg_path, Sensor.IMU_STEREO)
    sys_ = SLAMSystem(st, Sensor.IMU_STEREO)
    assert sys_.tracker.rig is not None
    cam2, R_12, t_12 = sys_.tracker.rig
    assert abs(float(np.linalg.norm(np.asarray(t_12))) - 0.1011) < 1e-3
    # bf = baseline * fx ~ 0.1011 * 190.98 ~ 19.3
    assert 15.0 < float(sys_.tracker.bf) < 25.0
    assert int(cam2.kind) == 1  # KB8


def test_fisheye_rejects_without_parallax():
    """Identical images (zero baseline rig) must yield no depths."""
    rng = np.random.default_rng(4)
    cam1, cam2, img_l, _, _ = _render_pair(rng)
    cfg = orb.ORBConfig(n_features=400, n_levels=4)
    frame = build_fisheye_stereo_frame(
        jnp.asarray(img_l), jnp.asarray(img_l), jnp.float32(0.0),
        cam1, cam2, jnp.eye(3), jnp.zeros(3), cfg)
    depth = np.asarray(frame.depth)
    assert (depth > 0).sum() == 0
