"""Rectification / undistortion tests.

Validated against geometry invariants rather than OpenCV outputs: after
rectification, the two images of a 3D point must land on the same row, and
disparity must equal fx*b/z.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.ops import rectify as rec


K1 = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1.0]])
K2 = np.array([[457.587, 0, 379.999], [0, 456.134, 255.238], [0, 0, 1.0]])
D1 = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
D2 = np.array([-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05, 0.0])
# EuRoC Stereo.T_c1_c2
T12 = np.array([
    [0.999997256477797, -0.002317135723275, -0.000343393120620, 0.110074137800478],
    [0.002312067192432, 0.999898048507103, -0.014090668452683, -0.000156612054392],
    [0.000376008102320, 0.014089835846691, 0.999900662638081, 0.000889382785432],
    [0.0, 0.0, 0.0, 1.0]])
SIZE = (752, 480)


def _project(K, dist, R_cw, t_cw, Pw):
    pc = Pw @ R_cw.T + t_cw
    xy = pc[:, :2] / pc[:, 2:3]
    xyd = rec.radtan_distort(xy, dist)
    return np.stack([K[0, 0] * xyd[:, 0] + K[0, 2],
                     K[1, 1] * xyd[:, 1] + K[1, 2]], -1), pc[:, 2]


def test_undistort_points_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.4, 0.4, size=(200, 2))
    xyd = rec.radtan_distort(xy, D1)
    uvd = np.stack([K1[0, 0] * xyd[:, 0] + K1[0, 2],
                    K1[1, 1] * xyd[:, 1] + K1[1, 2]], -1)
    und = rec.undistort_points(uvd, K1, D1)
    np.testing.assert_allclose(und, xy, atol=1e-6)


@pytest.fixture(scope="module")
def rect():
    return rec.stereo_rectify(K1, D1, K2, D2, SIZE, T12)


def test_rectified_rows_align(rect):
    """Project random world points into both distorted cams, undistort with
    each eye's (R, P): rows must match to sub-0.1px and disparity = fx*b/z."""
    rng = np.random.default_rng(1)
    Pw = np.stack([
        rng.uniform(-2, 2, 300), rng.uniform(-1.5, 1.5, 300),
        rng.uniform(3.0, 12.0, 300)], -1)
    # cam1 at identity; cam2 pose from T12 (x2 = R21 x1 + t21)
    T21 = np.linalg.inv(T12)
    uv1, _ = _project(K1, D1, np.eye(3), np.zeros(3), Pw)
    uv2, _ = _project(K2, D2, T21[:3, :3], T21[:3, 3], Pw)

    r1 = rec.undistort_points(uv1, K1, D1, R=rect.R1, P=rect.P1)
    r2 = rec.undistort_points(uv2, K2, D2, R=rect.R2, P=rect.P2)
    inb = ((r1[:, 0] > 20) & (r1[:, 0] < SIZE[0] - 20)
           & (r1[:, 1] > 20) & (r1[:, 1] < SIZE[1] - 20))
    assert inb.sum() > 100
    rows_diff = np.abs(r1[inb, 1] - r2[inb, 1])
    assert np.percentile(rows_diff, 95) < 0.1

    # disparity check: z in the RECTIFIED cam1 frame
    z_rect = (Pw @ rect.R1.T)[:, 2]
    disp = r1[:, 0] - (r2[:, 0] - rect.P2[0, 3] / rect.P2[0, 0] * 0)
    disp = r1[:, 0] - r2[:, 0]
    expected = -rect.P2[0, 3] / z_rect  # fx*b/z (P2[0,3] = -fx*b)
    np.testing.assert_allclose(disp[inb], expected[inb], rtol=2e-3, atol=0.05)


def test_rectify_baseline_and_fx(rect):
    # EuRoC baseline ~0.1101 m
    assert rect.baseline == pytest.approx(0.1101, abs=2e-3)
    assert 300 < rect.fx < 470  # alpha=-1 shrink heuristic gives ~332 on EuRoC


def test_remap_consistency(rect):
    """remap(img)[v,u] == img sampled at map[v,u] for a smooth image."""
    w, h = SIZE
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (0.3 * xx + 0.7 * yy).astype(np.float32)
    out = np.asarray(rec.remap_bilinear(jnp.asarray(img),
                                        jnp.asarray(rect.map1)))
    m = rect.map1
    inside = ((m[..., 0] >= 1) & (m[..., 0] < w - 1)
              & (m[..., 1] >= 1) & (m[..., 1] < h - 1))
    expected = 0.3 * m[..., 0] + 0.7 * m[..., 1]
    err = np.abs(out - expected)[inside]
    assert err.max() < 1e-2


def test_remap_nearest_depth():
    img = np.zeros((8, 10), np.float32)
    img[2, 3] = 5.0
    m = np.zeros((4, 4, 2), np.float32)
    m[..., 0] = 3.2   # x -> col 3
    m[..., 1] = 1.8   # y -> row 2
    out = np.asarray(rec.remap_nearest(jnp.asarray(img), jnp.asarray(m)))
    assert np.all(out == 5.0)
    m[..., 0] = -5.0  # out of image -> 0
    out = np.asarray(rec.remap_nearest(jnp.asarray(img), jnp.asarray(m)))
    assert np.all(out == 0.0)


def test_settings_rectification_pipeline(tmp_path):
    """EuRoC YAML (distorted stereo) -> precompute -> cam1/bf rewritten."""
    import os

    from orb_slam3_vio_fixes_tpu.io.settings import load_settings
    from orb_slam3_vio_fixes_tpu.sensors import Sensor

    cfg = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "configs", "EuRoC.yaml")
    s = load_settings(cfg, Sensor.IMU_STEREO)
    assert s.needs_rectification
    assert s.dist1 is not None and s.dist1[0] == pytest.approx(-0.28340811)
    T_bc_before = s.T_bc.copy()
    s.precompute_rectification()
    assert s.rect is not None
    assert s.cam2 is None
    assert float(s.cam1.fx) == pytest.approx(s.rect.fx)
    assert s.bf == pytest.approx(s.rect.baseline * s.rect.fx)
    # T_bc folded with R_r1_u1 (src/Settings.cc:521-526)
    assert not np.allclose(s.T_bc[:3, :3], T_bc_before[:3, :3])
    # rotation part still orthonormal
    RtR = s.T_bc[:3, :3] @ s.T_bc[:3, :3].T
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-9)
