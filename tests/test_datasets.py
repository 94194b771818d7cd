"""Dataset loader tests on synthetic on-disk fixtures."""

import os

import numpy as np
import pytest

from orb_slam3_vio_fixes_tpu.io import datasets


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture
def euroc_dir(tmp_path):
    root = tmp_path / "MH01"
    for cam in ("cam0", "cam1"):
        (root / "mav0" / cam / "data").mkdir(parents=True)
    stamps = [1403636579763555584 + int(5e7) * i for i in range(4)]
    rng = np.random.default_rng(0)
    for s in stamps:
        for cam in ("cam0", "cam1"):
            img = rng.integers(0, 255, size=(48, 64), dtype=np.uint8)
            _write_png(str(root / "mav0" / cam / "data" / f"{s}.png"), img)
    imu_dir = root / "mav0" / "imu0"
    imu_dir.mkdir(parents=True)
    t0 = stamps[0] - int(1e7)
    lines = ["#ts,wx,wy,wz,ax,ay,az"]
    for i in range(40):
        t = t0 + int(5e6) * i  # 200 Hz
        lines.append(f"{t},0.01,0.02,0.03,0.1,0.2,9.8")
    (imu_dir / "data.csv").write_text("\n".join(lines))
    return str(root), stamps


def test_load_euroc(euroc_dir):
    root, stamps = euroc_dir
    seq = datasets.load_euroc(root)
    assert len(seq) == 4
    np.testing.assert_allclose(seq.ts, np.array(stamps) * 1e-9)
    ts, im_l, im_r, dep = seq.frame(0)
    assert im_l.shape == (48, 64) and im_l.dtype == np.float32
    assert im_r is not None and dep is None
    imu = seq.imu_between(seq.ts[0], seq.ts[1])
    assert imu is not None and len(imu.ts) == 10  # 200Hz over 50ms
    assert np.all(imu.ts > seq.ts[0]) and np.all(imu.ts <= seq.ts[1])
    assert imu.acc.shape == (10, 3) and imu.gyro.shape == (10, 3)


def test_load_euroc_timestamp_file(euroc_dir, tmp_path):
    root, stamps = euroc_dir
    tf = tmp_path / "ts.txt"
    tf.write_text("\n".join(str(s) for s in stamps[1:3]))
    seq = datasets.load_euroc(root, timestamps_file=str(tf), with_imu=False)
    assert len(seq) == 2 and seq.imu is None
    assert seq.ts[0] == pytest.approx(stamps[1] * 1e-9)


def test_load_kitti(tmp_path):
    root = tmp_path / "00"
    (root / "image_0").mkdir(parents=True)
    (root / "image_1").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(3):
        for d in ("image_0", "image_1"):
            _write_png(
                str(root / d / ("%06d.png" % i)),
                rng.integers(0, 255, size=(32, 96), dtype=np.uint8),
            )
    (root / "times.txt").write_text("0.0\n0.1\n0.2\n")
    seq = datasets.load_kitti(str(root))
    assert len(seq) == 3
    _, im_l, im_r, _ = seq.frame(2)
    assert im_l.shape == (32, 96) and im_r is not None


def test_load_tum_rgbd(tmp_path):
    root = tmp_path / "fr1"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir(parents=True)
    rng = np.random.default_rng(2)
    rgb_lines, dep_lines = ["# rgb"], ["# depth"]
    for i in range(3):
        t = 100.0 + 0.033 * i
        rgb = rng.integers(0, 255, size=(24, 32, 3), dtype=np.uint8)
        _write_png(str(root / "rgb" / f"{t:.6f}.png"), rgb)
        dep = (rng.uniform(0, 4, size=(24, 32)) * 5000).astype(np.uint16)
        _write_png(str(root / "depth" / f"{t + 0.005:.6f}.png"), dep)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        dep_lines.append(f"{t + 0.005:.6f} depth/{t + 0.005:.6f}.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(dep_lines))
    seq = datasets.load_tum_rgbd(str(root))
    assert len(seq) == 3
    ts, im, _, dep = seq.frame(1)
    assert im.shape == (24, 32)  # grayscale-converted
    assert dep is not None and dep.max() < 4.1  # meters after /5000
    mono = datasets.load_tum_mono(str(root))
    assert len(mono) == 3 and mono.depth is None
