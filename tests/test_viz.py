"""Viewer subsystem tests (offline drawers)."""

import os

import numpy as np

from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.viz import OfflineViewer, draw_frame, draw_map


def _toy_state():
    cfg = ms.MapConfig(max_keyframes=4, max_landmarks=64, max_features=16,
                       n_levels=2)
    st = ms.empty(cfg)
    import jax.numpy as jnp

    # 2 KFs sharing 16 landmarks through kf_obs
    st = st._replace(
        kf_valid=st.kf_valid.at[:2].set(True),
        kf_t=st.kf_t.at[1].set(jnp.array([0.5, 0.0, 0.0])),
        lm_valid=st.lm_valid.at[:16].set(True),
        lm_pos=st.lm_pos.at[:16].set(
            jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (16, 3)),
                        jnp.float32)),
        kf_obs=st.kf_obs.at[0, :16].set(jnp.arange(16, dtype=jnp.int32))
        .at[1, :16].set(jnp.arange(16, dtype=jnp.int32)),
    )
    return st


def test_draw_frame_markers():
    gray = np.full((60, 80), 100.0, np.float32)
    uv = np.array([[10.0, 10.0], [40.0, 30.0], [200.0, 10.0]])  # last off-image
    mask = np.array([True, False, True])
    img = draw_frame(gray, uv, mask, state="OK", n_kf=2, n_lm=16)
    assert img.shape == (80, 80, 3) and img.dtype == np.uint8
    assert draw_frame.last_status["n_tracked"] == 1  # off-image one skipped
    # green square around (10, 10)
    assert img[7, 10, 1] == 255 and img[7, 10, 0] == 0


def test_draw_map_and_viewer(tmp_path):
    st = _toy_state()
    summary = draw_map(st, str(tmp_path / "map.png"))
    assert os.path.exists(tmp_path / "map.png")
    assert summary["n_keyframes"] == 2 and summary["n_landmarks"] == 16
    assert summary["n_covis_edges"] == 1  # 16 shared >= 15 threshold

    viewer = OfflineViewer(str(tmp_path / "viz"), every_n=2)
    gray = np.zeros((40, 50), np.float32)
    uv = np.array([[5.0, 5.0]])
    for i in range(4):
        p = viewer.update(i, gray, uv, np.array([True]), "OK", 2, 16)
        assert (p is not None) == (i % 2 == 0)
    traj = [(0.0, np.eye(3), np.zeros(3)), (0.1, np.eye(3), np.array([0.1, 0, 0]))]
    out = viewer.finalize(map_state=st, trajectory=traj)
    assert out["n_records"] == 4
    assert os.path.exists(tmp_path / "viz" / "map.png")
    assert os.path.exists(tmp_path / "viz" / "trajectory.png")
