"""Trajectory export in TUM / EuRoC / KITTI formats.

Reference semantics: System::SaveTrajectoryTUM / SaveTrajectoryEuRoC /
SaveTrajectoryKITTI and the keyframe variants (src/System.cc:569-1263).
TUM:   "ts x y z qx qy qz qw" (ts seconds)
EuRoC: "ts_ns x y z qw qx qy qz" (EuRoC convention, nanosecond stamps)
KITTI: 3x4 row-major pose matrix per line (no timestamps)

All writers take (ts, R_cw, t_cw) tuples — camera-from-world like the
internal convention — and export camera-to-world poses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import lie


def _to_wc(R_cw: np.ndarray, t_cw: np.ndarray):
    R_wc = R_cw.T
    C = -R_wc @ t_cw
    return R_wc, C


def save_tum(path: str, traj):
    with open(path, "w") as f:
        for ts, R_cw, t_cw in traj:
            R_wc, C = _to_wc(np.asarray(R_cw), np.asarray(t_cw))
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R_wc)))
            f.write(
                f"{ts:.6f} {C[0]:.7f} {C[1]:.7f} {C[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_euroc(path: str, traj):
    with open(path, "w") as f:
        for ts, R_cw, t_cw in traj:
            R_wc, C = _to_wc(np.asarray(R_cw), np.asarray(t_cw))
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R_wc)))
            f.write(
                f"{int(ts * 1e9)} {C[0]:.7f} {C[1]:.7f} {C[2]:.7f} "
                f"{q[3]:.7f} {q[0]:.7f} {q[1]:.7f} {q[2]:.7f}\n"
            )


def save_kitti(path: str, traj):
    with open(path, "w") as f:
        for ts, R_cw, t_cw in traj:
            R_wc, C = _to_wc(np.asarray(R_cw), np.asarray(t_cw))
            M = np.concatenate([R_wc, C[:, None]], axis=1)
            f.write(" ".join(f"{v:.9e}" for v in M.reshape(-1)) + "\n")


def load_tum(path: str):
    """Returns (ts (N,), pos (N,3), quat_xyzw (N,4)). Skips comment lines.

    Also accepts EuRoC ground-truth CSVs (comma separated, ns timestamps,
    qw-first), auto-detected — the reference ships its GT in TUM format
    (evaluation/Ground_truth) but raw EuRoC uses the CSV form.
    """
    ts, pos, quat = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) < 8:
                continue
            vals = [float(p) for p in parts[:8]]
            t = vals[0]
            if t > 1e14:  # nanoseconds
                t *= 1e-9
            ts.append(t)
            pos.append(vals[1:4])
            quat.append(vals[4:8])
    ts = np.asarray(ts)
    pos = np.asarray(pos)
    quat = np.asarray(quat)
    return ts, pos, quat
