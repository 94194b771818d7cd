"""Trace LM iterations of motion-only pose opt on frame 1 of the synthetic seq."""

import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend import tracking, frame as frame_mod
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

rng = np.random.default_rng(7)
seq = synthetic.make_stereo_sequence(rng, n_frames=2, h=240, w=352, fx=260.0)
cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=400, n_levels=4),
    map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
    width=352, height=240, max_local_lm=1024, new_lm_budget=256,
    th_depth_factor=150.0,
)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
tr.process_stereo(seq.imgs_l[0], seq.imgs_r[0], seq.ts[0])
print("init lm:", tr.n_lm)

frame = frame_mod.build_stereo_frame(
    jnp.asarray(seq.imgs_l[1], jnp.float32), jnp.asarray(seq.imgs_r[1], jnp.float32),
    jnp.float32(seq.ts[1]), cam, tr.bf, cfg.orb,
)
cur_obs, n_m = tracking.match_previous(
    tr.state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t, frame, cam, tr.bf,
    jnp.float32(7.0), cfg)
print("matches:", int(n_m))

L = tr.state.lm_pos.shape[0]
ids = jnp.clip(cur_obs, 0, L - 1)
act = (cur_obs >= 0) & tr.state.lm_valid[ids] & frame.valid
pts = tr.state.lm_pos[ids]
uvr = jnp.concatenate([frame.uv, frame.ur[:, None]], axis=-1)
inv_s2 = tracking.octave_inv_sigma2(cfg.orb)[jnp.clip(frame.octave, 0, 3)]
n = pts.shape[0]
factors = ba_core.ReprojFactors(
    jnp.zeros(n, jnp.int32), jnp.arange(n, dtype=jnp.int32), uvr, inv_s2, act)
problem = ba_core.BAProblem(
    R=tr.R[None], t=tr.t[None], pose_fixed=jnp.zeros(1, bool),
    lm=pts, lm_valid=jnp.ones(n, bool), lm_fixed=jnp.ones(n, bool),
    factors=factors, cam=cam, bf=tr.bf)

R_cw_gt = seq.R_wc[1].T
t_cw_gt = -R_cw_gt @ seq.t_wc[1]
print("gt t_cw:", t_cw_gt)

inlier = jnp.ones(n, bool)
lmc = ba_core.LMConfig()
lam = 1e-3
for it in range(12):
    chi = float(ba_core._total_chi2(problem, inlier, lmc))
    dxp, dlm = ba_core._assemble_and_solve(problem, inlier, jnp.float32(lam), lmc)
    cand = ba_core._apply_step(problem, dxp, dlm)
    chi_new = float(ba_core._total_chi2(cand, inlier, lmc))
    accept = chi_new < chi
    print(f"it{it:02d} lam={lam:.1e} chi {chi:10.3f} -> {chi_new:10.3f} "
          f"acc={accept} |drho|={float(jnp.linalg.norm(dxp[0,:3])):.5f} "
          f"|dphi|={float(jnp.linalg.norm(dxp[0,3:])):.5f} t={np.asarray(cand.t[0])}")
    if accept:
        problem = problem._replace(R=cand.R, t=cand.t, lm=cand.lm)
        lam *= 0.5
    else:
        lam *= 4.0
print("final t:", np.asarray(problem.t[0]), " gt:", t_cw_gt)
