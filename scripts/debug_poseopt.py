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
seq = synthetic.make_stereo_sequence(rng, n_frames=3, h=240, w=352, fx=260.0)
cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=400, n_levels=4),
    map=ms.MapConfig(max_keyframes=32, max_landmarks=4096, max_features=400),
    width=352, height=240, max_local_lm=1024, ba_window=5, ba_fixed=2,
    new_lm_budget=256,
)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
tr.process_stereo(seq.imgs_l[0], seq.imgs_r[0], seq.ts[0])
print("init lm:", tr.n_lm)

# landmark position error vs ground-truth world points? compare depth quality:
state = tr.state
lmv = np.asarray(state.lm_valid)
print("valid lm:", lmv.sum())

# frame 1
fr = frame_mod.build_stereo_frame(
    jnp.asarray(seq.imgs_l[1], jnp.float32), jnp.asarray(seq.imgs_r[1], jnp.float32),
    jnp.float32(seq.ts[1]), cam, tr.bf, cfg.orb,
)
cur_obs, n_m = tracking.match_previous(
    state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t, fr, cam, tr.bf,
    jnp.float32(7.0), cfg,
)
print("matches:", int(n_m))

# manual pose opt with diagnostics
L = state.lm_pos.shape[0]
ids = jnp.clip(cur_obs, 0, L - 1)
act = (cur_obs >= 0) & state.lm_valid[ids] & fr.valid
pts = state.lm_pos[ids]
uvr = jnp.concatenate([fr.uv, fr.ur[:, None]], axis=-1)
inv_s2 = tracking.octave_inv_sigma2(cfg.orb)[jnp.clip(fr.octave, 0, 3)]

factors = ba_core.ReprojFactors(
    pose_idx=jnp.zeros(400, jnp.int32), lm_idx=jnp.arange(400, dtype=jnp.int32),
    uvr=uvr, inv_sigma2=inv_s2, valid=act,
)
problem = ba_core.BAProblem(
    R=tr.R[None], t=tr.t[None], pose_fixed=jnp.zeros(1, bool),
    lm=pts, lm_valid=jnp.ones(400, bool), lm_fixed=jnp.ones(400, bool),
    factors=factors, cam=cam, bf=tr.bf,
)
err, chi2, depth, is_st = ba_core.reproj_residuals(problem)
print("pre chi2 sum:", float(jnp.where(act, chi2, 0).sum()),
      "median:", float(jnp.median(jnp.where(act, chi2, jnp.nan))))
dxp, dlm = ba_core._assemble_and_solve(problem, jnp.ones(400, bool),
                                        jnp.float32(1e-3), ba_core.LMConfig())
print("dx_pose:", np.asarray(dxp))
cand = ba_core._apply_step(problem, dxp, dlm)
err2, chi22, _, _ = ba_core.reproj_residuals(cand)
print("post chi2 sum:", float(jnp.where(act, chi22, 0).sum()))
c0 = ba_core._total_chi2(problem, jnp.ones(400, bool), ba_core.LMConfig())
c1 = ba_core._total_chi2(cand, jnp.ones(400, bool), ba_core.LMConfig())
print("robust chi2:", float(c0), "->", float(c1))

res = ba_core.pose_optimize(tr.R, tr.t, pts, uvr, inv_s2, act, cam, tr.bf)
print("pose_optimize t:", np.asarray(res.t), "n_inl:", int(res.n_inliers))
# ground truth t_cw for frame 1:
R_cw = seq.R_wc[1].T
print("gt t_cw:", -R_cw @ seq.t_wc[1])
