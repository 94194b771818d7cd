"""Diagnose the loop e2e scenario: per-keyframe detection internals."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

from orb_slam3_vio_fixes_tpu.frontend import loop_closing as lc
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

N_FRAMES = 88
rng = np.random.default_rng(5)
seq = synthetic.make_loop_stereo_sequence(
    rng, n_frames=N_FRAMES, h=240, w=352, fx=260.0, baseline=0.2,
    radius=3.0, wall_radius=9.0, n_points=1400, n_loop=72)
noise = rng.normal(0, 2.0, seq.imgs_l.shape).astype(np.float32)
noise_r = rng.normal(0, 2.0, seq.imgs_r.shape).astype(np.float32)
seq = seq._replace(imgs_l=seq.imgs_l + noise, imgs_r=seq.imgs_r + noise_r)

cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=384, n_levels=4),
    map=ms.MapConfig(max_keyframes=64, max_landmarks=8192, max_features=384),
    width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
    new_lm_budget=256, max_frames_between_kf=4)

from orb_slam3_vio_fixes_tpu.frontend.frame import build_stereo_frame
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
pool = []
for i in range(0, N_FRAMES, N_FRAMES // 6):
    f = build_stereo_frame(jnp.asarray(seq.imgs_l[i]), jnp.asarray(seq.imgs_r[i]),
                           jnp.float32(0.0), cam,
                           jnp.float32(seq.K[0, 0] * seq.baseline), cfg.orb)
    pool.append(np.asarray(f.desc)[np.asarray(f.valid)])
vocab = voc.train(np.concatenate(pool), branching=10, depth=3, seed=0)
inv_s2 = tracking.octave_inv_sigma2(cfg.orb)


class DebugCloser(lc.LoopCloser):
    def on_keyframe(self, state, kf_id, n_kf, fixed_extra=None):
        cfg = self.cfg
        hist = self.add_keyframe(state, kf_id)
        cands = self.detect(state, kf_id, hist)
        cov_row = np.asarray(ms.covisibility(state)[kf_id])
        old_cov = [int(i) for i in np.nonzero(cov_row > 0)[0] if i < kf_id - 5]
        msg = f"kf={kf_id} cands={cands} old_covis={old_cov[:6]}"
        for cand in cands:
            self.key, sub = jax.random.split(self.key)
            n_m, n_ransac, n_proj, sim = lc.verify_candidate(
                sub, state, jnp.int32(kf_id), jnp.int32(cand), self.cam,
                self.inv_sigma2_oct, cfg.n_hyp, cfg.fix_scale,
                n_levels=self.n_levels, scale=self.scale,
                guided_radius=cfg.guided_radius,
                verify_radius=cfg.verify_radius,
                proj_max_dist=cfg.proj_max_dist)
            msg += (f" | cand {cand}: n_m={int(n_m)} ransac={int(n_ransac)} "
                    f"proj={int(n_proj)} refined={int(sim.n_inliers)}")
        print(msg, flush=True)
        return super().on_keyframe(state, kf_id, n_kf, fixed_extra)


closer = DebugCloser(
    vocab, cam, cfg.map.max_keyframes, inv_s2,
    lc.LoopConfig(min_gap_kfs=8, n_consistency=2, fix_scale=True),
    bf=seq.K[0, 0] * seq.baseline, n_levels=cfg.orb.n_levels,
    scale=cfg.orb.scale)
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg,
                            loop_closer=closer)
tr.match_radius = (15.0, 30.0)
for i in range(N_FRAMES):
    tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
print("n_corrections:", closer.n_corrections, "kf_order:", tr.kf_order)
from orb_slam3_vio_fixes_tpu.evaluation import ate
est_ts = np.array([x[0] for x in tr.trajectory])
est_pos = np.array([-x[1].T @ x[2] for x in tr.trajectory])
print("ATE:", ate.ate_rmse(seq.ts, seq.t_wc, est_ts, est_pos))
