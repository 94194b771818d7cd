"""Why doesn't retrieval surface the TRUE loop candidates (kf 0-2) at the
revisit (kf 55-59)? Dump BoW score rankings + guided-verify stats for the
true pairs."""
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
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

N_FRAMES = 72
rng = np.random.default_rng(5)
seq = synthetic.make_loop_stereo_sequence(
    rng, n_frames=N_FRAMES, h=240, w=352, fx=260.0, baseline=0.2,
    radius=3.0, wall_radius=9.0, n_points=1400)
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

closer = lc.LoopCloser(
    vocab, cam, cfg.map.max_keyframes, inv_s2,
    lc.LoopConfig(min_gap_kfs=8, n_consistency=2, fix_scale=True),
    bf=seq.K[0, 0] * seq.baseline, n_levels=cfg.orb.n_levels,
    scale=cfg.orb.scale)
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg,
                            loop_closer=closer)
tr.match_radius = (15.0, 30.0)
for i in range(N_FRAMES):
    tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
print("kfs:", len(tr.kf_order), "n_corr:", closer.n_corrections)

state = tr.state

# map kf -> frame index via timestamps
kf_ts = np.asarray(state.kf_ts)
dt = seq.ts[1] - seq.ts[0]

# 1) BoW score ranking at the final keyframes
hists = np.asarray(closer.db.hist)
cov = np.asarray(ms.covisibility(state))
for q in tr.kf_order[-5:]:
    h = hists[q]
    scores = 1.0 - 0.5 * np.abs(hists - h[None]).sum(-1)
    exclude = (cov[q] > 0) | (np.arange(len(scores)) > q - 8)
    s2 = np.where(exclude, -1, scores)
    order = np.argsort(-s2)
    rk = {int(k): int(np.where(order == k)[0][0]) for k in [0, 1, 2, 3]}
    print(f"q=kf{q} (frame {kf_ts[q]/dt:.0f}): top8={order[:8].tolist()} "
          f"scores={np.round(s2[order[:8]], 3).tolist()} rank(kf0..3)={rk} "
          f"score(kf0..3)={np.round(scores[:4], 3).tolist()}")

# 2) guided verification stats on the TRUE pairs
for k, c in [(tr.kf_order[-1], 0), (tr.kf_order[-1], 1), (tr.kf_order[-2], 0),
             (tr.kf_order[-3], 0)]:
    obs_c = np.asarray(state.kf_obs[c])
    lc_idx = np.clip(obs_c, 0, state.lm_pos.shape[0] - 1)
    has_c = (obs_c >= 0) & np.asarray(state.lm_valid)[lc_idx] \
        & np.asarray(state.kf_feat_valid[c])
    R_k = np.asarray(state.kf_R[k]); t_k = np.asarray(state.kf_t[k])
    Xw = np.asarray(state.lm_pos)[lc_idx]
    Y = Xw @ R_k.T + t_k
    uv_pred = np.asarray(project(cam, jnp.asarray(Y)))
    ok = has_c & (Y[:, 2] > 0.1)
    in_img = ok & (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < 352) & \
        (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < 240)
    feat_uv = np.asarray(state.kf_uv[k])
    fv = np.asarray(state.kf_feat_valid[k])
    fu = feat_uv[fv]
    msg = f"k={k} c={c}: has_c={has_c.sum()} in_img={in_img.sum()}"
    if in_img.sum() > 3:
        d = np.linalg.norm(uv_pred[in_img][:, None] - fu[None], axis=-1)
        dmin = d.min(axis=1)
        lm_desc = np.asarray(state.lm_desc)[lc_idx][in_img]
        feat_desc = np.asarray(state.kf_desc[k])[fv]
        near = dmin < 40.0
        if near.sum():
            nn = d[near].argmin(axis=1)
            ham = np.array([bin(int.from_bytes(
                np.bitwise_xor(lm_desc[i], feat_desc[j]).tobytes(),
                "little")).count("1")
                for i, j in zip(np.nonzero(near)[0], nn)])
            msg += (f" near40={near.sum()} px p50={np.percentile(dmin[near],50):.1f} "
                    f"ham p50={np.percentile(ham,50):.0f} "
                    f"<=64:{(ham<=64).sum()} <=80:{(ham<=80).sum()}")
    print(msg)

# persist the final state for fast offline analysis (scripts/debug_seam2.py)
from orb_slam3_vio_fixes_tpu.slam_map import snapshot
snapshot.save_atlas("/tmp/loopmap.npz", state, cfg.map, tr.n_kf, tr.n_lm,
                    tr.kf_order, hists=np.asarray(closer.db.hist))
print("saved /tmp/loopmap.npz")
