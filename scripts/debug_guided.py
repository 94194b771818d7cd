"""Dissect the prior-guided loop verification stage on a real tracker map:
projection error distributions, octave gates, Hamming distributions."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import matching, orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

N_FRAMES = 40
rng = np.random.default_rng(5)
seq = synthetic.make_loop_stereo_sequence(
    rng, n_frames=72, h=240, w=352, fx=260.0, baseline=0.2,
    radius=3.0, wall_radius=9.0, n_points=1400)
noise = rng.normal(0, 2.0, seq.imgs_l.shape).astype(np.float32)
seq = seq._replace(imgs_l=seq.imgs_l + noise)

cfg = tracking.TrackerConfig(
    orb=orb.ORBConfig(n_features=384, n_levels=4),
    map=ms.MapConfig(max_keyframes=64, max_landmarks=8192, max_features=384),
    width=352, height=240, max_local_lm=2048, ba_window=6, ba_fixed=2,
    new_lm_budget=256, max_frames_between_kf=4)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
tr.match_radius = (15.0, 30.0)
for i in range(N_FRAMES):
    tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
print("kfs:", tr.kf_order, "n_lm:", tr.n_lm)

state = tr.state
scale = cfg.orb.scale
n_levels = cfg.orb.n_levels

for k, c in [(17, 13), (17, 4), (20, 8)]:
    obs_c = np.asarray(state.kf_obs[c])
    lc = np.clip(obs_c, 0, state.lm_pos.shape[0] - 1)
    has_c = (obs_c >= 0) & np.asarray(state.lm_valid)[lc] \
        & np.asarray(state.kf_feat_valid[c])
    R_k = np.asarray(state.kf_R[k]); t_k = np.asarray(state.kf_t[k])
    Xw = np.asarray(state.lm_pos)[lc]
    Y = Xw @ R_k.T + t_k
    uv_pred = np.asarray(project(cam, jnp.asarray(Y)))
    depth_ok = Y[:, 2] > 0.1
    ok = has_c & depth_ok
    in_img = ok & (uv_pred[:, 0] >= 0) & (uv_pred[:, 0] < 352) & \
        (uv_pred[:, 1] >= 0) & (uv_pred[:, 1] < 240)
    print(f"\nk={k} c={c}: has_c={has_c.sum()} depth_ok={ok.sum()} "
          f"in_image={in_img.sum()}")
    if in_img.sum() == 0:
        continue
    # distance from each projected landmark to nearest feature
    feat_uv = np.asarray(state.kf_uv[k])
    feat_valid = np.asarray(state.kf_feat_valid[k])
    fu = feat_uv[feat_valid]
    d = np.linalg.norm(uv_pred[in_img][:, None] - fu[None], axis=-1)
    dmin = d.min(axis=1)
    print(f"  px dist to nearest feat: p10={np.percentile(dmin,10):.1f} "
          f"p50={np.percentile(dmin,50):.1f} p90={np.percentile(dmin,90):.1f}")
    # octave prediction vs actual feature octaves
    dist_c = np.linalg.norm(Y[in_img], axis=-1)
    maxd = np.asarray(state.lm_maxdist)[lc][in_img]
    ratio_d = np.maximum(maxd / np.maximum(dist_c, 1e-9), 1e-9)
    octv = np.clip(np.ceil(np.log(ratio_d) / np.log(scale)).astype(int),
                   0, n_levels - 1)
    print(f"  pred octave hist: {np.bincount(octv, minlength=4)}  "
          f"feat octave hist: "
          f"{np.bincount(np.asarray(state.kf_octave[k])[feat_valid], minlength=4)}")
    # Hamming between landmark desc and the nearest feature (within 20px)
    lm_desc = np.asarray(state.lm_desc)[lc][in_img]
    feat_desc = np.asarray(state.kf_desc[k])[feat_valid]
    near = dmin < 20.0
    if near.sum():
        nn = d[near].argmin(axis=1)
        ham = [bin(int.from_bytes(
            np.bitwise_xor(lm_desc[i], feat_desc[nn_i]).tobytes(), "little")
        ).count("1") for i, nn_i in zip(np.nonzero(near)[0], nn)]
        ham = np.array(ham)
        print(f"  hamming lm_desc<->nearest feat (within 20px, n={near.sum()}): "
              f"p10={np.percentile(ham,10):.0f} p50={np.percentile(ham,50):.0f} "
              f"p90={np.percentile(ham,90):.0f} (<=64: {(ham<=64).sum()})")
        # octave gate survival among near pairs
        po = octv[near]
        fo = np.asarray(state.kf_octave[k])[feat_valid][nn]
        print(f"  octave gate |po-fo|<=1 pass: {(np.abs(po-fo)<=1).sum()}/{near.sum()}")
