"""Replicate search_by_projection's gates one by one for the true seam pair
(k=59, c=0) to find which gate zeroes the guided matches."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops import matching
from orb_slam3_vio_fixes_tpu.slam_map import snapshot
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

state, cfg, meta, hists, stored, _ = snapshot.load_atlas("/tmp/loopmap.npz")
cam = Camera.pinhole(260.0, 260.0, 176.0, 120.0)
scale, n_levels = 1.2, 4

for k, c in [(59, 0), (58, 0)]:
    obs_c = np.asarray(state.kf_obs[c])
    lc_idx = np.clip(obs_c, 0, state.lm_pos.shape[0] - 1)
    has_c = (obs_c >= 0) & np.asarray(state.lm_valid)[lc_idx] \
        & np.asarray(state.kf_feat_valid[c])
    Xw = np.asarray(state.lm_pos)[lc_idx]
    Y = Xw @ np.asarray(state.kf_R[k]).T + np.asarray(state.kf_t[k])
    uv_pred = np.asarray(project(cam, jnp.asarray(Y)))
    depth_ok = Y[:, 2] > 0.1
    dist_c = np.linalg.norm(Y, axis=-1)
    maxd = np.asarray(state.lm_maxdist)[lc_idx]
    ratio_d = np.maximum(maxd / np.maximum(dist_c, 1e-9), 1e-9)
    octv = np.clip(np.ceil(np.log(ratio_d) / np.log(scale)).astype(int),
                   0, n_levels - 1)
    sf = scale ** octv.astype(float)
    radius = 40.0 * sf
    fv = np.asarray(state.kf_feat_valid[k])
    fu = np.asarray(state.kf_uv[k])
    fo = np.asarray(state.kf_octave[k])
    fd = np.asarray(state.kf_desc[k])
    lm_desc = np.asarray(state.lm_desc)[lc_idx]

    ok = has_c & depth_ok
    du = uv_pred[:, None, 0] - fu[None, :, 0]
    dv = uv_pred[:, None, 1] - fu[None, :, 1]
    within = (du**2 + dv**2) <= (radius[:, None] ** 2)
    oct_ok = (fo[None, :] >= octv[:, None] - 1) & (fo[None, :] <= octv[:, None] + 1)
    base = ok[:, None] & fv[None, :]
    print(f"k={k} c={c}: pairs base={base.sum()} +within={int((base&within).sum())} "
          f"+octave={(base & within & oct_ok).sum()}")
    mask = base & within & oct_ok
    # hamming over masked pairs
    x = np.ascontiguousarray(np.bitwise_xor(lm_desc[:, None, :], fd[None, :, :]))
    ham = np.unpackbits(x.view(np.uint8).reshape(x.shape[0], x.shape[1], -1),
                        axis=2).sum(2)
    best = np.where(mask, ham, 1 << 20).min(1)
    n_any = (best < 1 << 20).sum()
    print(f"  rows with any admissible feat: {n_any}; "
          f"best<=64: {(best <= 64).sum()}  best<=80: {(best <= 80).sum()}  "
          f"best<=100: {(best <= 100).sum()}")
    # what does the real search_by_projection return?
    res = matching.search_by_projection(
        jnp.asarray(uv_pred), jnp.asarray(ok), jnp.asarray(lm_desc),
        jnp.asarray(octv), jnp.asarray(radius, dtype=jnp.float32),
        jnp.asarray(fu), jnp.asarray(fv), jnp.asarray(fd), jnp.asarray(fo),
        max_dist=64)
    print(f"  search_by_projection(max64): {int(res.n)}; max80: ", end="")
    res80 = matching.search_by_projection(
        jnp.asarray(uv_pred), jnp.asarray(ok), jnp.asarray(lm_desc),
        jnp.asarray(octv), jnp.asarray(radius, dtype=jnp.float32),
        jnp.asarray(fu), jnp.asarray(fv), jnp.asarray(fd), jnp.asarray(fo),
        max_dist=80)
    print(int(res80.n))
    # octave distribution of the pairs that pass hamming<=64 without oct gate
    mask2 = base & within
    best2_idx = np.where(mask2, ham, 1 << 20).argmin(1)
    best2 = np.where(mask2, ham, 1 << 20).min(1)
    good = best2 <= 64
    if good.sum():
        po = octv[good]
        fo2 = fo[best2_idx[good]]
        print(f"  (no oct gate) best<=64: {good.sum()}, |po-fo|<=1: "
              f"{(np.abs(po - fo2) <= 1).sum()}  po hist={np.bincount(po, minlength=4)} "
              f"fo hist={np.bincount(fo2, minlength=4)}")
