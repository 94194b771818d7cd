"""Fast offline analysis on the saved loop map (/tmp/loopmap.npz):
1. min-Hamming within a window (not nearest-by-distance) for true seam pairs;
2. the fixed grouped retrieval's candidate lists at the revisit keyframes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import snapshot, vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, project

state, cfg, meta, hists, stored, _ = snapshot.load_atlas("/tmp/loopmap.npz")
kf_order = list(meta["kf_order"])
cam = Camera.pinhole(260.0, 260.0, 176.0, 120.0)
print("kfs:", len(kf_order))

# 1) min-Hamming within a 15px window for true pairs
for k, c in [(59, 0), (59, 1), (58, 0), (57, 0), (55, 0)]:
    obs_c = np.asarray(state.kf_obs[c])
    lc_idx = np.clip(obs_c, 0, state.lm_pos.shape[0] - 1)
    has_c = (obs_c >= 0) & np.asarray(state.lm_valid)[lc_idx] \
        & np.asarray(state.kf_feat_valid[c])
    Xw = np.asarray(state.lm_pos)[lc_idx]
    Y = Xw @ np.asarray(state.kf_R[k]).T + np.asarray(state.kf_t[k])
    uv_pred = np.asarray(project(cam, jnp.asarray(Y)))
    ok = has_c & (Y[:, 2] > 0.1)
    fv = np.asarray(state.kf_feat_valid[k])
    fu = np.asarray(state.kf_uv[k])[fv]
    fd = np.asarray(state.kf_desc[k])[fv]
    lm_desc = np.asarray(state.lm_desc)[lc_idx]
    cd = np.asarray(state.kf_desc[c])  # candidate's own observation desc
    n_le = {15: [], 25: [], 40: []}
    for r in n_le:
        cnt64 = cnt80 = tot = 0
        for i in np.nonzero(ok)[0]:
            d = np.linalg.norm(fu - uv_pred[i], axis=-1)
            w = d <= r
            if not w.any():
                continue
            tot += 1
            x = np.bitwise_xor(fd[w], lm_desc[i][None])
            hams = np.unpackbits(x.view(np.uint8), axis=1).sum(1)
            mh = hams.min()
            cnt64 += mh <= 64
            cnt80 += mh <= 80
        n_le[r] = (tot, cnt64, cnt80)
    print(f"k={k} c={c}: windowed min-ham (lm_desc): "
          + "  ".join(f"r{r}: n={t} <=64:{a} <=80:{b}"
                      for r, (t, a, b) in n_le.items()))
    # same but with the candidate KF's own observation descriptor
    cnt64 = cnt80 = tot = 0
    for i in np.nonzero(ok)[0]:
        d = np.linalg.norm(fu - uv_pred[i], axis=-1)
        w = d <= 25
        if not w.any():
            continue
        tot += 1
        x = np.bitwise_xor(fd[w], cd[i][None])
        hams = np.unpackbits(x.view(np.uint8), axis=1).sum(1)
        mh = hams.min()
        cnt64 += mh <= 64
        cnt80 += mh <= 80
    print(f"            kf_desc[c] variant r25: n={tot} <=64:{cnt64} <=80:{cnt80}")

# 2) fixed grouped retrieval
db = voc.KeyFrameDatabase(jnp.asarray(hists))
cov = ms.covisibility(state)
for q in [55, 56, 57, 58, 59]:
    ids = np.arange(hists.shape[0])
    exclude = (np.asarray(cov[q]) > 0) | (ids > q - 8) | \
        ~np.asarray(state.kf_valid)
    cand, sc = voc.db_query_grouped(
        db, jnp.asarray(hists[q]), cov.astype(jnp.float32),
        jnp.asarray(exclude), jnp.float32(0.03), n_best=3)
    print(f"q={q}: grouped cands={np.asarray(cand).tolist()} "
          f"scores={np.round(np.asarray(sc), 3).tolist()}")
