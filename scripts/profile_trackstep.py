"""Device-time attribution inside track_step: match_previous, pose opt
(both call sites), local-map candidate selection + projection search.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

import bench
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.ops import matching, image as image_ops


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(fn, n=30, name=""):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dt:8.3f} ms/call", flush=True)
    return dt


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    seq = bench.make_sequence(n_frames=40)
    tr = bench.build_tracker(seq)
    for i in range(40):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    tr.flush()
    print(f"map: kf={len(tr.kf_order)} lm={tr.n_lm}")

    cfg = tr.cfg
    cam, bf = tr.cam, tr.bf
    f = tr._build_stereo(jnp.asarray(seq.imgs_l[-1]),
                         jnp.asarray(seq.imgs_r[-1]), 0.0)
    state = tr.state
    window = tr._local_window()
    th = jnp.float32(7.0)

    mp = jax.jit(lambda: tracking.match_previous(
        state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t, f,
        cam, bf, th, cfg))
    timeit(mp, name="match_previous")
    cur_obs, _ = mp()

    po = jax.jit(lambda: tracking.pose_opt_from_obs(
        state, tr.R, tr.t, f, cur_obs, cam, bf, cfg)[0])
    timeit(po, name=f"pose_opt ({cfg.po_rounds}x{cfg.po_iters})")

    tlm = jax.jit(lambda: tracking.track_local_map(
        state, tr.R, tr.t, f, cur_obs, window, cam, bf, jnp.float32(1.0),
        cfg)[0])
    timeit(tlm, name="track_local_map (search+PO)")

    # candidate selection + search alone (no pose opt)
    def search_only():
        K, N = state.kf_obs.shape
        L = state.lm_pos.shape[0]
        safe_w = jnp.clip(window, 0, K - 1)
        w_ok = (window >= 0) & state.kf_valid[safe_w]
        obs_rows = jnp.where(w_ok[:, None], state.kf_obs[safe_w], -1)
        cand_mask = jnp.zeros(L, bool).at[
            jnp.clip(obs_rows.reshape(-1), 0, L - 1)].max(
            obs_rows.reshape(-1) >= 0)
        cand_mask &= state.lm_valid
        _, cand_idx = jax.lax.top_k(cand_mask.astype(jnp.float32),
                                    cfg.max_local_lm)
        return cand_idx

    so = jax.jit(search_only)
    timeit(so, name="cand top_k")

    cand_idx = so()
    from orb_slam3_vio_fixes_tpu.utils.cameras import project, in_image

    def proj_search():
        X = state.lm_pos[cand_idx]
        Xc = jnp.einsum("ij,mj->mi", tr.R, X) + tr.t
        uv = project(cam, Xc)
        z = Xc[:, 2]
        ur = uv[:, 0] - bf / jnp.maximum(z, 1e-6)
        vis = (z > 0) & in_image(uv, cfg.width, cfg.height)
        sf = image_ops.scale_factors(cfg.orb.n_levels, cfg.orb.scale)
        res = matching.search_by_projection(
            uv, vis, state.lm_desc[cand_idx], jnp.zeros_like(cand_idx),
            4.0 * jnp.ones(cand_idx.shape[0]),
            f.uv, f.valid, f.desc, f.octave,
            proj_ur=ur, feat_ur=f.ur, ratio=0.8)
        return res.idx

    timeit(jax.jit(proj_search), name=f"search_by_projection ({cfg.max_local_lm})")

    full = jax.jit(lambda: tracking.track_step(
        state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t,
        jnp.eye(3), jnp.zeros(3), f, window, cam, bf, th, jnp.float32(14.0),
        jnp.float32(1.0), cfg)[3])
    timeit(full, name="track_step total")


if __name__ == "__main__":
    main()
