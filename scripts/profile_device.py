"""Honest per-program DEVICE time attribution for the bench scenario.

Method: for each jitted stage, dispatch the same call N times back-to-back
(chained on its own output where possible) and sync ONCE at the end — the
per-call device time is (total - rtt) / N, free of the tunnel RTT that
pollutes per-call barriers. The RTT itself is measured with an empty pull.
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


def sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(fn, n=20, name=""):
    out = fn()
    sync(out)                      # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:28s} {dt:8.2f} ms/call (n={n})")
    return dt


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    seq = bench.make_sequence(n_frames=40)
    tr = bench.build_tracker(seq)
    # run the pipeline to populate a realistic map
    for i in range(40):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    tr.flush()
    print(f"map: kf={len(tr.kf_order)} lm={tr.n_lm}")

    # RTT of a minimal pull
    one = jnp.zeros(1)
    sync(one)
    t0 = time.perf_counter()
    for _ in range(20):
        jax.device_get(one)
    rtt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{'pull RTT':28s} {rtt:8.2f} ms")

    img_l = jnp.asarray(seq.imgs_l[-1])
    img_r = jnp.asarray(seq.imgs_r[-1])
    cam, bf, cfg = tr.cam, tr.bf, tr.cfg

    timeit(lambda: tr._build_stereo(img_l, img_r, 0.0).desc,
           name="frame_build (device-res)")
    f = tr._build_stereo(img_l, img_r, 0.0)
    window = tr._local_window()
    state = tr.state
    timeit(lambda: tracking.track_step(
        state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t,
        jnp.eye(3), jnp.zeros(3), f, window, cam, bf, jnp.float32(7.0),
        jnp.float32(14.0), jnp.float32(1.0), cfg)[3], name="track_step")
    # keyframe stages — donating programs get a fresh state copy per call;
    # the copy cost is measured separately and reported for subtraction
    from orb_slam3_vio_fixes_tpu.frontend import local_mapping as lm_mod
    kf_id = tr.kf_order[-1]
    lcfg = tr._lm_cfg()
    neighbors = np.full(lcfg.n_neighbors, -1, np.int32)
    for i, k in enumerate(tr.kf_order[:-1][::-1][: lcfg.n_neighbors]):
        neighbors[i] = k
    nb = jnp.asarray(neighbors)

    def cp():
        return jax.tree.map(jnp.copy, state)

    timeit(lambda: cp().lm_pos, name="state_copy (subtract)", n=10)
    timeit(lambda: tracking.create_keyframe(
        cp(), jnp.int32(kf_id), jnp.int32(tr.n_lm), f, tr.R, tr.t,
        tr.prev_obs, jnp.int32(tr.kf_order[-2]), cam, bf, cfg)[1],
        name="create_keyframe", n=10)
    timeit(lambda: lm_mod.create_new_landmarks(
        cp(), jnp.int32(kf_id), nb, jnp.int32(tr.n_lm), cam, bf, lcfg)[1],
        name="triangulate", n=10)
    timeit(lambda: lm_mod.fuse_duplicates(
        cp(), jnp.int32(kf_id), nb, cam, lcfg).kf_obs,
        name="fuse", n=10)
    adj, fixed = tr._ba_window(kf_id)
    timeit(lambda: tr._ba_window(kf_id)[1], name="ba_window", n=10)
    timeit(lambda: tracking.local_ba(cp(), adj, fixed, cam, bf, cfg)[0].lm_pos,
           name="local_ba", n=5)
    timeit(lambda: lm_mod.cull_landmarks(
        cp(), jnp.int32(tr.n_kf), lcfg).lm_valid, name="cull_landmarks", n=10)


if __name__ == "__main__":
    main()
