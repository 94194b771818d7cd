"""Measure HOST dispatch cost (call returns, no sync) vs DEVICE time for the
per-frame programs — distinguishes tunnel/arg-processing overhead from
compute.
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


def measure(fn, n=50, name=""):
    out = fn()
    sync(out)
    # dispatch-only: host time per call, letting the device queue absorb
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    disp = (time.perf_counter() - t0) / n * 1e3
    sync(outs[-1])
    # total: back-to-back with end sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    tot = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:30s} dispatch={disp:7.3f} ms  total={tot:7.3f} ms", flush=True)


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    seq = bench.make_sequence(n_frames=40)
    tr = bench.build_tracker(seq)
    for i in range(40):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    tr.flush()

    cfg, cam, bf = tr.cfg, tr.cam, tr.bf
    img_l = jnp.asarray(seq.imgs_l[-1])
    img_r = jnp.asarray(seq.imgs_r[-1])
    f = tr._build_stereo(img_l, img_r, 0.0)
    state = tr.state
    window = tr._local_window()
    th_n, th_w, th_l = jnp.float32(7.0), jnp.float32(14.0), jnp.float32(1.0)
    eye, zero = jnp.eye(3), jnp.zeros(3)

    measure(lambda: tr._build_stereo(img_l, img_r, 0.0).desc,
            name="build_stereo (method)")
    measure(lambda: tracking.track_step(
        state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t,
        eye, zero, f, window, cam, bf, th_n, th_w, th_l, cfg)[3],
        name="track_step (module jit)")

    jl = jax.jit(lambda s, po, poc, pa, R, t, fr, w: tracking.track_step(
        s, po, poc, pa, R, t, eye, zero, fr, w, cam, bf, th_n, th_w, th_l,
        cfg)[3])
    measure(lambda: jl(state, tr.prev_obs, tr.prev_octave, tr.prev_angle,
                       tr.R, tr.t, f, window),
            name="track_step (fewer args)")

    closed = jax.jit(lambda: tracking.track_step(
        state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t,
        eye, zero, f, window, cam, bf, th_n, th_w, th_l, cfg)[3])
    measure(closed, name="track_step (all closed)")

    # a trivial program with the same MapState pytree arg
    triv = jax.jit(lambda s: s.lm_pos[0, 0] + 1.0)
    measure(lambda: triv(state), name="trivial(state) arg cost")
    triv2 = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros(8)
    measure(lambda: triv2(xs), name="trivial(vec) arg cost")


if __name__ == "__main__":
    main()
