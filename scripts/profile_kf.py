"""Steady-state timing of the keyframe-insertion kernels on the TPU.

profile_system.py's in-pipeline numbers are compile-skewed (first call per
tier); this times each jitted stage standalone with repeats and a real D2H
sync, and probes LM-iteration scaling of local_ba (dispatch-bound vs
compute-bound).
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
from orb_slam3_vio_fixes_tpu.frontend import local_mapping as lm_mod
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.optim import ba_core


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.device_get(leaf.ravel()[0:1])


def timeit(fn, reps=10, name=""):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dt:8.1f} ms")
    return dt


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    seq = bench.make_sequence(n_frames=40)
    tr = bench.build_tracker(seq)
    for i in range(40):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    tr.flush()
    print(f"map: kfs={len(tr.kf_order)} lms={tr.n_lm}")
    state_np = jax.tree.map(np.asarray, tr.state)   # host copy: several
    # stage kernels DONATE their input; each call gets a fresh device copy

    def fresh():
        return jax.tree.map(jnp.asarray, state_np)

    state = tr.state
    cfg = tr.cfg
    cam, bf = tr.cam, tr.bf
    kf_id = tr.kf_order[-1]

    # ---- stage kernels on the live map ----
    lcfg = tr._lm_cfg()
    neighbors = jnp.asarray(np.asarray(
        (tr.kf_order[:-1][::-1][:lcfg.n_neighbors] + [-1] * lcfg.n_neighbors)
        [:lcfg.n_neighbors], np.int32))

    timeit(lambda: tracking.select_ba_window(
        state, jnp.int32(kf_id), jnp.int32(tr.kf_order[0]), cfg),
        name="select_ba_window")
    adj, fixed = tracking.select_ba_window(
        state, jnp.int32(kf_id), jnp.int32(tr.kf_order[0]), cfg)

    timeit(lambda: lm_mod.fuse_duplicates(
        fresh(), jnp.int32(kf_id), neighbors, cam,
        lcfg), name="fuse_duplicates")
    timeit(lambda: lm_mod.cull_landmarks(
        fresh(), jnp.int32(tr.n_kf), lcfg),
        name="cull_landmarks")

    for rounds, iters in [(2, 6), (1, 6), (1, 3), (1, 1)]:
        cfg2 = cfg  # local_ba takes LMConfig internally; patch via closure
        def run():
            st = fresh()
            # call bundle_adjust directly with the window factors
            from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
            window = jnp.concatenate([adj, fixed])
            K = st.kf_obs.shape[0]
            safe_w = jnp.clip(window, 0, K - 1)
            w_ok = (window >= 0) & st.kf_valid[safe_w]
            fx = jnp.concatenate([
                jnp.zeros_like(adj, dtype=bool),
                jnp.ones_like(fixed, dtype=bool)]) | ~w_ok
            inv = tracking.octave_inv_sigma2(cfg.orb)
            pi, li, uvr, is2, valid = ms.ba_factors_from_map(st, window, inv)
            fac = ba_core.ReprojFactors(pi, li, uvr, is2, valid)
            n_obs = ms.landmark_obs_count(st)
            prob = ba_core.BAProblem(
                R=st.kf_R[safe_w], t=st.kf_t[safe_w], pose_fixed=fx,
                lm=st.lm_pos, lm_valid=st.lm_valid, lm_fixed=n_obs < 2,
                factors=fac, cam=cam, bf=bf)
            out, inl, chi2 = ba_core.bundle_adjust(
                prob, ba_core.LMConfig(n_rounds=rounds, n_iters=iters))
            return out.lm
        timeit(run, reps=5, name=f"local_ba rounds={rounds} iters={iters}")

    # track path steady state
    f = tr._build_stereo(seq.imgs_l[-1], seq.imgs_r[-1], seq.ts[-1])
    sync(f.desc)
    timeit(lambda: tr._build_stereo(seq.imgs_l[-1], seq.imgs_r[-1],
                                    seq.ts[-1]).desc,
           name="build_stereo_frame")
    window = tr._local_window()
    timeit(lambda: tracking.track_step(
        state, tr.prev_obs, tr.prev_octave, tr.prev_angle, tr.R, tr.t,
        jnp.eye(3), jnp.zeros(3), f, window, cam, bf,
        jnp.float32(7.0), jnp.float32(14.0), jnp.float32(1.0), cfg)[3],
        name="track_step")


if __name__ == "__main__":
    main()
