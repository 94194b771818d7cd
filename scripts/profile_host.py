"""Host-side wall-time breakdown of the bench loop: where do the ~41 ms
per frame go when device time is only ~21 ms?

Times each host segment (upload, flush/pull, dispatch) with perf_counter,
no extra device syncs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

import bench


def main():
    seq = bench.make_sequence(n_frames=60)
    tr = bench.build_tracker(seq)
    tr.pipelined = True
    tr.async_kf = True
    bench.run_pass(tr, seq, timed=False)  # warm

    tr = bench.build_tracker(seq)
    tr.pipelined = True
    tr.async_kf = True
    n = seq.imgs_l.shape[0]
    seg = {k: [] for k in ("upload", "flush", "build", "track_dispatch",
                           "kf_job", "rest")}
    nxt = (tr._upload_image(seq.imgs_l[0]), tr._upload_image(seq.imgs_r[0]))

    # monkey-patch instrumentation points
    orig_finalize = tr._finalize_track
    orig_build = tr._build_stereo
    orig_runjob = tr._run_kf_job

    def fin(*a, **k):
        t0 = time.perf_counter()
        r = orig_finalize(*a, **k)
        seg["flush"].append(time.perf_counter() - t0)
        return r

    def bld(*a, **k):
        t0 = time.perf_counter()
        r = orig_build(*a, **k)
        seg["build"].append(time.perf_counter() - t0)
        return r

    def job():
        t0 = time.perf_counter()
        orig_runjob()
        seg["kf_job"].append(time.perf_counter() - t0)

    tr._finalize_track = fin
    tr._build_stereo = bld
    tr._run_kf_job = job

    frame_ms = []
    for i in range(n):
        f0 = time.perf_counter()
        cur = nxt
        tr.process_stereo(cur[0], cur[1], seq.ts[i])
        t1 = time.perf_counter()
        if i + 1 < n:
            nxt = (tr._upload_image(seq.imgs_l[i + 1]),
                   tr._upload_image(seq.imgs_r[i + 1]))
        t2 = time.perf_counter()
        seg["upload"].append(t2 - t1)
        frame_ms.append(t2 - f0)
    tr.flush()

    def stat(v):
        a = 1e3 * np.asarray(v[2:])
        return f"mean={a.mean():6.2f} p50={np.percentile(a, 50):6.2f} p95={np.percentile(a, 95):6.2f} n={len(a)}"

    for k, v in seg.items():
        if v:
            print(f"{k:14s} {stat(v)}")
    print(f"{'TOTAL frame':14s} {stat(frame_ms)}")


if __name__ == "__main__":
    main()
