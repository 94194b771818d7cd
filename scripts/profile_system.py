"""Per-stage attribution of the FULL bench scenario (tracking + keyframe
work) on the current backend — answers "where do the 89 ms p50 / 806 ms p95
go?" with the same stage taxonomy as the reference's REGISTER_TIMES dump.

Profiling blocks at every stage boundary, so the fps printed here is NOT the
throughput number (bench.py measures that without barriers).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

import bench  # noqa: E402  (repo-root bench.py: scenario shared on purpose)
from orb_slam3_vio_fixes_tpu.runtime.actors import StageTimes  # noqa: E402


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seq = bench.make_sequence(n_frames=n_frames)
    print(f"backend: {jax.devices()[0].platform}", flush=True)

    # pass 1: compile warm-up
    tr = bench.build_tracker(seq)
    bench.run_pass(tr, seq, timed=False)

    # pass 2: profiled
    tr = bench.build_tracker(seq)
    tr.times = StageTimes()
    _, per_frame = bench.run_pass(tr, seq, timed=False)
    ms_arr = 1e3 * np.asarray(per_frame[1:])
    print(f"frames={len(per_frame)} keyframes={len(tr.kf_order)} "
          f"landmarks={tr.n_lm}")
    print(f"frame ms (BARRIERED): mean={ms_arr.mean():.1f} "
          f"p50={np.percentile(ms_arr, 50):.1f} "
          f"p95={np.percentile(ms_arr, 95):.1f} max={ms_arr.max():.1f}")
    print(tr.times.report())
    # stage totals per frame
    tot = sum(s["mean_ms"] * s["count"] for s in tr.times.summary().values())
    print(f"total attributed: {tot / len(per_frame):.1f} ms/frame")
    out = os.environ.get("PROFILE_OUT")
    if out:
        import json

        with open(out, "w") as f:
            json.dump({
                "backend": jax.devices()[0].platform,
                "frames": len(per_frame),
                "keyframes": len(tr.kf_order),
                "landmarks": tr.n_lm,
                "frame_ms_barriered": {
                    "mean": round(float(ms_arr.mean()), 1),
                    "p50": round(float(np.percentile(ms_arr, 50)), 1),
                    "p95": round(float(np.percentile(ms_arr, 95)), 1),
                },
                "stages_ms": {k: {kk: round(vv, 3) for kk, vv in s.items()}
                              for k, s in tr.times.summary().items()},
            }, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
