"""Benchmark: stereo tracking front-end throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/second of the latency-critical tracking path (stereo ORB
extraction + row matching + motion-only pose optimization) on EuRoC-sized
752x480 stereo frames with 1024 feature slots. Baseline: the reference is
"real-time on an i7" at the EuRoC camera rate of 20 fps
(BASELINE.md (a): README.md:8, Examples/Stereo-Inertial/EuRoC.yaml:47), so
vs_baseline = fps / 20.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()


def main():
    from __graft_entry__ import entry

    fn, (img_l, img_r) = entry()
    jfn = jax.jit(fn)

    # warm-up / compile
    out = jfn(img_l, img_r)
    jax.block_until_ready(out)

    # build a small pool of distinct inputs to defeat caching
    rng = np.random.default_rng(1)
    pool = []
    for i in range(4):
        im = rng.uniform(0, 255, size=img_l.shape).astype(np.float32)
        pool.append((jnp.asarray(im), jnp.asarray(np.roll(im, -4 - i, axis=1))))

    # warm pass: the first dispatches after compile can include tunnel /
    # allocator stragglers that aren't steady-state throughput
    for i in range(10):
        a, b = pool[i % len(pool)]
        out = jfn(a, b)
    jax.block_until_ready(out)

    n_iters = 50
    t0 = time.perf_counter()
    for i in range(n_iters):
        a, b = pool[i % len(pool)]
        out = jfn(a, b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(
        json.dumps(
            {
                "metric": "stereo_tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
