"""Per-stage timing of the stereo tracking path on the current backend.

Times each jitted sub-stage of the bench entry (extraction, stereo match,
SAD refine, pose opt) separately to direct kernel optimization — the
REGISTER_TIMES analogue for the device side.
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

from orb_slam3_vio_fixes_tpu.frontend import frame as frame_mod
from orb_slam3_vio_fixes_tpu.ops import image as image_ops
from orb_slam3_vio_fixes_tpu.ops import matching, orb
from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera, unproject


def _sync(out):
    # block_until_ready does not truly synchronize on the tunneled TPU
    # backend; a 1-element D2H read is the honest barrier
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0:1])


def bench_fn(fn, args, n=30, name=""):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
    return out


def main():
    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375)
    bf = jnp.float32(47.9)
    cfg = orb.ORBConfig(n_features=1024, n_levels=8)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(480, 752)).astype(np.float32)
    img_l = jnp.asarray(img)
    img_r = jnp.asarray(np.roll(img, -5, axis=1))

    print(f"backend: {jax.devices()[0].platform}")

    extract_pair = jax.jit(lambda a, b: orb.extract_pair(a, b, cfg))
    fl, fr = bench_fn(extract_pair, (img_l, img_r), name="extract_pair (2x ORB)")

    extract_one = jax.jit(lambda a: orb.extract(a, cfg))
    bench_fn(extract_one, (img_l,), name="extract single")

    sf = image_ops.scale_factors(cfg.n_levels, cfg.scale)

    row_match = jax.jit(
        lambda fl, fr: matching.stereo_row_match(
            fl.uv, fl.valid, fl.desc, fl.octave,
            fr.uv, fr.valid, fr.desc, fr.octave,
            sf, jnp.float32(0.0), cam.fx,
        )
    )
    ur, disp, dist = bench_fn(row_match, (fl, fr), name="stereo_row_match")

    sad = jax.jit(
        lambda il, ir, fl, ur, disp: frame_mod.sad_subpixel(
            il, ir, fl.uv, ur, (disp > 0) & fl.valid)
    )
    bench_fn(sad, (img_l, img_r, fl, ur, disp), name="sad_subpixel")

    full_frame = jax.jit(
        lambda a, b: frame_mod.build_stereo_frame(
            a, b, jnp.float32(0.0), cam, bf, cfg))
    frame = bench_fn(full_frame, (img_l, img_r), name="build_stereo_frame")

    def pose_opt(frame):
        ray = unproject(cam, frame.uv)
        has_depth = frame.depth > 0
        Xw = ray * jnp.where(has_depth, frame.depth, 1.0)[:, None]
        uvr = jnp.concatenate([frame.uv, frame.ur[:, None]], axis=-1)
        return ba_core.pose_optimize(
            jnp.eye(3), jnp.zeros(3), Xw, uvr,
            jnp.ones(Xw.shape[0], jnp.float32), frame.valid & has_depth,
            cam, bf, ba_core.LMConfig(n_rounds=1, n_iters=4),
        )
    pose_opt_j = jax.jit(pose_opt)
    bench_fn(pose_opt_j, (frame,), name="pose_optimize (1x4)")

    # sub-stages of extraction, single image, per-call
    pyr = jax.jit(lambda a: image_ops.build_pyramid(a, cfg.n_levels, cfg.scale))
    levels = bench_fn(pyr, (img_l,), name="build_pyramid")

    from orb_slam3_vio_fixes_tpu.ops import fast as fast_ops

    fast_l0 = jax.jit(lambda a: fast_ops.detect(a, budget=256))
    bench_fn(fast_l0, (img_l,), name="fast.detect L0 only")

    blur = jax.jit(image_ops.gaussian_blur)
    bench_fn(blur, (img_l,), name="gaussian_blur L0")


if __name__ == "__main__":
    main()
