"""Sub-stage device timing of the frame-build + track_step pipeline.

Each candidate sub-stage is jitted standalone and timed with chained
dispatch + one final sync (same method as profile_device.py).
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
from orb_slam3_vio_fixes_tpu.ops import fast as fast_ops
from orb_slam3_vio_fixes_tpu.ops import image as image_ops
from orb_slam3_vio_fixes_tpu.ops import matching, orb
from orb_slam3_vio_fixes_tpu.frontend import frame as frame_mod


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
    print(f"{name:32s} {dt:8.3f} ms/call", flush=True)
    return dt


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    seq = bench.make_sequence(n_frames=4)
    tr = bench.build_tracker(seq)
    cfg = tr.cfg.orb
    h, w = seq.imgs_l.shape[1:3]
    img_l = jnp.asarray(seq.imgs_l[0].astype(np.uint8))
    img_r = jnp.asarray(seq.imgs_r[0].astype(np.uint8))
    imgs = jnp.stack([img_l, img_r]).astype(jnp.float32)

    layout = image_ops.atlas_layout(h, w, cfg.n_levels, cfg.scale,
                                    align=cfg.cell)
    budgets = tuple(orb.features_per_level(cfg))

    pyr = jax.jit(jax.vmap(
        lambda im: image_ops.build_pyramid_atlas(im, cfg.n_levels, cfg.scale,
                                                 layout)))
    timeit(lambda: pyr(imgs), name="pyramid_atlas (x2)")
    atlases = pyr(imgs)

    from orb_slam3_vio_fixes_tpu.ops import pallas_kernels as pk
    score_fn = jax.jit(pk.fast_score_batch)
    timeit(lambda: score_fn(atlases), name="fast_score pallas (x2)")
    scores = score_fn(atlases)

    detect = jax.jit(jax.vmap(functools_partial_detect(layout, budgets, cfg)))
    timeit(lambda: detect(scores), name="detect (cells+topk) (x2)")
    ay, ax, sc, valid, octv = detect(scores)

    blur = jax.jit(jax.vmap(image_ops.gaussian_blur))
    timeit(lambda: blur(atlases), name="gaussian_blur (x2)")
    blurred = blur(atlases)

    gather = jax.jit(jax.vmap(
        lambda b, y, x: orb._gather_patches(b, jnp.stack([y, x], axis=-1))))
    timeit(lambda: gather(blurred, ay, ax), name="gather_patches 45x45 (x2)")
    patches = gather(blurred, ay, ax)

    orient = jax.jit(jax.vmap(orb._orientation))
    timeit(lambda: orient(patches), name="orientation (x2)")
    ang = orient(patches)

    desc = jax.jit(jax.vmap(orb._describe_mm))
    timeit(lambda: desc(patches, ang), name="describe_mm (x2)")

    full = jax.jit(lambda l, r: orb.extract_pair(l, r, cfg)[0].desc)
    timeit(lambda: full(img_l, img_r), name="extract_pair total")

    # stereo association
    fl, fr = orb.extract_pair(img_l, img_r, cfg)
    sf = image_ops.scale_factors(cfg.n_levels, cfg.scale)
    row = jax.jit(lambda: matching.stereo_row_match(
        fl.uv, fl.valid, fl.desc, fl.octave, fr.uv, fr.valid, fr.desc,
        fr.octave, sf, jnp.float32(0.0), jnp.float32(458.0)))
    timeit(row, name="stereo_row_match")
    ur, disp, dist = row()
    sad = jax.jit(lambda: frame_mod.sad_subpixel(
        img_l.astype(jnp.float32), img_r.astype(jnp.float32), fl.uv, ur,
        (disp > 0) & fl.valid))
    timeit(sad, name="sad_subpixel")

    bsf = jax.jit(lambda l, r: frame_mod.build_stereo_frame(
        l, r, jnp.float32(0.0), tr.cam, tr.bf, cfg).desc)
    timeit(lambda: bsf(img_l, img_r), name="build_stereo_frame total")


def functools_partial_detect(layout, budgets, cfg):
    def f(score):
        return fast_ops.detect_atlas_from_score(
            score, layout, budgets, threshold=cfg.fast_threshold,
            threshold_min=cfg.fast_threshold_min, cell=cfg.cell,
            max_per_cell=cfg.max_per_cell)
    return f


if __name__ == "__main__":
    main()
