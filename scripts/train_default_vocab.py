"""Train and check in the framework's default BoW vocabulary (>=10^4 words).

The reference ships a pretrained 10^6-leaf ORBvoc (include/ORBVocabulary.h:29,
Vocabulary/ORBvoc.txt); this trains the framework's k-medians vocabulary on a
descriptor corpus harvested from a diverse set of synthetic worlds and
trajectories (the imagery domain of this environment) and stores it under
orb_slam3_vio_fixes_tpu/assets/vocab_b10d4.npz for examples and tests.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.utils import compile_cache

compile_cache.enable()

from orb_slam3_vio_fixes_tpu.frontend.frame import build_stereo_frame
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


def harvest():
    ocfg = orb.ORBConfig(n_features=512, n_levels=4)
    cam = Camera.pinhole(260.0, 260.0, 176.0, 120.0)
    bf = jnp.float32(52.0)
    pool = []
    for seed in range(6):
        rng = np.random.default_rng(seed)
        if seed % 2 == 0:
            seq = synthetic.make_loop_stereo_sequence(
                rng, n_frames=24, h=240, w=352, fx=260.0, baseline=0.2,
                radius=2.0 + seed * 0.5, wall_radius=8.0 + seed,
                n_points=1200 + 100 * seed)
        else:
            world = synthetic.make_world(rng, n_points=700 + 100 * seed,
                                         extent=8.0, depth_range=(3.0, 12.0))
            seq = synthetic.make_stereo_sequence(
                rng, n_frames=24, h=240, w=352, fx=260.0, baseline=0.2,
                world=world)
        for i in range(0, seq.imgs_l.shape[0], 2):
            img = seq.imgs_l[i] + rng.normal(0, 1.5, seq.imgs_l[i].shape)
            f = build_stereo_frame(
                jnp.asarray(img, jnp.float32),
                jnp.asarray(seq.imgs_r[i], jnp.float32),
                jnp.float32(0.0), cam, bf, ocfg)
            pool.append(np.asarray(f.desc)[np.asarray(f.valid)])
        print(f"seed {seed}: corpus {sum(len(p) for p in pool)}", flush=True)
    return np.concatenate(pool)


def main():
    corpus = harvest()
    print(f"training on {len(corpus)} descriptors (b=10, d=4: 10^4 words)")
    vocab = voc.train(corpus, branching=10, depth=4, seed=0)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "orb_slam3_vio_fixes_tpu", "assets",
        "vocab_b10d4.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    voc.save(vocab, out)
    print(f"saved {out} ({os.path.getsize(out)} bytes, "
          f"{vocab.weights.shape[0]} words)")


if __name__ == "__main__":
    main()
