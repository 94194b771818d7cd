"""Train the production-scale BoW vocabulary: 10^5 leaves (b=10, d=5).

The reference ships a 10^6-leaf ORBvoc trained on a large real-image corpus
(include/ORBVocabulary.h:29-30, Vocabulary/ORBvoc.txt). This environment has
no real imagery, so the corpus is harvested from a DIVERSE set of synthetic
scenes — loop walls, random sprite worlds, and renders along real EuRoC
ground-truth trajectories — with half the frames photometrically degraded
(noise/blur/exposure/vignette, io/synthetic.SensorNoise) so word assignment
is robust to the imaging conditions the gates test at. Saved to
orb_slam3_vio_fixes_tpu/assets/vocab_b10d5.npz; vocabulary.default_vocabulary
prefers it over the 10^4 artifact when present.
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

GT_DIR = "/root/reference/evaluation/Ground_truth/EuRoC_left_cam"


def harvest(target=600_000):
    ocfg = orb.ORBConfig(n_features=1024, n_levels=8)
    cam = Camera.pinhole(260.0, 260.0, 176.0, 120.0)
    bf = jnp.float32(52.0)
    pool = []
    n_total = 0

    def eat(seq, rng, degrade):
        nonlocal n_total
        imgs_l, imgs_r = seq.imgs_l, seq.imgs_r
        if degrade:
            imgs_l = synthetic.degrade_images(imgs_l, rng,
                                              synthetic.DEFAULT_NOISE)
        for i in range(imgs_l.shape[0]):
            f = build_stereo_frame(
                jnp.asarray(imgs_l[i], jnp.float32),
                jnp.asarray(imgs_r[i], jnp.float32),
                jnp.float32(0.0), cam, bf, ocfg)
            d = np.asarray(f.desc)[np.asarray(f.valid)]
            pool.append(d)
            n_total += len(d)

    seed = 0
    gts = ["MH01_GT.txt", "V101_GT.txt", "V201_GT.txt", "MH03_GT.txt"]
    while n_total < target:
        rng = np.random.default_rng(seed)
        kind = seed % 4
        if kind == 0:
            seq = synthetic.make_loop_stereo_sequence(
                rng, n_frames=32, h=240, w=352, fx=260.0, baseline=0.2,
                radius=1.5 + 0.4 * seed, wall_radius=7.0 + (seed % 5),
                n_points=1200 + 120 * (seed % 7))
        elif kind == 1:
            world = synthetic.make_world(
                rng, n_points=600 + 90 * (seed % 9),
                extent=6.0 + (seed % 5), depth_range=(2.5, 9.0 + seed % 6))
            seq = synthetic.make_stereo_sequence(
                rng, n_frames=32, h=240, w=352, fx=260.0, baseline=0.2,
                world=world, yaw_rate=0.04 * (seed % 3))
        elif kind == 2 and os.path.isdir(GT_DIR):
            gt = gts[(seed // 4) % len(gts)]
            seq = synthetic.make_gt_stereo_sequence(
                rng, os.path.join(GT_DIR, gt), n_frames=32, stride=6,
                h=240, w=352, fx=260.0, baseline=0.2,
                n_points=900 + 80 * (seed % 6))
        else:
            world = synthetic.make_world(
                rng, n_points=900, extent=10.0, depth_range=(4.0, 16.0))
            seq = synthetic.make_stereo_sequence(
                rng, n_frames=32, h=240, w=352, fx=260.0, baseline=0.2,
                world=world, speed=(0.4, 0.1, 0.3), yaw_rate=0.1)
        eat(seq, rng, degrade=(seed % 2 == 1))
        print(f"seed {seed}: corpus {n_total}", flush=True)
        seed += 1
    return np.concatenate(pool)


def main():
    corpus = harvest()
    print(f"training on {len(corpus)} descriptors (b=10, d=5: 10^5 words)",
          flush=True)
    vocab = voc.train(corpus, branching=10, depth=5, seed=0)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "orb_slam3_vio_fixes_tpu", "assets",
        "vocab_b10d5.npz")
    voc.save(vocab, out)
    n_used = int((np.asarray(vocab.weights) > 1e-3).sum())
    print(f"saved {out} ({os.path.getsize(out)} bytes, "
          f"{vocab.weights.shape[0]} words, {n_used} with idf weight)")


if __name__ == "__main__":
    main()
