#!/usr/bin/env python
"""Train a BoW vocabulary from dataset images.

The reference ships a pretrained 1M-word DBoW2 vocabulary
(Vocabulary/ORBvoc.txt, loaded at src/System.cc:117); this framework trains
its own hierarchical k-medians vocabulary over ORB descriptors extracted from
a directory of images and saves it as .npz (slam_map/vocabulary.py format),
consumable by every example app via --vocab.

Usage:
    python scripts/train_vocabulary.py IMG_DIR OUT.npz \
        [--branching 10] [--depth 4] [--max-images 300] [--features 1000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def load_gray(path):
    try:
        import imageio.v3 as iio

        img = iio.imread(path)
    except ImportError:
        from PIL import Image

        img = np.asarray(Image.open(path))
    if img.ndim == 3:
        img = img @ np.array([0.299, 0.587, 0.114], np.float32)
    return img.astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("img_dir")
    ap.add_argument("out")
    ap.add_argument("--branching", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--max-images", type=int, default=300)
    ap.add_argument("--features", type=int, default=1000)
    args = ap.parse_args()

    from orb_slam3_vio_fixes_tpu.ops import orb
    from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc

    exts = (".png", ".jpg", ".jpeg", ".pgm", ".bmp")
    paths = sorted(
        os.path.join(args.img_dir, f)
        for f in os.listdir(args.img_dir)
        if f.lower().endswith(exts)
    )
    if not paths:
        sys.exit(f"no images found in {args.img_dir}")
    step = max(1, len(paths) // args.max_images)
    paths = paths[::step][: args.max_images]

    cfg = orb.ORBConfig(n_features=args.features)
    all_desc = []
    for i, p in enumerate(paths):
        feats = orb.extract(load_gray(p), cfg)
        d = np.asarray(feats.desc)[np.asarray(feats.valid)]
        all_desc.append(d)
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{len(paths)} images, "
                  f"{sum(len(x) for x in all_desc)} descriptors")
    descs = np.concatenate(all_desc)
    print(f"training {args.branching}^{args.depth} vocabulary "
          f"on {len(descs)} descriptors ...")
    v = voc.train(descs, branching=args.branching, depth=args.depth)
    voc.save(v, args.out)
    print(f"saved {v.n_words}-word vocabulary to {args.out}")


if __name__ == "__main__":
    main()
