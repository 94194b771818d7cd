"""Diagnose the loop-seam match collapse: descriptor stability between the
first visit and the revisit of the same world region, independent of the
tracker. Compares (a) all-features vs all-features matching, (b) the
match-rate at several Hamming thresholds, (c) ratio-test survival."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.frontend.frame import build_stereo_frame
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import matching, orb
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

N_FRAMES = 72
rng = np.random.default_rng(5)
seq = synthetic.make_loop_stereo_sequence(
    rng, n_frames=N_FRAMES, h=240, w=352, fx=260.0, baseline=0.2,
    radius=3.0, wall_radius=9.0, n_points=1400)
noise = rng.normal(0, 2.0, seq.imgs_l.shape).astype(np.float32)
noise_r = rng.normal(0, 2.0, seq.imgs_r.shape).astype(np.float32)
seq = seq._replace(imgs_l=seq.imgs_l + noise, imgs_r=seq.imgs_r + noise_r)

ocfg = orb.ORBConfig(n_features=384, n_levels=4)
cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
bf = jnp.float32(seq.K[0, 0] * seq.baseline)


def frame(i):
    return build_stereo_frame(jnp.asarray(seq.imgs_l[i]),
                              jnp.asarray(seq.imgs_r[i]),
                              jnp.float32(0.0), cam, bf, ocfg)


# frame 0 and the final frames see the same region (full circle, 72 frames)
for i, j in [(0, 68), (0, 70), (2, 70), (4, 71), (0, 36)]:
    fi, fj = frame(i), frame(j)
    vi = np.asarray(fi.valid)
    vj = np.asarray(fj.valid)
    print(f"frames {i}/{j}: n_feat {vi.sum()}/{vj.sum()}")
    d = np.asarray(matching.hamming_matrix(fi.desc, fj.desc))
    d = np.where(vi[:, None] & vj[None, :], d, 1 << 20)
    best = d.min(axis=1)
    bi = best[vi]
    for th in (30, 50, 64, 80, 100):
        print(f"  best<=th{th}: {(bi <= th).sum()}", end="")
    print()
    # ratio test survival, mutual
    res = matching.match_descriptors(fi.desc, fi.valid, fj.desc, fj.valid,
                                     ratio=0.75, max_dist=matching.TH_LOW,
                                     mutual=True)
    res90 = matching.match_descriptors(fi.desc, fi.valid, fj.desc, fj.valid,
                                       ratio=0.9, max_dist=matching.TH_HIGH,
                                       mutual=True)
    print(f"  matcher(0.75,TH_LOW,mutual): {int(res.n)}   "
          f"matcher(0.9,TH_HIGH,mutual): {int(res90.n)}")
