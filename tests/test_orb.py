"""ORB front-end tests: FAST parity vs OpenCV, descriptor properties."""

import numpy as np
import jax.numpy as jnp
import cv2

from orb_slam3_vio_fixes_tpu.ops import fast as fast_ops
from orb_slam3_vio_fixes_tpu.ops import orb as orb_ops


def synth_image(rng, h=240, w=320, n_blobs=120):
    """Random blocky texture that produces stable FAST corners."""
    img = rng.uniform(40, 80, size=(h, w)).astype(np.float32)
    for _ in range(n_blobs):
        y = rng.integers(10, h - 20)
        x = rng.integers(10, w - 20)
        s = rng.integers(4, 14)
        img[y : y + s, x : x + s] = rng.uniform(100, 250)
    return img


def test_fast_score_matches_opencv_detection(rng):
    img = synth_image(rng)
    score = np.asarray(fast_ops.fast_score(jnp.asarray(img)))
    # OpenCV detection at threshold 20 without NMS = all pixels score>20
    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=False)
    kps = det.detect(img.astype(np.uint8))
    cv_mask = np.zeros_like(score, dtype=bool)
    for kp in kps:
        cv_mask[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True
    ours = score > 20.0
    # Interior only (border semantics differ slightly)
    sl = np.s_[4:-4, 4:-4]
    inter = (ours & cv_mask)[sl].sum()
    union = (ours | cv_mask)[sl].sum()
    assert union > 50
    assert inter / union > 0.95, f"FAST IoU vs OpenCV too low: {inter/union:.3f}"


def test_fast_detect_budget_and_uniformity(rng):
    img = synth_image(rng)
    idx, score, valid = fast_ops.detect(jnp.asarray(img), budget=200)
    idx, score, valid = map(np.asarray, (idx, score, valid))
    n = valid.sum()
    assert 50 < n <= 200
    # scores sorted descending among valid
    assert np.all(np.diff(score[valid]) <= 1e-6)
    # no duplicate pixels
    assert len(np.unique(idx[valid])) == n


def test_extract_shapes_and_levels(rng):
    img = synth_image(rng, h=480, w=640)
    cfg = orb_ops.ORBConfig(n_features=500, n_levels=4)
    feats = orb_ops.extract(jnp.asarray(img), cfg)
    assert feats.uv.shape == (500, 2)
    assert feats.desc.shape == (500, 8)
    assert feats.desc.dtype == jnp.uint32
    n = int(feats.n)
    assert n > 100
    octs = np.asarray(feats.octave)[np.asarray(feats.valid)]
    assert octs.min() == 0 and octs.max() >= 1  # multiple levels populated
    uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
    assert uv[:, 0].max() < 640 and uv[:, 1].max() < 480


def test_descriptor_rotation_invariance(rng):
    """Rotating the image should keep descriptors of the same corners close
    in Hamming distance (steered BRIEF)."""
    img = synth_image(rng, h=320, w=320)
    angle_deg = 25.0
    M = cv2.getRotationMatrix2D((160, 160), angle_deg, 1.0)
    rot = cv2.warpAffine(img, M, (320, 320), flags=cv2.INTER_LINEAR, borderValue=60)
    cfg = orb_ops.ORBConfig(n_features=300, n_levels=1)
    f0 = orb_ops.extract(jnp.asarray(img), cfg)
    f1 = orb_ops.extract(jnp.asarray(rot), cfg)

    uv0 = np.asarray(f0.uv)[np.asarray(f0.valid)]
    uv1 = np.asarray(f1.uv)[np.asarray(f1.valid)]
    d0 = np.asarray(f0.desc)[np.asarray(f0.valid)]
    d1 = np.asarray(f1.desc)[np.asarray(f1.valid)]
    # ground-truth correspondence by rotating uv0
    R = M[:, :2]
    t = M[:, 2]
    uv0r = uv0 @ R.T + t
    # match pairs within 2 px
    dists = np.linalg.norm(uv0r[:, None] - uv1[None], axis=-1)
    i, j = np.nonzero(dists < 2.0)
    assert len(i) > 30, "too few geometric correspondences"

    def hamming(a, b):
        return np.unpackbits(
            (a ^ b).view(np.uint8), axis=-1
        ).sum(-1)

    hm = hamming(d0[i], d1[j])
    # mismatched pairs via a random permutation (roll-by-1 would pair
    # spatially adjacent keypoints, whose patches genuinely overlap)
    rand = hamming(d0[i], d1[rng.permutation(j)])
    assert np.median(hm) < 60, f"median Hamming {np.median(hm)} too high"
    assert np.median(rand) > 85, "random-pair Hamming unexpectedly low"


def test_extract_pair_batches(rng):
    img_l = synth_image(rng, h=240, w=320)
    img_r = np.roll(img_l, -8, axis=1)  # crude disparity shift
    cfg = orb_ops.ORBConfig(n_features=200, n_levels=2)
    fl, fr = orb_ops.extract_pair(jnp.asarray(img_l), jnp.asarray(img_r), cfg)
    assert int(fl.n) > 50 and int(fr.n) > 50
