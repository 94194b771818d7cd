"""Matching kernel tests (Hamming search, projection window, stereo rows)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops import matching


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32)


def corrupt(rng, desc, nbits):
    """Flip nbits random bits per descriptor."""
    out = desc.copy()
    for i in range(desc.shape[0]):
        for _ in range(nbits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


def test_hamming_matrix(rng):
    a = rand_desc(rng, 16)
    b = corrupt(rng, a, 5)
    d = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    # diagonal = at most 5 flips (some may collide)
    assert (np.diag(d) <= 5).all()
    # brute-force check one entry
    exp = bin(int(a[3, 0]) ^ int(b[7, 0])).count("1")
    for w in range(1, 8):
        exp += bin(int(a[3, w]) ^ int(b[7, w])).count("1")
    assert d[3, 7] == exp


def test_match_descriptors_recovers_permutation(rng):
    a = rand_desc(rng, 64)
    perm = rng.permutation(64)
    b = corrupt(rng, a[perm], 8)
    res = matching.match_descriptors(
        jnp.asarray(a), jnp.ones(64, bool), jnp.asarray(b), jnp.ones(64, bool),
        ratio=0.9, max_dist=30,
    )
    idx = np.asarray(res.idx)
    # b[i] = corrupt(a[perm[i]]) so a[j] should match i where perm[i]=j
    inv = np.argsort(perm)
    matched = idx >= 0
    assert matched.sum() > 55
    assert (idx[matched] == inv[matched]).all()


def test_match_respects_validity(rng):
    a = rand_desc(rng, 16)
    b = a.copy()
    valid_t = np.ones(16, bool)
    valid_t[3] = False
    res = matching.match_descriptors(
        jnp.asarray(a), jnp.ones(16, bool), jnp.asarray(b), jnp.asarray(valid_t),
        max_dist=10,
    )
    assert np.asarray(res.idx)[3] != 3


def test_search_by_projection_window(rng):
    m, n = 32, 64
    feat_uv = rng.uniform(0, 600, size=(n, 2)).astype(np.float32)
    feat_desc = rand_desc(rng, n)
    # map points project exactly onto features [0..m)
    proj_uv = feat_uv[:m] + rng.normal(0, 1.0, size=(m, 2)).astype(np.float32)
    proj_desc = corrupt(rng, feat_desc[:m], 6)
    res = matching.search_by_projection(
        jnp.asarray(proj_uv), jnp.ones(m, bool), jnp.asarray(proj_desc),
        jnp.zeros(m, np.int32), jnp.full(m, 8.0, np.float32),
        jnp.asarray(feat_uv), jnp.ones(n, bool), jnp.asarray(feat_desc),
        jnp.zeros(n, np.int32),
    )
    idx = np.asarray(res.idx)
    # most should match their generating feature (unless another feature is
    # within the window and closer in Hamming — unlikely with random descs)
    hit = (idx == np.arange(m)).mean()
    assert hit > 0.85, hit


def test_search_by_projection_radius_gate(rng):
    feat_uv = np.array([[100.0, 100.0]], np.float32)
    feat_desc = rand_desc(rng, 1)
    proj_uv = np.array([[130.0, 100.0]], np.float32)  # 30 px away
    res = matching.search_by_projection(
        jnp.asarray(proj_uv), jnp.ones(1, bool), jnp.asarray(feat_desc),
        jnp.zeros(1, np.int32), jnp.full(1, 8.0, np.float32),
        jnp.asarray(feat_uv), jnp.ones(1, bool), jnp.asarray(feat_desc),
        jnp.zeros(1, np.int32),
    )
    assert np.asarray(res.idx)[0] == -1


def test_projection_collision_resolution(rng):
    """Two map points projecting to the same keypoint: best distance wins."""
    feat_uv = np.array([[50.0, 50.0]], np.float32)
    feat_desc = rand_desc(rng, 1)
    proj_uv = np.tile(feat_uv, (2, 1))
    proj_desc = np.stack([corrupt(rng, feat_desc, 20)[0], feat_desc[0]])
    res = matching.search_by_projection(
        jnp.asarray(proj_uv), jnp.ones(2, bool), jnp.asarray(proj_desc),
        jnp.zeros(2, np.int32), jnp.full(2, 8.0, np.float32),
        jnp.asarray(feat_uv), jnp.ones(1, bool), jnp.asarray(feat_desc),
        jnp.zeros(1, np.int32),
    )
    idx = np.asarray(res.idx)
    assert idx[1] == 0 and idx[0] == -1


def test_stereo_row_match(rng):
    n = 48
    uv_l = np.stack(
        [rng.uniform(100, 600, n), rng.uniform(0, 400, n)], axis=1
    ).astype(np.float32)
    disp = rng.uniform(5, 60, n).astype(np.float32)
    uv_r = uv_l.copy()
    uv_r[:, 0] -= disp
    desc = rand_desc(rng, n)
    sf = jnp.asarray([1.2**i for i in range(8)], jnp.float32)
    ur, d, dist = matching.stereo_row_match(
        jnp.asarray(uv_l), jnp.ones(n, bool), jnp.asarray(desc), jnp.zeros(n, np.int32),
        jnp.asarray(uv_r), jnp.ones(n, bool), jnp.asarray(corrupt(rng, desc, 4)),
        jnp.zeros(n, np.int32),
        sf, jnp.float32(0.0), jnp.float32(100.0),
    )
    d = np.asarray(d)
    ok = d > 0
    assert ok.sum() > 40
    np.testing.assert_allclose(d[ok], disp[ok], atol=1e-3)


def test_rotation_consistency(rng):
    n = 100
    angle_q = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    angle_t = (angle_q - 0.5) % (2 * np.pi)  # consistent rotation of 0.5 rad
    angle_t[:10] = rng.uniform(0, 2 * np.pi, 10)  # 10 outliers
    keep = matching.rotation_consistency(
        jnp.asarray(angle_q), jnp.asarray(angle_t.astype(np.float32)),
        jnp.arange(n, dtype=np.int32), jnp.ones(n, bool),
    )
    keep = np.asarray(keep)
    assert keep[10:].mean() > 0.95
    assert keep[:10].mean() < 0.5
