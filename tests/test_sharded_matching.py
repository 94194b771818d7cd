"""Sharded descriptor matching: row-sharded database, replicated queries,
psum-style winner reduction — parity with the single-device matcher on the
virtual 8-device mesh (SURVEY.md §7 step 9)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from orb_slam3_vio_fixes_tpu.ops import matching
from orb_slam3_vio_fixes_tpu.parallel import sharded_matching as sm


def test_sharded_match_parity_8_devices():
    rng = np.random.default_rng(0)
    Q, D = 64, 1000
    q = rng.integers(0, 2**32, (Q, 8), dtype=np.uint32)
    db = rng.integers(0, 2**32, (D, 8), dtype=np.uint32)
    # plant exact matches for half the queries at known rows
    rows = rng.choice(D, Q // 2, replace=False)
    db[rows] = q[: Q // 2]
    qv = np.ones(Q, bool)
    qv[-3:] = False
    dv = np.ones(D, bool)
    dv[5] = False

    n_dev = min(8, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("db",))
    db_p, dv_p = sm.pad_database(db, dv, n_dev)
    idx, best, second = sm.sharded_match(
        jnp.asarray(q), jnp.asarray(qv), db_p, dv_p, mesh, max_dist=300)
    idx = np.asarray(idx)
    best = np.asarray(best)
    second = np.asarray(second)

    # reference: single-device full matrix
    dist = np.array(matching.hamming_matrix(jnp.asarray(q), jnp.asarray(db)))
    dist[:, ~dv] = 1 << 20
    ref_idx = dist.argmin(1)
    ref_best = dist.min(1)
    d2 = dist.copy()
    d2[np.arange(Q), ref_idx] = 1 << 20
    ref_second = d2.min(1)

    live = qv
    np.testing.assert_array_equal(best[live], ref_best[live])
    np.testing.assert_array_equal(second[live], ref_second[live])
    # planted exact matches resolve to the planted rows
    np.testing.assert_array_equal(idx[: Q // 2], rows)
    assert (idx[~qv] == -1).all()
    # ties may resolve to a different row with the same distance
    same = dist[np.arange(Q), np.clip(idx, 0, D - 1)] == ref_best
    assert same[live].all()
