"""Distributed descriptor matching: database rows sharded over a mesh.

The scaling story for place recognition and relocalization at fleet/map
scale (SURVEY.md §2.3 / §7 step 9): a keyframe database of D descriptors
(or BoW histograms) is sharded row-wise across devices; a query batch is
replicated; each shard computes Hamming distances (XOR + popcount laid out
as (Q, 8) x (D_loc, 8) uint32 blocks) against ITS rows; the global argmin /
top-k is one tiny psum-style reduction of per-shard winners. Communication
per query: O(Q) scalars — independent of database size.

The reference has no distributed backend at all (its DBoW2 inverted file is
a single-threaded pointer structure, src/KeyFrameDatabase.cc); this module
is the designed-fresh multi-chip equivalent.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from orb_slam3_vio_fixes_tpu.ops import matching


def pad_database(desc: np.ndarray, valid: np.ndarray, n_shards: int):
    """Pad the database rows to a multiple of n_shards (invalid padding)."""
    D = desc.shape[0]
    Dp = ((D + n_shards - 1) // n_shards) * n_shards
    if Dp >= 1 << 22:
        raise ValueError(
            f"database rows ({Dp}) exceed the 22-bit index budget of the "
            "packed (dist<<22 | idx) winner reduction — shard the database "
            "into <4M-row blocks")
    if Dp != D:
        desc = np.concatenate(
            [desc, np.zeros((Dp - D,) + desc.shape[1:], desc.dtype)])
        valid = np.concatenate([valid, np.zeros(Dp - D, bool)])
    return jnp.asarray(desc), jnp.asarray(valid)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "max_dist"))
def sharded_match(
    query_desc,     # (Q, 8) uint32 — replicated
    query_valid,    # (Q,) bool
    db_desc,        # (Dp, 8) uint32 — row-sharded over `axis`
    db_valid,       # (Dp,) bool
    mesh: Mesh,
    axis: str = "db",
    max_dist: int = 64,
):
    """For each query: global best database row + distance + the
    second-best distance (for ratio tests), computed shard-locally with one
    cross-device min-reduction. Returns (idx (Q,), best (Q,), second (Q,));
    idx = -1 where no row passes max_dist."""
    from jax import shard_map

    n_dev = mesh.shape[axis]
    # trace-time guard: the packed (dist<<22 | global_idx) reduction below
    # saturates int32 exactly at the 511 sentinel; one more index bit would
    # silently corrupt winners (advisor round-4 finding)
    if db_desc.shape[0] >= 1 << 22:
        raise ValueError(
            f"db_desc rows ({db_desc.shape[0]}) exceed the 22-bit packed-"
            "index budget; split the database into <4M-row blocks")
    block = db_desc.shape[0] // n_dev

    def body(q, qv, d, dv):
        shard = jax.lax.axis_index(axis)
        dist = matching.hamming_matrix(q, d)          # (Q, D_loc)
        mask = qv[:, None] & dv[None, :]
        # distances are <= 256 bits; 511 is the "invalid" sentinel (it can
        # never pass max_dist) and keeps the packed (dist, idx) int32-safe
        # with 22 idx bits — int64 is unavailable under JAX's default x32
        big = jnp.int32(511)
        dist = jnp.where(mask, dist, big)
        # local best2
        best_loc = jnp.argmin(dist, axis=1)
        bd = jnp.take_along_axis(dist, best_loc[:, None], axis=1)[:, 0]
        d2 = dist.at[jnp.arange(q.shape[0]), best_loc].set(big)
        sd = jnp.min(d2, axis=1)
        gidx = best_loc.astype(jnp.int32) + shard * block
        # global reduction: pack (dist, shard-global idx) so the argmin
        # travels with the min — one all-reduce of Q packed scalars, then
        # a second for the global second-best
        packed = bd * jnp.int32(1 << 22) + gidx
        packed_min = jax.lax.pmin(packed, axis)
        g_best = packed_min // (1 << 22)
        g_idx = packed_min % (1 << 22)
        # second best: min over (local second, local bests that LOST)
        lost = packed != packed_min
        cand2 = jnp.where(lost, bd, sd)
        g_second = jax.lax.pmin(cand2, axis)
        ok = (g_best <= max_dist) & qv
        return jnp.where(ok, g_idx, -1), g_best, g_second

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(query_desc, query_valid, db_desc, db_valid)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "max_dist",
                                             "ratio"))
def sharded_global_bind(
    frame_desc,     # (N, 8) uint32 — the current frame's descriptors
    frame_valid,    # (N,) bool
    lm_desc,        # (L, 8) uint32 — the MAP's landmark descriptor table,
    lm_valid,       # (L,) bool      row-sharded over `axis` (L % n_dev == 0)
    mesh: Mesh,
    axis: str = "db",
    max_dist: int = matching.TH_LOW,
    ratio: float = 0.75,
):
    """Tracker-side sharded matching: bind every frame feature to its
    globally best map landmark by descriptor alone — the landmark table is
    row-sharded over the mesh, each shard computes (N, L/d) Hamming blocks,
    winners combine in one packed min-reduction (O(N) scalars over ICI).

    This is the relocalization global search at map scale: the single-chip
    reference walks the BoW inverted file per candidate keyframe
    (src/Tracking.cc:3609-3777); with the map sharded, matching the frame
    against EVERY landmark costs L/d work per chip and needs no candidate
    retrieval at all. Returns (N,) landmark ids (-1 unmatched); Lowe ratio
    and absolute-distance gates applied."""
    idx, best, second = sharded_match(
        frame_desc, frame_valid, lm_desc, lm_valid, mesh, axis=axis,
        max_dist=max_dist)
    # strict Lowe ratio: a 0-distance tie (best == second == 0) must REJECT —
    # two identical landmarks cannot be disambiguated by appearance
    ok = (idx >= 0) & (best.astype(jnp.float32)
                       < ratio * second.astype(jnp.float32))
    return jnp.where(ok, idx, -1)
