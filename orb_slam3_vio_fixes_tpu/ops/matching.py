"""Binary-descriptor matching: batched XOR+popcount Hamming search.

TPU-native replacement for the reference's ORBmatcher
(reference semantics: src/ORBmatcher.cc — thresholds TH_LOW=50 / TH_HIGH=100
(:35-37), best/second ratio tests, 30-bin rotation-consistency histograms
(HISTO_LENGTH, CheckOrientation pattern), grid-windowed projection search
(SearchByProjection :43-213, radius-by-viewing-cos :215-221), stereo row-band
matching (src/Frame.cc:811-981)).

Re-design: every matcher is a dense masked distance-matrix computation —
(N_query, N_train) Hamming via XOR+popcount on uint32 words, combined with
geometric/validity masks, then per-row argmin + second-best for the ratio
test. No grids, no per-cell candidate lists: the mask *is* the grid. This is
the shape XLA/the VPU wants; a Pallas tiling lands in ops/pallas_kernels.py
for the hot call sites.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

TH_LOW = 50
TH_HIGH = 100
HISTO_BINS = 30
INVALID = jnp.int32(-1)
BIG = jnp.int32(1 << 20)


def hamming_matrix(desc_q: jax.Array, desc_t: jax.Array) -> jax.Array:
    """(Nq, 8) x (Nt, 8) uint32 -> (Nq, Nt) int32 Hamming distances."""
    x = desc_q[:, None, :] ^ desc_t[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def masked_best2(dist: jax.Array, mask: jax.Array):
    """Per-row best and second-best over masked columns.

    dist: (Q, T) int32; mask: (Q, T) bool (True = admissible).
    Returns (best_idx (Q,), best (Q,), second (Q,)); best == BIG where no
    admissible column.
    """
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second


def mutual_filter(best_idx_q: jax.Array, best_q: jax.Array, dist: jax.Array, mask: jax.Array):
    """Keep q->t matches that are also t's best q (cross-check)."""
    d = jnp.where(mask, dist, BIG)
    best_idx_t = jnp.argmin(d, axis=0).astype(jnp.int32)  # (T,)
    back = best_idx_t[best_idx_q]  # (Q,)
    return back == jnp.arange(best_idx_q.shape[0], dtype=jnp.int32)


def rotation_consistency(
    angle_q: jax.Array, angle_t: jax.Array, match_t: jax.Array, valid: jax.Array
) -> jax.Array:
    """Keep only matches whose angle difference falls in the 3 most-populated
    of 30 bins (reference semantics: ORBmatcher's rotation histogram with
    mbCheckOrientation)."""
    matched_angle_t = angle_t[jnp.clip(match_t, 0, angle_t.shape[0] - 1)]
    rot = (angle_q - matched_angle_t) % (2.0 * jnp.pi)
    bins = jnp.clip((rot * (HISTO_BINS / (2.0 * jnp.pi))).astype(jnp.int32), 0, HISTO_BINS - 1)
    counts = jnp.zeros(HISTO_BINS, jnp.int32).at[bins].add(valid.astype(jnp.int32))
    top3 = jax.lax.top_k(counts, 3)[1]
    in_top = (bins[:, None] == top3[None, :]).any(axis=1)
    return valid & in_top


class MatchResult(NamedTuple):
    """idx: (Q,) int32 index into train set, -1 if unmatched; dist: (Q,)."""

    idx: jax.Array
    dist: jax.Array

    @property
    def n(self):
        return jnp.sum((self.idx >= 0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("check_rotation", "mutual", "max_dist"))
def match_descriptors(
    desc_q,
    valid_q,
    desc_t,
    valid_t,
    angle_q=None,
    angle_t=None,
    ratio: float = 0.9,
    max_dist: int = TH_LOW,
    check_rotation: bool = False,
    mutual: bool = True,
) -> MatchResult:
    """Generic nearest-neighbour matcher with ratio/mutual/rotation gates
    (the workhorse behind SearchForInitialization / fisheye BF-matching)."""
    dist = hamming_matrix(desc_q, desc_t)
    mask = valid_q[:, None] & valid_t[None, :]
    best_idx, best, second = masked_best2(dist, mask)
    ok = best <= max_dist
    ok &= best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    if mutual:
        ok &= mutual_filter(best_idx, best, dist, mask)
    if check_rotation:
        ok = rotation_consistency(angle_q, angle_t, best_idx, ok)
    return MatchResult(jnp.where(ok, best_idx, INVALID), best)


@functools.partial(
    jax.jit, static_argnames=("max_dist", "ratio", "apply_ratio_same_octave",
                              "oct_window")
)
def search_by_projection(
    proj_uv,        # (M, 2) predicted pixel position of each map point
    proj_valid,     # (M,) bool — in frustum, etc.
    proj_desc,      # (M, 8) uint32 — map-point representative descriptors
    proj_octave,    # (M,) int32 — predicted octave
    radius,         # (M,) float32 — per-point search radius in px (level-0)
    feat_uv,        # (N, 2) frame keypoint positions
    feat_valid,     # (N,) bool
    feat_desc,      # (N, 8) uint32
    feat_octave,    # (N,) int32
    feat_taken=None,  # (N,) bool — keypoints already bound to a map point
    proj_ur=None,   # (M,) predicted right-cam u for stereo gate (or None)
    feat_ur=None,   # (N,) observed right u (<0 if mono keypoint)
    max_dist: int = TH_HIGH,
    ratio: float = 0.0,  # 0 disables; reference applies it same-octave only
    apply_ratio_same_octave: bool = True,
    oct_window: int = 1,  # octave tolerance; >= n_levels disables the gate
                          # (loop verification: octave prediction under big
                          # viewpoint change is unreliable)
) -> MatchResult:
    """Windowed projection matching (reference semantics:
    ORBmatcher::SearchByProjection src/ORBmatcher.cc:43-213 — octave window
    [pred-1, pred], radius scaled by octave, stereo right-u gate, ratio test
    applied only when best/second share an octave)."""
    dist = hamming_matrix(proj_desc, feat_desc)  # (M, N)
    du = proj_uv[:, None, 0] - feat_uv[None, :, 0]
    dv = proj_uv[:, None, 1] - feat_uv[None, :, 1]
    within = (du * du + dv * dv) <= (radius[:, None] ** 2)
    oct_ok = (feat_octave[None, :] >= proj_octave[:, None] - oct_window) & (
        feat_octave[None, :] <= proj_octave[:, None] + oct_window
    )
    mask = within & oct_ok & proj_valid[:, None] & feat_valid[None, :]
    if feat_taken is not None:
        mask &= ~feat_taken[None, :]
    if proj_ur is not None and feat_ur is not None:
        has_r = feat_ur[None, :] >= 0.0
        er = jnp.abs(proj_ur[:, None] - feat_ur[None, :])
        mask &= jnp.where(has_r, er <= radius[:, None], True)

    best_idx, best, second = masked_best2(dist, mask)
    ok = best <= max_dist
    if ratio > 0.0:
        best_oct = feat_octave[jnp.clip(best_idx, 0, feat_octave.shape[0] - 1)]
        d2 = jnp.where(mask, dist, BIG).at[jnp.arange(dist.shape[0]), best_idx].set(BIG)
        second_idx = jnp.argmin(d2, axis=1)
        second_oct = feat_octave[second_idx]
        ratio_ok = best.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
        if apply_ratio_same_octave:
            ratio_ok = jnp.where(best_oct == second_oct, ratio_ok, True)
        ok &= ratio_ok
    # Resolve collisions: several map points may pick the same keypoint —
    # keep the lowest-distance claimant (the reference implicitly keeps the
    # last writer; lowest distance is strictly better).
    claim = jnp.where(ok, best_idx, INVALID)
    order_key = best * jnp.int32(1 << 12) + jnp.arange(best.shape[0], dtype=jnp.int32)
    winner = jnp.full((feat_uv.shape[0],), jnp.iinfo(jnp.int32).max, jnp.int32)
    winner = winner.at[jnp.clip(claim, 0, feat_uv.shape[0] - 1)].min(
        jnp.where(ok, order_key, jnp.iinfo(jnp.int32).max)
    )
    mine = winner[jnp.clip(claim, 0, feat_uv.shape[0] - 1)] == order_key
    ok &= mine
    return MatchResult(jnp.where(ok, best_idx, INVALID), best)


@jax.jit
def stereo_row_match(
    uv_l, valid_l, desc_l, octave_l,
    uv_r, valid_r, desc_r, octave_r,
    scale_factors,             # (n_levels,) float32
    min_disp: jax.Array, max_disp: jax.Array,
):
    """Rectified stereo matching by row-banded Hamming search
    (reference semantics: Frame::ComputeStereoMatches src/Frame.cc:811-981 —
    row band = 2 * scale of the right keypoint's octave, disparity in
    [min_disp, max_disp], octave within ±1, TH_HIGH gate, median-distance
    outlier sweep). Subpixel SAD refinement happens in the frame layer where
    pyramid images are available.

    Returns (u_right (Nl,), disp (Nl,), dist (Nl,)) with u_right = -1 where
    unmatched.
    """
    dist = hamming_matrix(desc_l, desc_r)  # (Nl, Nr)
    band = 2.0 * scale_factors[jnp.clip(octave_r, 0, scale_factors.shape[0] - 1)]
    row_ok = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1]) <= band[None, :]
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    disp_ok = (disp >= min_disp) & (disp <= max_disp)
    oct_ok = (octave_r[None, :] >= octave_l[:, None] - 1) & (
        octave_r[None, :] <= octave_l[:, None] + 1
    )
    mask = row_ok & disp_ok & oct_ok & valid_l[:, None] & valid_r[None, :]
    best_idx, best, _ = masked_best2(dist, mask)
    ok = best <= TH_HIGH
    # left-right mutual consistency: the right keypoint must also prefer this
    # left keypoint (kills repeated-texture aliasing along the row band)
    ok &= mutual_filter(best_idx, best, dist, mask)
    ur = uv_r[best_idx, 0]
    d = uv_l[:, 0] - ur
    d = jnp.where(d < 0.01, 0.01, d)  # clamp tiny disparity like the reference
    # Median-distance outlier sweep (reference: 1.5 * 1.4 * median).
    med = jnp.nanmedian(jnp.where(ok, best.astype(jnp.float32), jnp.nan))
    med = jnp.nan_to_num(med, nan=jnp.float32(TH_HIGH))
    ok &= best.astype(jnp.float32) <= 2.1 * med
    return (
        jnp.where(ok, ur, -1.0),
        jnp.where(ok, d, -1.0),
        best,
    )
