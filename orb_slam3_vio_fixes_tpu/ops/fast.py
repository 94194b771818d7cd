"""FAST-9/16 corner detection as a dense, batched XLA computation.

TPU-native replacement for the reference's per-cell cv::FAST calls
(reference semantics: src/ORBextractor.cc:781-1075 ComputeKeyPointsOctTree —
35-px cells, threshold 20 with per-cell fallback to 7, 3x3 NMS, then quadtree
distribution to a per-level budget).

Re-design for the TPU (SURVEY.md §7 "hard parts" #1): instead of dynamic
per-cell loops + recursive quadtree, we compute a dense FAST score image once
(VPU-friendly shifted adds), apply 3x3 NMS, emulate the two-tier threshold
with a per-cell "has-strong-corner" max-pool, and replace the quadtree with
per-cell best selection + global score top-up — fixed shapes end to end.

The score is OpenCV's arc score: max over the 16 nine-long arcs of the min
margin |ring - center|, i.e. the largest threshold at which the pixel is
still a corner. NMS on this score reproduces cv::FAST(nonmaxSuppression)
ranking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3: 16 (dy, dx) offsets, clockwise from (-3, 0)
# (standard FAST-9/16 geometry).
CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

BORDER = 3  # circle radius — no detection in this border
ARC = 9  # contiguous arc length for FAST-9


def fast_score(img: jax.Array) -> jax.Array:
    """Dense FAST-9/16 score image. img: (H, W) float32 with INTEGER-valued
    intensities (uint8 range). Returns (H, W) score (0 where not a corner at
    any threshold; border pixels are 0).

    On TPU backends this routes to the single-pass Pallas kernel
    (ops/pallas_kernels.fast_score_batch — bit-identical, ~3x faster than
    the XLA lowering, which materializes the ring stack in HBM). The XLA
    path below is the reference implementation and the CPU/test path.

    Ring differences are computed in bfloat16 — exact for integer intensities
    |d| <= 255 (bf16 represents integers up to 256 exactly) and half the HBM
    traffic of float32, which is what bounds this dense pass."""
    if jax.default_backend() == "tpu":
        from orb_slam3_vio_fixes_tpu.ops import pallas_kernels as pk

        return pk.fast_score_batch(img[None])[0]
    return _fast_score_xla(img)


def _fast_score_xla(img: jax.Array) -> jax.Array:
    """Pure-XLA FAST-9/16 score (reference implementation + CPU path)."""
    h, w = img.shape
    # round to integer intensities first (the reference's pyramid is uint8,
    # src/ORBextractor.cc:1170-1195) — makes the bf16 math below exact
    x = jnp.round(img).astype(jnp.bfloat16)
    pad = jnp.pad(x, BORDER, mode="edge")
    center = x
    # ring: (16, H, W) neighbor intensities
    ring = jnp.stack(
        [pad[BORDER + dy : BORDER + dy + h, BORDER + dx : BORDER + dx + w] for dy, dx in CIRCLE]
    )
    d_bright = ring - center[None]          # >t for "brighter" pixels
    d_dark = -d_bright                       # >t for "darker" pixels

    def arc_score(d):
        # For each start i: min over the 9-long window; corner score is the
        # max over starts. Wrap via concatenation (static shapes).
        dw = jnp.concatenate([d, d[: ARC - 1]], axis=0)  # (24, H, W)
        m = dw[:16]
        for j in range(1, ARC):
            m = jnp.minimum(m, dw[j : j + 16])
        return jnp.max(m, axis=0)

    score = jnp.maximum(arc_score(d_bright), arc_score(d_dark))
    score = jnp.maximum(score, 0.0).astype(jnp.float32)
    # Zero the border (reference restricts detection to the inner region).
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inb = (yy >= BORDER) & (yy < h - BORDER) & (xx >= BORDER) & (xx < w - BORDER)
    return jnp.where(inb, score, 0.0)


def nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression mask (True where local max)."""
    p = jnp.pad(score, 1, mode="constant", constant_values=-1.0)
    neigh = jnp.stack(
        [
            p[dy : dy + score.shape[0], dx : dx + score.shape[1]]
            for dy in range(3)
            for dx in range(3)
            if not (dy == 1 and dx == 1)
        ]
    )
    return score >= jnp.max(neigh, axis=0)


def _cell_pool_max(x: jax.Array, cell: int) -> jax.Array:
    """Max over cell x cell tiles, broadcast back to pixel resolution.
    Pads to a multiple of cell."""
    h, w = x.shape
    ph = (-h) % cell
    pw = (-w) % cell
    xp = jnp.pad(x, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    hc, wc = (h + ph) // cell, (w + pw) // cell
    pooled = xp.reshape(hc, cell, wc, cell).max(axis=(1, 3))
    back = jnp.repeat(jnp.repeat(pooled, cell, axis=0), cell, axis=1)
    return back[:h, :w]


@functools.partial(
    jax.jit, static_argnames=("threshold", "threshold_min", "cell", "max_per_cell", "budget")
)
def detect(
    img: jax.Array,
    threshold: float = 20.0,
    threshold_min: float = 7.0,
    cell: int = 35,
    max_per_cell: int = 4,
    budget: int = 256,
):
    """FAST keypoints with two-tier threshold + spatially-uniform selection.

    Returns (idx, score, valid):
      idx:   (budget,) int32 flat indices (y * W + x) into img
      score: (budget,) float32 FAST scores
      valid: (budget,) bool

    Selection = per-cell top-`max_per_cell` (spatial uniformity, the quadtree's
    job in the reference) then global top-`budget` by score among survivors.
    """
    h, w = img.shape
    s = fast_score(img)
    keep = nms3(s)
    strong = s > threshold
    weak = s > threshold_min
    cell_has_strong = _cell_pool_max(jnp.where(strong, 1.0, 0.0), cell) > 0.5
    admissible = keep & jnp.where(cell_has_strong, strong, weak)
    sc = jnp.where(admissible, s, 0.0)

    # Per-cell rank: a point survives if it is among the top-k of its cell.
    # Rank via iterated cell-max suppression (k small, unrolled).
    sc_work = sc
    selected = jnp.zeros_like(sc, dtype=bool)
    for _ in range(max_per_cell):
        cmax = _cell_pool_max(sc_work, cell)
        is_cell_best = (sc_work >= cmax) & (sc_work > 0.0)
        selected = selected | is_cell_best
        sc_work = jnp.where(is_cell_best, 0.0, sc_work)

    final_score = jnp.where(selected, sc, 0.0).reshape(-1)
    score_top, idx = jax.lax.top_k(final_score, budget)
    return idx.astype(jnp.int32), score_top, score_top > 0.0


@functools.lru_cache(maxsize=None)
def _atlas_level_map(layout):
    """Static int32 map of atlas pixel -> pyramid level (-1 between rows)."""
    import numpy as np

    m = np.full((layout.total_h, layout.width), -1, np.int32)
    for lvl, (off, lh, lw) in enumerate(
            zip(layout.offsets, layout.heights, layout.widths)):
        m[off:off + lh, :lw] = lvl
    return m


@functools.lru_cache(maxsize=None)
def _atlas_interior_mask(layout, border: int):
    """Static bool mask of detectable pixels: per-level interior shrunk by
    `border` (reference: ComputeKeyPointsOctTree restricts detection to
    minBorder = EDGE_THRESHOLD-3 = 16 px, src/ORBextractor.cc:788-793 — the
    margin also keeps orientation/BRIEF patch gathers inside the level's own
    atlas rows)."""
    import numpy as np

    m = np.zeros((layout.total_h, layout.width), bool)
    for off, lh, lw in zip(layout.offsets, layout.heights, layout.widths):
        if lh > 2 * border and lw > 2 * border:
            m[off + border : off + lh - border, border : lw - border] = True
    return m


def detect_atlas(
    atlas: jax.Array,
    layout,
    budgets: tuple,
    threshold: float = 20.0,
    threshold_min: float = 7.0,
    cell: int = 35,
    max_per_cell: int = 4,
    border: int = 16,
):
    """FAST keypoints over a pyramid atlas (computes the score itself; see
    detect_atlas_from_score for the batched-score entry)."""
    return detect_atlas_from_score(
        fast_score(atlas), layout, budgets, threshold=threshold,
        threshold_min=threshold_min, cell=cell, max_per_cell=max_per_cell,
        border=border,
    )


def detect_atlas_from_score(
    s: jax.Array,
    layout,
    budgets: tuple,
    threshold: float = 20.0,
    threshold_min: float = 7.0,
    cell: int = 35,
    max_per_cell: int = 4,
    border: int = 16,
):
    """FAST keypoints over a pyramid atlas: ONE dense score/NMS/pool pass for
    all levels, then a per-level top-k to each level's budget.

    Returns (ay, ax, score, valid, octave), each (sum(budgets),), with ay/ax
    in ATLAS coordinates (row offsets included) so patch gathers can read the
    canvas directly.
    """
    s = jnp.where(jnp.asarray(_atlas_interior_mask(layout, border)), s, 0.0)
    keep = nms3(s)
    strong = s > threshold
    weak = s > threshold_min
    cell_has_strong = _cell_pool_max(jnp.where(strong, 1.0, 0.0), cell) > 0.5
    admissible = keep & jnp.where(cell_has_strong, strong, weak)
    sc = jnp.where(admissible, s, 0.0)

    # Per-cell top-`max_per_cell` by iterated cell-argmax over a RESHAPED
    # cell view — dense reduce/where passes only (no scatters, no top_k over
    # the full canvas: a full-slice top_k costs a ~400k-element near-sort
    # per level, and a cumsum+scatter compaction costs a canvas-sized
    # scatter — both measured at 10x the cost of these 4 dense passes).
    # The atlas layout is cell-aligned (align=cell), so no cell straddles a
    # pyramid-level boundary.
    h_all, W = sc.shape
    hc = -(-h_all // cell)
    wc = -(-W // cell)
    xp = jnp.pad(sc, ((0, hc * cell - h_all), (0, wc * cell - W)))
    cells = xp.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(
        hc, wc, cell * cell)
    cy = jnp.arange(hc, dtype=jnp.int32)[:, None]
    cx = jnp.arange(wc, dtype=jnp.int32)[None, :]
    cand_sc_l, cand_ay_l, cand_ax_l = [], [], []
    for _ in range(max_per_cell):
        j = jnp.argmax(cells, axis=-1).astype(jnp.int32)      # (hc, wc)
        v = jnp.take_along_axis(cells, j[..., None], -1)[..., 0]
        cand_sc_l.append(v.reshape(-1))
        cand_ay_l.append((cy * cell + j // cell).reshape(-1))
        cand_ax_l.append((cx * cell + j % cell).reshape(-1))
        hit = jnp.arange(cell * cell, dtype=jnp.int32)[None, None, :] == j[..., None]
        cells = jnp.where(hit, 0.0, cells)
    cand_sc = jnp.concatenate(cand_sc_l)                      # (hc*wc*k,)
    cand_ay = jnp.concatenate(cand_ay_l)
    cand_ax = jnp.concatenate(cand_ax_l)
    lvl_map = jnp.asarray(_atlas_level_map(layout))
    cand_lvl = jnp.where(
        cand_sc > 0.0,
        lvl_map[jnp.clip(cand_ay, 0, h_all - 1),
                jnp.clip(cand_ax, 0, W - 1)], -1)
    ays, axs, scores, octaves = [], [], [], []
    for lvl, budget in enumerate(budgets):
        if budget == 0:
            continue
        sc_l = jnp.where(cand_lvl == lvl, cand_sc, 0.0)
        sc_top, ci = jax.lax.top_k(sc_l, budget)
        ays.append(cand_ay[ci])
        axs.append(cand_ax[ci])
        scores.append(sc_top)
        octaves.append(jnp.full((budget,), lvl, jnp.int32))
    ay = jnp.concatenate(ays)
    ax = jnp.concatenate(axs)
    score = jnp.concatenate(scores)
    octave = jnp.concatenate(octaves)
    return ay, ax, score, score > 0.0, octave
