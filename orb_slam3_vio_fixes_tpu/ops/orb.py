"""ORB feature extraction: oriented multi-scale FAST + steered BRIEF.

TPU-native re-design of the reference's ORBextractor
(reference semantics: src/ORBextractor.cc — 8-level pyramid scale 1.2
(:410-469), intensity-centroid orientation (:471-476, IC_Angle :77-105),
GaussianBlur(7,7,2) before description (:1133), 256-bit steered BRIEF
(computeOrbDescriptor :107-148), per-level feature budgets geometric in
1/scale (:428-443), lapping-area stereo reorder for fisheye (:1153-1163)).

Differences by design (not a port):
  * the BRIEF sampling pattern is generated from a fixed-seed Gaussian
    scheme (BRIEF G-II: x1 ~ N(0, (S/5)^2), x2 ~ N(x1, (S/10)^2)) instead of
    copying OpenCV's learned table — descriptors are self-consistent across
    this framework (matcher, vocabulary, map serialization all use them);
  * keypoint distribution is per-cell top-k + score top-up (ops/fast.py)
    instead of a recursive quadtree;
  * all levels are processed in one jitted call with static shapes; stereo
    pairs batch through the same kernels with a leading axis.

Output layout: fixed-capacity arrays with a validity mask (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.ops import fast as fast_ops
from orb_slam3_vio_fixes_tpu.ops import image as image_ops

HALF_PATCH = 15          # orientation patch radius (31x31 patch)
# Gather radius: the rotated BRIEF offsets reach 15*sqrt2 ~ 21.2 in the worst
# corner case, but the Gaussian pair scheme (sigma = S/5) puts ~96% of sample
# radii under 16; offsets beyond the patch edge CLAMP to it. 16 instead of 22
# shrinks the dominant per-keypoint patch gather (45x45 -> 33x33 = 46% fewer
# elements) for a ~4% clamped-sample rate — measured no change on the
# descriptor-matching / noise-robustness tests.
PATCH_R = 16
PATCH = 2 * PATCH_R + 1  # 33


class ORBConfig(NamedTuple):
    n_features: int = 1200
    n_levels: int = 8
    scale: float = 1.2
    fast_threshold: float = 20.0
    fast_threshold_min: float = 7.0
    cell: int = 35
    max_per_cell: int = 4


class Features(NamedTuple):
    """Fixed-capacity feature set for one image (capacity N = cfg.n_features).

    uv:       (N, 2) float32 — level-0 pixel coords (x, y)
    response: (N,)  float32 — FAST score
    octave:   (N,)  int32   — pyramid level
    angle:    (N,)  float32 — orientation, radians
    desc:     (N, 8) uint32 — 256-bit descriptors
    valid:    (N,)  bool
    """

    uv: jax.Array
    response: jax.Array
    octave: jax.Array
    angle: jax.Array
    desc: jax.Array
    valid: jax.Array

    @property
    def n(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


def features_per_level(cfg: ORBConfig) -> list[int]:
    """Geometric per-level budgets summing to n_features (reference semantics:
    src/ORBextractor.cc:428-443)."""
    inv = 1.0 / cfg.scale
    n0 = cfg.n_features * (1 - inv) / (1 - inv**cfg.n_levels)
    per = [int(round(n0 * inv**i)) for i in range(cfg.n_levels)]
    per[-1] = max(cfg.n_features - sum(per[:-1]), 0)
    return per


@functools.lru_cache(maxsize=None)
def brief_pattern(seed: int = 1234, n_bits: int = 256, patch: int = 31) -> np.ndarray:
    """(n_bits, 4) int32 (x1, y1, x2, y2) offsets in [-15, 15].

    Deterministic Gaussian pair scheme (BRIEF G-II from the original BRIEF
    paper): first point ~ N(0, (S/5)^2), second ~ N(first, (S/10)^2).
    """
    rng = np.random.default_rng(seed)
    s = patch
    half = patch // 2
    p1 = np.clip(np.round(rng.normal(0.0, s / 5.0, size=(n_bits, 2))), -half, half)
    p2 = np.clip(np.round(p1 + rng.normal(0.0, s / 10.0, size=(n_bits, 2))), -half, half)
    # Avoid degenerate identical pairs: nudge x2 by +1 (wrapped) where equal.
    same = np.all(p1 == p2, axis=1)
    p2[same, 0] = np.where(p2[same, 0] < half, p2[same, 0] + 1, p2[same, 0] - 1)
    return np.concatenate([p1, p2], axis=1).astype(np.int32)


# Circular-patch row extents for orientation (u_max in the reference, computed
# from the circle equation rather than copied).
@functools.lru_cache(maxsize=None)
def _circular_mask(radius: int = HALF_PATCH) -> np.ndarray:
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.float32)


def _gather_patches(img: jax.Array, yx: jax.Array) -> jax.Array:
    """Gather (K, PATCH, PATCH) patches centered at integer yx (K, 2) from a
    PATCH_R-padded copy of img."""
    padded = jnp.pad(img, PATCH_R, mode="edge")

    def one(c):
        return jax.lax.dynamic_slice(padded, (c[0], c[1]), (PATCH, PATCH))

    return jax.vmap(one)(yx)  # top-left corner = center in padded coords


@functools.lru_cache(maxsize=None)
def _moment_matrix() -> np.ndarray:
    """(PATCH*PATCH, 2) coordinate-moment weights over the central 31x31
    circular region of a PATCH x PATCH patch: column 0 = dy (for m01),
    column 1 = dx (for m10)."""
    mask = np.zeros((PATCH, PATCH), np.float32)
    c0 = PATCH_R - HALF_PATCH
    mask[c0 : c0 + 2 * HALF_PATCH + 1, c0 : c0 + 2 * HALF_PATCH + 1] = _circular_mask()
    coords = np.arange(-PATCH_R, PATCH_R + 1, dtype=np.float32)
    ky = (mask * coords[:, None]).reshape(-1)
    kx = (mask * coords[None, :]).reshape(-1)
    return np.stack([ky, kx], axis=1)


def _orientation(patches: jax.Array) -> jax.Array:
    """Intensity-centroid angle from the central 31x31 circular region of
    (K, PATCH, PATCH) patches as one (K, P) x (P, 2) MXU matmul
    (reference semantics: IC_Angle, src/ORBextractor.cc:77-105)."""
    M = jnp.asarray(_moment_matrix(), jnp.bfloat16)
    flat = patches.reshape(patches.shape[0], -1).astype(jnp.bfloat16)
    m = jnp.dot(flat, M, preferred_element_type=jnp.float32)  # (K, 2)
    return jnp.arctan2(m[:, 0], m[:, 1])


N_ANGLE_BINS = 64  # steered-BRIEF rotation quantization (5.6 deg/bin ->
# max offset error ~0.74 px at radius 15, the same order as the reference's
# per-keypoint integer rounding of rotated offsets)


@functools.lru_cache(maxsize=None)
def _brief_diff_matrix(n_bins: int = N_ANGLE_BINS) -> np.ndarray:
    """(PATCH*PATCH, n_bins*256) float32 with +1 at the first sample of each
    rotated BRIEF pair and -1 at the second: descriptor bits are then the
    SIGNS of one (K, P) x (P, bins*256) matmul — MXU work instead of a
    per-keypoint 512-sample gather."""
    pat = brief_pattern().astype(np.float64)  # (256, 4)
    W = np.zeros((n_bins, PATCH * PATCH, 256), np.float32)
    for b in range(n_bins):
        a = (b + 0.5) / n_bins * 2.0 * np.pi - np.pi
        ca, sa = np.cos(a), np.sin(a)
        for s in range(256):
            x1, y1, x2, y2 = pat[s]
            rx1 = min(max(int(round(ca * x1 - sa * y1)) + PATCH_R, 0), PATCH - 1)
            ry1 = min(max(int(round(sa * x1 + ca * y1)) + PATCH_R, 0), PATCH - 1)
            rx2 = min(max(int(round(ca * x2 - sa * y2)) + PATCH_R, 0), PATCH - 1)
            ry2 = min(max(int(round(sa * x2 + ca * y2)) + PATCH_R, 0), PATCH - 1)
            W[b, ry1 * PATCH + rx1, s] += 1.0
            W[b, ry2 * PATCH + rx2, s] -= 1.0
    return W.transpose(1, 0, 2).reshape(PATCH * PATCH, n_bins * 256)


def _describe_mm(patches: jax.Array, angle: jax.Array) -> jax.Array:
    """Steered BRIEF as one matmul: patches (K, PATCH, PATCH) from the
    blurred image, angle (K,). Computes all rotation bins' pair differences
    on the MXU and selects each keypoint's bin; bit = sign of difference
    (reference semantics: computeOrbDescriptor src/ORBextractor.cc:107-148,
    with the continuous rotation quantized to N_ANGLE_BINS)."""
    n_bins = N_ANGLE_BINS
    K = patches.shape[0]
    Wd = jnp.asarray(_brief_diff_matrix(n_bins), jnp.bfloat16)
    flat = patches.reshape(K, -1).astype(jnp.bfloat16)
    d = jnp.dot(flat, Wd, preferred_element_type=jnp.float32)
    d = d.reshape(K, n_bins, 256)
    bin_idx = jnp.floor(
        (angle + jnp.pi) / (2.0 * jnp.pi) * n_bins).astype(jnp.int32) % n_bins
    oh = jax.nn.one_hot(bin_idx, n_bins, dtype=jnp.float32)
    dsel = jnp.einsum("kbs,kb->ks", d, oh)
    bits = (dsel < 0).astype(jnp.uint32)  # i1 < i2, matching _describe
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1)
    return words.astype(jnp.uint32)


def _describe(patches: jax.Array, angle: jax.Array) -> jax.Array:
    """Steered BRIEF over blurred patches. patches: (K, PATCH, PATCH) from the
    blurred image; angle: (K,). Returns (K, 8) uint32."""
    pat = jnp.asarray(brief_pattern())  # (256, 4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    x1, y1, x2, y2 = (pat[:, 0].astype(jnp.float32), pat[:, 1].astype(jnp.float32),
                      pat[:, 2].astype(jnp.float32), pat[:, 3].astype(jnp.float32))

    def rot(x, y):
        # (K, 256) rotated integer offsets (reference rounds the same way:
        # computeOrbDescriptor's GET_VALUE macro); clamped to the patch
        rx = jnp.round(ca[:, None] * x[None] - sa[:, None] * y[None]).astype(jnp.int32)
        ry = jnp.round(sa[:, None] * x[None] + ca[:, None] * y[None]).astype(jnp.int32)
        return (jnp.clip(rx + PATCH_R, 0, PATCH - 1),
                jnp.clip(ry + PATCH_R, 0, PATCH - 1))

    rx1, ry1 = rot(x1, y1)
    rx2, ry2 = rot(x2, y2)
    flat = patches.reshape(patches.shape[0], -1)  # (K, PATCH*PATCH)
    i1 = jnp.take_along_axis(flat, ry1 * PATCH + rx1, axis=1)
    i2 = jnp.take_along_axis(flat, ry2 * PATCH + rx2, axis=1)
    bits = (i1 < i2).astype(jnp.uint32)  # (K, 256)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1)
    return words.astype(jnp.uint32)  # (K, 8)


@functools.partial(jax.jit, static_argnames=("cfg", "h", "w"))
def _extract_batch(imgs: jax.Array, cfg: ORBConfig, h: int, w: int) -> Features:
    """Batched atlas extraction: all pyramid levels live in ONE canvas so
    FAST score/NMS/cell-pooling/blur each run once over the whole pyramid,
    the patch gathers read one padded image, and orientation + BRIEF batch
    over every keypoint of every level together. ~4x fewer, ~8x larger XLA
    ops than a per-level loop (reference: per-level OpenCV calls in
    src/ORBextractor.cc:1086-1168).

    imgs: (B, H, W). The FAST score runs on the whole batch in one Pallas
    launch on TPU (vmap cannot batch a pallas_call with HBM operands); the
    rest of the pipeline vmaps over the batch.
    """
    layout = image_ops.atlas_layout(h, w, cfg.n_levels, cfg.scale,
                                    align=cfg.cell)
    atlases = jax.vmap(
        lambda im: image_ops.build_pyramid_atlas(
            im, cfg.n_levels, cfg.scale, layout))(imgs)
    if jax.default_backend() == "tpu":
        from orb_slam3_vio_fixes_tpu.ops import pallas_kernels as pk

        scores = pk.fast_score_batch(atlases)
    else:
        scores = jax.vmap(fast_ops._fast_score_xla)(atlases)
    budgets = tuple(features_per_level(cfg))
    return jax.vmap(
        lambda atlas, score: _describe_atlas(atlas, score, layout, budgets, cfg)
    )(atlases, scores)


def _describe_atlas(atlas, score_img, layout, budgets, cfg: ORBConfig) -> Features:
    ay, ax, score, valid, octave = fast_ops.detect_atlas_from_score(
        score_img, layout, budgets,
        threshold=cfg.fast_threshold,
        threshold_min=cfg.fast_threshold_min,
        cell=cfg.cell,
        max_per_cell=cfg.max_per_cell,
    )
    # One patch gather from the blurred atlas serves both orientation and
    # description. The reference computes IC_Angle on the UNBLURRED image
    # (src/ORBextractor.cc:1112) — using the blurred patch instead saves a
    # second 45x45 gather; the intensity centroid of a low-passed patch is
    # the same direction up to noise, and all consumers of the angle
    # (steered BRIEF, rotation-consistency histograms) only need
    # self-consistency across frames.
    # bf16 halves the bytes moved by the (K, PATCH, PATCH) gather — the
    # orientation and BRIEF matmuls consume bf16 anyway, and blur output
    # precision beyond ~1 gray level carries no information
    blurred = image_ops.gaussian_blur(atlas).astype(jnp.bfloat16)
    blur_patches = _gather_patches(blurred, jnp.stack([ay, ax], axis=-1))
    angle = _orientation(blur_patches)
    desc = _describe_mm(blur_patches, angle)
    # level-0 coords: (x, y - level_offset) * scale^level, with per-keypoint
    # constants from the static budgets layout
    used = [lvl for lvl, b in enumerate(budgets) if b > 0]
    off_kp = jnp.asarray(np.repeat(
        [layout.offsets[lvl] for lvl in used],
        [budgets[lvl] for lvl in used]).astype(np.float32))
    s_kp = jnp.asarray(np.repeat(
        [cfg.scale**lvl for lvl in used],
        [budgets[lvl] for lvl in used]).astype(np.float32))
    uv = jnp.stack([ax.astype(jnp.float32) * s_kp,
                    (ay.astype(jnp.float32) - off_kp) * s_kp], axis=-1)
    return Features(
        uv=uv, response=score, octave=octave, angle=angle, desc=desc,
        valid=valid,
    )


def extract(img: jax.Array, cfg: ORBConfig = ORBConfig()) -> Features:
    """Extract ORB features from a grayscale float32 (H, W) image."""
    h, w = img.shape
    batched = _extract_batch(img[None], cfg, h, w)
    return jax.tree_util.tree_map(lambda a: a[0], batched)


def extract_pair(img_l: jax.Array, img_r: jax.Array, cfg: ORBConfig = ORBConfig()):
    """Batched stereo extraction — one launch for both eyes (the TPU answer to
    the reference's two std::threads in src/Frame.cc:1059-1062)."""
    batched = _extract_batch(jnp.stack([img_l, img_r]), cfg, *img_l.shape)
    left = jax.tree_util.tree_map(lambda a: a[0], batched)
    right = jax.tree_util.tree_map(lambda a: a[1], batched)
    return left, right
