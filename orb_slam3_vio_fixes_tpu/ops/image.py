"""Image-space ops: pyramid construction, Gaussian blur, bilinear resize.

TPU-native replacement for the reference's OpenCV image plumbing
(reference: src/ORBextractor.cc:1170-1195 ComputePyramid with scale 1.2,
GaussianBlur(7,7,sigma=2) at src/ORBextractor.cc:1133).

Everything is static-shape: pyramid level sizes are computed at trace time
from the level-0 shape, so one jit specializes the whole pyramid. Images are
float32 (H, W) — batching (e.g. left+right stereo in one launch, the TPU
answer to the reference's 2-thread extraction at src/Frame.cc:1059-1062) is
done with a leading batch axis via vmap.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    """Per-level (h, w), matching round(dim / scale^level)."""
    return [
        (int(round(h / scale**lvl)), int(round(w / scale**lvl)))
        for lvl in range(n_levels)
    ]


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with half-pixel centers (matches cv2.resize INTER_LINEAR
    semantics closely enough for pyramid construction)."""
    return jax.image.resize(img, (out_h, out_w), method="linear")


def gaussian_kernel1d(ksize: int, sigma: float) -> jax.Array:
    r = (ksize - 1) / 2.0
    x = jnp.arange(ksize, dtype=jnp.float32) - r
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with reflect padding (cv2 BORDER_REFLECT_101)."""
    k = gaussian_kernel1d(ksize, sigma)
    pad = ksize // 2
    h, w = img.shape
    # Separable conv as unrolled shifted adds (static slices fuse into one
    # VPU loop under XLA; no gather needed).
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = sum(k[i] * x[i : i + h, :] for i in range(ksize))
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = sum(k[i] * x[:, i : i + w] for i in range(ksize))
    return x


def build_pyramid(
    img: jax.Array, n_levels: int = 8, scale: float = 1.2
) -> list[jax.Array]:
    """List of per-level images (successive resize from the previous level,
    like the reference, to match its low-pass behavior)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale)
    levels = [img]
    for lvl in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], *shapes[lvl]))
    return levels


def scale_factors(n_levels: int = 8, scale: float = 1.2) -> jnp.ndarray:
    return jnp.asarray([scale**i for i in range(n_levels)], jnp.float32)


class AtlasLayout(tuple):
    """Static pyramid-atlas layout: all levels stacked vertically in one
    canvas so every dense op (FAST score, NMS, blur, cell pooling) runs ONCE
    over the whole pyramid instead of once per level — the TPU answer to the
    reference's per-level OpenCV calls (src/ORBextractor.cc:1086-1168), which
    as 8 small launches x ~40 ops leave the VPU idle between ops.

    Fields are python ints/tuples (trace-time constants).
    """

    __slots__ = ()

    def __new__(cls, offsets, heights, widths, total_h, width):
        return tuple.__new__(cls, (offsets, heights, widths, total_h, width))

    offsets = property(lambda s: s[0])   # per-level row offset in the canvas
    heights = property(lambda s: s[1])
    widths = property(lambda s: s[2])
    total_h = property(lambda s: s[3])
    width = property(lambda s: s[4])


@functools.lru_cache(maxsize=None)
def atlas_layout(h: int, w: int, n_levels: int, scale: float,
                 align: int = 35, gap: int = 8) -> AtlasLayout:
    """Row offsets aligned to the FAST cell size so a 35-px cell never spans
    two levels; `gap` blank rows isolate NMS/blur across level boundaries."""
    shapes = pyramid_shapes(h, w, n_levels, scale)
    offs, hs, ws = [], [], []
    y = 0
    for lh, lw in shapes:
        offs.append(y)
        hs.append(lh)
        ws.append(lw)
        y = ((y + lh + gap + align - 1) // align) * align
    return AtlasLayout(tuple(offs), tuple(hs), tuple(ws), y, w)


def build_pyramid_atlas(img: jax.Array, n_levels: int, scale: float,
                        layout: AtlasLayout) -> jax.Array:
    """(total_h, W) canvas with each pyramid level pasted at its offset
    (zeros elsewhere). Levels are the same successive resizes as
    build_pyramid."""
    img = img.astype(jnp.float32)   # resized levels are float; a uint8
    # canvas would silently re-quantize every pyramid level
    levels = build_pyramid(img, n_levels, scale)
    canvas = jnp.zeros((layout.total_h, layout.width), img.dtype)
    for lv, off, lh, lw in zip(levels, layout.offsets, layout.heights, layout.widths):
        canvas = canvas.at[off : off + lh, :lw].set(lv)
    return canvas
