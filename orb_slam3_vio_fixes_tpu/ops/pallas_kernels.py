"""Pallas TPU kernels for the dense image hot loops.

The XLA lowering of the FAST-9/16 arc score materializes the 16-neighbor
ring stack and the min-chain intermediates in HBM (~8 passes over
(16, H, W)); this kernel computes the whole score in ONE pass — each grid
step DMAs a row tile plus 3-pixel halo into VMEM, forms the ring
differences and the arc min/max chains in registers, and writes the score
tile (reference semantics: the per-cell cv::FAST calls of
src/ORBextractor.cc:781-1075, scored like OpenCV's arc score).

Only used on TPU backends; the XLA path remains for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam3_vio_fixes_tpu.ops.fast import ARC, BORDER, CIRCLE

TILE = 64    # rows per grid step (VMEM-bounded: ~80 live (TILE, W) bf16 tiles)
HALO = 8     # row halo (>= BORDER, 8-aligned for DMA slicing)
LPAD = 128   # column halo (>= BORDER, lane-aligned)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fast_score_kernel(x_hbm, o_ref, tile, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TILE, TILE + 2 * HALO), :], tile, sem
    )
    cp.start()
    cp.wait()
    x = tile[:]
    wp = x.shape[1] - 2 * LPAD
    c = x[HALO : HALO + TILE, LPAD : LPAD + wp]
    d = [
        x[HALO + dy : HALO + dy + TILE, LPAD + dx : LPAD + dx + wp] - c
        for dy, dx in CIRCLE
    ]

    def arc(ds):
        dw = ds + ds[: ARC - 1]  # 24 tiles, circular wrap
        m2 = [jnp.minimum(dw[j], dw[j + 1]) for j in range(23)]
        m4 = [jnp.minimum(m2[j], m2[j + 2]) for j in range(21)]
        m8 = [jnp.minimum(m4[j], m4[j + 4]) for j in range(17)]
        m9 = [jnp.minimum(m8[j], dw[j + 8]) for j in range(16)]
        return functools.reduce(jnp.maximum, m9)

    s = jnp.maximum(jnp.maximum(arc(d), arc([-v for v in d])), 0.0)
    o_ref[0] = s.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def fast_score_batch(imgs: jax.Array) -> jax.Array:
    """Batched dense FAST-9/16 score. imgs: (B, H, W) float32 with
    integer-valued (uint8-range) intensities. Returns (B, H, W) float32
    scores with zeroed borders — same contract as fast.fast_score."""
    B, H, W = imgs.shape
    Hp = _round_up(H, TILE)
    Wo = _round_up(W, 128)           # output width
    Wi = Wo + 2 * LPAD               # input width (lane-aligned halo)
    x = jnp.round(imgs).astype(jnp.bfloat16)
    # edge-pad the halo; tile/lane padding replicates the edge too (those
    # scores are masked below)
    x = jnp.pad(
        x,
        ((0, 0), (HALO, HALO + Hp - H), (LPAD, Wi - W - LPAD)),
        mode="edge",
    )
    out = pl.pallas_call(
        _fast_score_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wo), jnp.float32),
        grid=(B, Hp // TILE),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE, Wo),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE + 2 * HALO, Wi), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x)
    s = out[:, :H, :W]
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= BORDER) & (yy < H - BORDER) & (xx >= BORDER) & (xx < W - BORDER)
    return jnp.where(inb[None], s, 0.0)
