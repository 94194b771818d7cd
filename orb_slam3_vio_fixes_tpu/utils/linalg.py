"""Closed-form batched small-matrix linear algebra.

XLA's batched LU / eigendecomposition kernels (`jnp.linalg.inv`,
`jnp.linalg.solve`, `jnp.linalg.eigh`) are latency-bound on TPU — measured
4.6 ms for a (4096,3,3) inverse vs ~0.1 ms for the closed forms here, which
are pure vectorized arithmetic on the VPU. Every hot Schur/LM solve in the
framework routes its 3x3 / 6x6 block algebra through this module.

(The reference leans on Eigen's fixed-size specializations for the same
blocks, e.g. g2o's BlockSolver_6_3 — this is the TPU equivalent.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3(A: jax.Array, eps: float = 0.0) -> jax.Array:
    """Closed-form inverse of (..., 3, 3) matrices (adjugate / determinant)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    r00 = e * i - f * h
    r01 = c * h - b * i
    r02 = b * f - c * e
    r10 = f * g - d * i
    r11 = a * i - c * g
    r12 = c * d - a * f
    r20 = d * h - e * g
    r21 = b * g - a * h
    r22 = a * e - b * d
    det = a * r00 + b * r10 + c * r20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det + eps)
    rows = jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)
    return rows * inv_det[..., None, None]


def solve6(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (..., 6, 6) @ x = (..., 6) by 3x3 block Schur elimination with
    closed-form 3x3 inverses (SPD damped Hessians: the (0,0) block is
    invertible)."""
    P = A[..., :3, :3]
    Q = A[..., :3, 3:]
    Rb = A[..., 3:, :3]
    S = A[..., 3:, 3:]
    b1 = b[..., :3]
    b2 = b[..., 3:]
    Pinv = inv3(P)
    RPinv = Rb @ Pinv
    Ssc = S - RPinv @ Q
    Sinv = inv3(Ssc)
    x2 = jnp.einsum("...ij,...j->...i", Sinv,
                    b2 - jnp.einsum("...ij,...j->...i", RPinv, b1))
    x1 = jnp.einsum("...ij,...j->...i", Pinv,
                    b1 - jnp.einsum("...ij,...j->...i", Q, x2))
    return jnp.concatenate([x1, x2], axis=-1)


def inv6(A: jax.Array) -> jax.Array:
    """Closed-form (..., 6, 6) inverse via 3x3 block Schur."""
    P = A[..., :3, :3]
    Q = A[..., :3, 3:]
    Rb = A[..., 3:, :3]
    S = A[..., 3:, 3:]
    Pinv = inv3(P)
    RPinv = Rb @ Pinv
    PinvQ = Pinv @ Q
    Sinv = inv3(S - RPinv @ Q)
    tl = Pinv + PinvQ @ Sinv @ RPinv
    tr = -PinvQ @ Sinv
    bl = -Sinv @ RPinv
    return jnp.concatenate([
        jnp.concatenate([tl, tr], axis=-1),
        jnp.concatenate([bl, Sinv], axis=-1),
    ], axis=-2)


def compact_indices(mask: jax.Array, budget: int):
    """Stable compaction: indices of the first `budget` True entries of
    `mask`. Returns (idx (budget,), filled (budget,) bool); unfilled slots
    point at index 0 — mask gathered data with `filled`.

    Replaces `jnp.argsort(where(mask,0,1), stable=True)[:budget]` — a TPU
    sort costs ~8 ms at 32k elements; this cumsum + one scatter is ~0.3 ms.
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask & (pos < budget), pos, budget)
    out = jnp.zeros(budget + 1, jnp.int32)
    src = jnp.arange(n, dtype=jnp.int32)
    idx = out.at[tgt].set(src)[:budget]
    n_fill = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), budget)
    filled = jnp.arange(budget, dtype=jnp.int32) < n_fill
    return idx, filled
