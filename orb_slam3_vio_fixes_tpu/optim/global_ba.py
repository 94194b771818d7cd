"""Global bundle adjustment over the whole map.

TPU-native equivalent of the reference's GlobalBundleAdjustemnt /
RunGlobalBundleAdjustment (reference: src/Optimizer.cc:52-390 — g2o LM over
every keyframe + MapPoint; src/LoopClosing.cc:1199-1207 spawns it in a
transient thread after loop correction when the map has <200 KFs, then
propagates corrections through the spanning tree :2268-2511).

Re-design: the full map IS the problem here (fixed-capacity SoA arrays), so
there is no spanning-tree propagation step — every valid keyframe is a
vertex, every bound observation is a factor, and the matrix-free CG Schur
solver (optim/ba_core.schur_cg_solve) keeps memory O(F + K + L) instead of
the dense path's O(K*L). Keyframes inserted *during* an async GBA are the one
thing the reference's propagation handles; our async wrapper (runtime) solves
it with the epoch check instead: a GBA result is committed only against the
epoch it started from, and new keyframes are re-based like the reference's
mTcwBefGBA chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.optim import ba_core
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_levels", "scale"), donate_argnums=(0,)
)
def run_global_ba(
    state: ms.MapState,
    inv_sigma2_oct: jax.Array,
    cam: Camera,
    bf,
    fixed_kf: jax.Array,          # scalar int32 — gauge anchor (usually 0)
    cfg: ba_core.LMConfig = ba_core.LMConfig(
        n_rounds=2, n_iters=8, solver="cg", cg_iters=40),
    n_levels: int = 8,
    scale: float = 1.2,
):
    """Optimize every valid keyframe pose + landmark position jointly.

    Returns (state', n_inlier_factors). Outlier observations (chi2 above the
    reference's thresholds after the final round) are unbound from kf_obs,
    mirroring the reference's post-GBA outlier handling.
    """
    K, N = state.kf_obs.shape
    window = jnp.arange(K, dtype=jnp.int32)
    pose_idx, lm_idx, uvr, inv_s2, valid = ms.ba_factors_from_map(
        state, window, inv_sigma2_oct)
    # Exclude factors of under-observed (<2 views) landmarks entirely: a
    # 1-observer landmark is unconstrained along its ray, and anchoring it
    # (lm_fixed) would let its stale position pull the observing pose — the
    # reference never faces this because MapPointCulling guarantees >=2 obs
    # before GBA sees a point (src/LocalMapping.cc:346-385).
    n_obs = ms.landmark_obs_count(state)
    valid = valid & (n_obs[lm_idx] >= 2)
    factors = ba_core.ReprojFactors(pose_idx, lm_idx, uvr, inv_s2, valid)

    pose_fixed = ~state.kf_valid
    pose_fixed = pose_fixed.at[fixed_kf].set(True)
    problem = ba_core.BAProblem(
        R=state.kf_R, t=state.kf_t,
        pose_fixed=pose_fixed,
        lm=state.lm_pos, lm_valid=state.lm_valid,
        lm_fixed=n_obs < 2,
        factors=factors, cam=cam, bf=bf,
    )
    out, inlier, chi2 = ba_core.bundle_adjust(problem, cfg)

    upd = state.kf_valid & ~pose_fixed
    new_state = state._replace(
        kf_R=jnp.where(upd[:, None, None], out.R, state.kf_R),
        kf_t=jnp.where(upd[:, None], out.t, state.kf_t),
        lm_pos=out.lm,
        epoch=state.epoch + 1,
    )
    # unbind outlier observations
    drop = (valid & ~inlier).reshape(K, N)
    new_state = new_state._replace(
        kf_obs=jnp.where(drop, -1, new_state.kf_obs))
    new_state = ms.update_landmark_stats(new_state, n_levels, scale)
    return new_state, jnp.sum((valid & inlier).astype(jnp.int32))
