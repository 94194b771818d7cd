"""Marathon endurance run (round-4 verdict item 8): ~2,000 frames with
repeated loop closures, a mid-run kidnap -> Atlas map spawn, and a merge
back — the joint test of slot reuse, capacity growth, culling, the essential
graph, and loop/merge machinery that nothing shorter exercises together.

Phases:
  A: 800 frames = 2.5 laps of the loop circle (>=2 revisit loop events);
  B: blank frames (kidnap) -> LOST -> stash map 1, then 150 frames in a
     DISCONNECTED second world (map 2);
  C: blank again -> stash map 2, return to the circle -> new map 3 merges
     back into stored map 1, then ~1,000 more frames of laps.

Gates: tracking healthy at the end, >=2 loop corrections, >=1 merge,
keyframe slots actually reused, capacity tiers bounded by culling, no
monotonic frame-time growth, final ATE on the circle phases.
"""

import time

import numpy as np
import pytest
import jax.numpy as jnp

from orb_slam3_vio_fixes_tpu.evaluation import ate
from orb_slam3_vio_fixes_tpu.frontend import loop_closing as lc
from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.frontend.frame import build_stereo_frame
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import atlas as atlas_mod
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.slam_map import vocabulary as voc
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera

H, W, FX, BASELINE = 240, 352, 260.0, 0.2
DT = 0.05
N_A, N_B, N_C = 800, 150, 1026
N_BLANK = 12
N_LOOP = 320           # frames per lap


def _render_all():
    """Pre-render the whole scenario as uint8 (a real camera's output)."""
    rng = np.random.default_rng(31)
    # phase A+C laps: one long circular sequence
    n_circle = N_A + N_C
    seq_circle = synthetic.make_loop_stereo_sequence(
        rng, n_frames=n_circle, h=H, w=W, fx=FX, baseline=BASELINE, dt=DT,
        radius=3.0, wall_radius=9.0, n_points=1600, n_loop=N_LOOP)
    # phase B: disconnected world (different textures/geometry)
    rng_b = np.random.default_rng(77)
    seq_b = synthetic.make_loop_stereo_sequence(
        rng_b, n_frames=N_B, h=H, w=W, fx=FX, baseline=BASELINE, dt=DT,
        radius=2.0, wall_radius=6.0, n_points=1100, n_loop=N_B + 1)

    def q(x):
        return np.clip(np.rint(x), 0, 255).astype(np.uint8)

    return (seq_circle._replace(imgs_l=q(seq_circle.imgs_l),
                                imgs_r=q(seq_circle.imgs_r)),
            seq_b._replace(imgs_l=q(seq_b.imgs_l), imgs_r=q(seq_b.imgs_r)))


@pytest.mark.slow
def test_marathon_loops_kidnap_merge():
    seq, seq_b = _render_all()
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=384, n_levels=4),
        map=ms.MapConfig(max_keyframes=64, max_landmarks=8192,
                         max_features=384),
        width=W, height=H, max_local_lm=2048, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=6,
    )
    # vocabulary from a handful of phase-A frames (shippable-path analogue)
    pool = []
    for i in range(0, N_LOOP, N_LOOP // 8):
        f = build_stereo_frame(
            jnp.asarray(seq.imgs_l[i]), jnp.asarray(seq.imgs_r[i]),
            jnp.float32(0.0), cam, jnp.float32(FX * BASELINE), cfg.orb)
        pool.append(np.asarray(f.desc)[np.asarray(f.valid)])
    vocab = voc.train(np.concatenate(pool), branching=10, depth=3, seed=0)
    inv_s2 = tracking.octave_inv_sigma2(cfg.orb)

    lcfg = lc.LoopConfig(min_gap_kfs=12, n_consistency=2, fix_scale=True)
    closer = lc.LoopCloser(vocab, cam, cfg.map.max_keyframes, inv_s2, lcfg,
                           bf=FX * BASELINE, n_levels=cfg.orb.n_levels,
                           scale=cfg.orb.scale)
    atl = atlas_mod.Atlas(cfg.map, vocab, cam, inv_s2,
                          atlas_mod.AtlasConfig(min_stash_kfs=5))
    tr = tracking.StereoTracker(cam, FX * BASELINE, cfg,
                                loop_closer=closer, atlas=atl)
    tr.max_lost_frames = 4

    blank = np.zeros((H, W), np.uint8)
    frame_wall = []
    ts = 0.0
    circle_ts = []       # timestamps of circle-phase frames (for ATE)
    circle_idx = []      # index into seq (GT row)

    def step(img_l, img_r, gt_i=None):
        nonlocal ts
        t0 = time.perf_counter()
        tr.process_stereo(img_l, img_r, ts)
        frame_wall.append(time.perf_counter() - t0)
        if gt_i is not None:
            circle_ts.append(ts)
            circle_idx.append(gt_i)
        ts += DT

    for i in range(N_A):                       # phase A
        step(seq.imgs_l[i], seq.imgs_r[i], gt_i=i)
    for _ in range(N_BLANK):                   # kidnap 1
        step(blank, blank)
    assert tr.map_id >= 1, "kidnap did not spawn a new Atlas map"
    for i in range(N_B):                       # phase B (other world)
        step(seq_b.imgs_l[i], seq_b.imgs_r[i])
    for _ in range(N_BLANK):                   # kidnap 2
        step(blank, blank)
    for i in range(N_A, N_A + N_C):            # phase C (back on the circle)
        step(seq.imgs_l[i], seq.imgs_r[i], gt_i=i)
    tr.flush()

    # --- health gates ---
    assert tr.track_state == tracking.TrackState.OK
    assert closer.n_corrections >= 2, (
        f"expected >=2 loop corrections, got {closer.n_corrections}")
    assert atl.n_merges >= 1, "the return to the circle never merged back"
    assert tr._kf_created_reused > 0, "keyframe slots were never reused"
    # Capacity bounding: the LIVE keyframe count is what culling must hold
    # down (~330 keyframes are created over the run); the slot high-water
    # additionally absorbs the merge's slot transfer (merged n_kf = stored
    # map slots + active map slots), so the tier ceiling is looser.
    assert len(tr.kf_order) <= 220, f"culling failed: {len(tr.kf_order)} live"
    assert tr.cfg.map.max_keyframes <= 512, tr.cfg.map.max_keyframes

    # --- no monotonic slowdown: late-phase median vs early steady-state ---
    wall = np.asarray(frame_wall)
    early = np.median(wall[300:500])
    late = np.median(wall[-220:-20])
    assert late <= 2.0 * early, (
        f"frame time grew {early * 1e3:.0f} -> {late * 1e3:.0f} ms")

    # --- ATE over the circle phases (kidnap/other-world frames excluded).
    # Phase-A entries were frozen to absolute coordinates at the stash and
    # the merge returns tracking to the SAME stored world frame, so one Horn
    # alignment covers both phases. ---
    traj = {round(t, 6): (Rr, tt) for t, Rr, tt in tr.trajectory}
    est_ts, est_pos, gt_pos = [], [], []
    for t, gi in zip(circle_ts, circle_idx):
        e = traj.get(round(t, 6))
        if e is None:
            continue
        est_ts.append(t)
        est_pos.append(-e[0].T @ e[1])
        gt_pos.append(seq.t_wc[gi])
    est_ts = np.asarray(est_ts)
    est_pos = np.asarray(est_pos)
    gt_pos = np.asarray(gt_pos)
    assert len(est_ts) >= 0.95 * (N_A + N_C)
    rmse, _, n_assoc = ate.ate_rmse(est_ts, gt_pos, est_ts, est_pos)
    assert n_assoc == len(est_ts)
    assert rmse < 0.5, f"marathon circle ATE {rmse:.3f} m"
    print(f"[marathon] frames={len(wall)} kf_live={len(tr.kf_order)} "
          f"loops={closer.n_corrections} merges={atl.n_merges} "
          f"reused={tr._kf_created_reused} ate={rmse:.3f} "
          f"median_ms early={1e3 * early:.0f} late={1e3 * late:.0f}")
