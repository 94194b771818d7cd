"""Keyframe-slot reuse: long sequences with heavy culling must stay at the
initial capacity tier (round-4 verdict item 8 — the round-3 allocator was a
monotonic cursor, so culled slots were never reclaimed and `_maybe_grow`
doubled tiers unboundedly even when culling bounded the live count; the
reference frees keyframes on SetBadFlag, src/KeyFrame.cc:573-679)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_vio_fixes_tpu.frontend import tracking
from orb_slam3_vio_fixes_tpu.io import synthetic
from orb_slam3_vio_fixes_tpu.ops import orb
from orb_slam3_vio_fixes_tpu.slam_map import map_state as ms
from orb_slam3_vio_fixes_tpu.utils.cameras import Camera


@pytest.mark.slow
def test_long_sequence_stays_at_initial_tier():
    rng = np.random.default_rng(3)
    world = synthetic.make_world(rng, n_points=900, extent=9.0,
                                 depth_range=(2.5, 9.0))
    # slow orbit: revisits similar viewpoints so most keyframes become
    # redundant and cullable
    seq = synthetic.make_stereo_sequence(
        rng, n_frames=300, h=240, w=352, fx=260.0, baseline=0.2,
        speed=(0.25, 0.0, 0.04), yaw_rate=0.02, world=world)
    max_kf = 48
    cfg = tracking.TrackerConfig(
        orb=orb.ORBConfig(n_features=400, n_levels=4),
        map=ms.MapConfig(max_keyframes=max_kf, max_landmarks=8192,
                         max_features=400),
        width=352, height=240, max_local_lm=1024, ba_window=6, ba_fixed=2,
        new_lm_budget=256, max_frames_between_kf=4,
        kf_cull_every=2, kf_cull_max=4,
    )
    cam = Camera.pinhole(seq.K[0, 0], seq.K[1, 1], seq.K[0, 2], seq.K[1, 2])
    tr = tracking.StereoTracker(cam, seq.K[0, 0] * seq.baseline, cfg)
    for i in range(seq.imgs_l.shape[0]):
        tr.process_stereo(seq.imgs_l[i], seq.imgs_r[i], seq.ts[i])
    tr.flush()
    assert tr.track_state == tracking.TrackState.OK
    # slots were reused: the high-water mark never hit the growth threshold
    assert tr.cfg.map.max_keyframes == max_kf, (
        f"capacity tier doubled to {tr.cfg.map.max_keyframes} — slots were "
        f"not reused (n_kf={tr.n_kf}, live={len(tr.kf_order)})")
    assert tr.n_kf < max_kf - 2
    # and reuse actually happened (enough keyframes were created that the
    # monotonic cursor would have overflowed the tier)
    total_created = tr.n_kf + tr._kf_created_reused
    assert total_created > max_kf, (
        f"scenario too gentle: only {total_created} keyframes created")
    # live bookkeeping is consistent
    live = np.asarray(tr.state.kf_valid).nonzero()[0].tolist()
    assert sorted(tr.kf_order) == sorted(live)
