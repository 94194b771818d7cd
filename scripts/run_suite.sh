#!/usr/bin/env bash
# Chunked test-suite runner: one pytest process per group of test files.
#
# Why not one big `pytest tests/`: each XLA:CPU compiled executable holds
# ~300 memory mappings; one process running the whole suite exhausts the
# default `vm.max_map_count` (65530) and SEGFAULTS mid-compile after ~60-115
# tests, at whatever test happens to compile next. Raising the limit
# (`sysctl -w vm.max_map_count=2000000`, done below best-effort) fixes the
# root cause; chunked fresh processes additionally bound accumulation on
# hosts where the sysctl is unavailable. The persistent compile cache
# (utils/compile_cache.py) makes process restarts cheap.
#
# Usage:
#   scripts/run_suite.sh            # not-slow suite, chunked
#   scripts/run_suite.sh --slow     # slow/acceptance gates too
set -u
cd "$(dirname "$0")/.."

sysctl -w vm.max_map_count=2000000 >/dev/null 2>&1 || true

MARK='not slow'
if [ "${1:-}" = "--slow" ]; then
    MARK=''
fi

# groups sized to keep per-process compile counts bounded
GROUPS_LIST=(
  "tests/test_lie.py tests/test_cameras.py tests/test_imu.py tests/test_matching.py tests/test_orb.py tests/test_rectify.py"
  "tests/test_ba.py tests/test_vi_ba.py tests/test_inertial_init.py tests/test_pose_graph.py tests/test_pnp.py tests/test_triangulate.py"
  "tests/test_global_ba.py tests/test_vi_global_ba.py tests/test_sharded_ba.py tests/test_sharded_matching.py"
  "tests/test_local_mapping.py tests/test_loop_closing.py tests/test_kf_culling.py tests/test_slot_reuse.py tests/test_relocalization.py tests/test_retrieval_pr.py"
  "tests/test_e2e_stereo.py tests/test_e2e_rgbd.py tests/test_e2e_mono.py tests/test_pipelined.py"
  "tests/test_e2e_inertial.py tests/test_e2e_mono_inertial.py tests/test_fisheye_stereo.py"
  "tests/test_e2e_loop.py tests/test_e2e_inertial_loop.py tests/test_e2e_gt.py tests/test_e2e_gt_inertial.py"
  "tests/test_atlas.py tests/test_system.py tests/test_apps.py tests/test_configs.py tests/test_datasets.py tests/test_trajectory.py"
  "tests/test_noise_robustness.py tests/test_runtime.py tests/test_vio.py tests/test_viz.py tests/test_marathon.py"
)

FAIL=0
for group in "${GROUPS_LIST[@]}"; do
    # drop files that don't exist (groups list is forward-compatible)
    files=""
    for f in $group; do
        [ -f "$f" ] && files="$files $f"
    done
    [ -z "$files" ] && continue
    echo "=== pytest $files"
    if [ -n "$MARK" ]; then
        python -m pytest $files -q -m "$MARK" -p no:cacheprovider || FAIL=1
    else
        python -m pytest $files -q -p no:cacheprovider || FAIL=1
    fi
done
exit $FAIL
