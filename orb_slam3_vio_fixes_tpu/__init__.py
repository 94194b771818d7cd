"""TPU-native visual(-inertial) multi-map SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of ORB-SLAM3
(reference: vdoom/ORB_SLAM3_VIO_FIXES, surveyed in SURVEY.md): ORB feature
extraction, Hamming matching, bag-of-words place recognition, IMU
preintegration, and all factor-graph optimization (motion-only pose opt,
local/full/inertial bundle adjustment, Sim3/4-DoF essential graph) as batched
jitted kernels over fixed-capacity masked array state, with multi-chip scaling
via `jax.sharding` meshes.

Design stance (vs the reference's pointer-graph + mutexes, see SURVEY.md §7):
  * fixed-capacity SoA arrays with validity masks instead of dynamic objects,
  * pure-functional map snapshots with epoch counters instead of locks,
  * batched-hypothesis RANSAC instead of sequential iteration,
  * one LM solver powering every optimizer entry point instead of 20 g2o graphs.
"""

__version__ = "0.1.0"

from orb_slam3_vio_fixes_tpu.system import SLAMSystem, Sensor  # noqa: F401
