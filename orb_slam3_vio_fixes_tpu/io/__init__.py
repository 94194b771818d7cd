from orb_slam3_vio_fixes_tpu.io import synthetic  # noqa: F401
