from orb_slam3_vio_fixes_tpu.parallel import sharded_ba  # noqa: F401
