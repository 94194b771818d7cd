from orb_slam3_vio_fixes_tpu.frontend import frame, tracking  # noqa: F401
