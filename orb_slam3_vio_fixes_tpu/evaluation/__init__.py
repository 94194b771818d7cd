from orb_slam3_vio_fixes_tpu.evaluation import ate  # noqa: F401
