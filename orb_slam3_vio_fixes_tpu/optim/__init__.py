from orb_slam3_vio_fixes_tpu.optim import ba_core  # noqa: F401
