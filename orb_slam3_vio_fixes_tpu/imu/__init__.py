from orb_slam3_vio_fixes_tpu.imu import preintegration  # noqa: F401
