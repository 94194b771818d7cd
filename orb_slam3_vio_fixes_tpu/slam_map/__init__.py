from orb_slam3_vio_fixes_tpu.slam_map import map_state  # noqa: F401
