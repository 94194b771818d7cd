from orb_slam3_vio_fixes_tpu.ops import fast, image, orb  # noqa: F401
