from orb_slam3_vio_fixes_tpu.utils import cameras, lie  # noqa: F401
