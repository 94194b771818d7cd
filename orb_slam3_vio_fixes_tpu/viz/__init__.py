from orb_slam3_vio_fixes_tpu.viz.frame_drawer import draw_frame
from orb_slam3_vio_fixes_tpu.viz.map_drawer import draw_map, draw_trajectory
from orb_slam3_vio_fixes_tpu.viz.viewer import OfflineViewer

__all__ = ["draw_frame", "draw_map", "draw_trajectory", "OfflineViewer"]
