#!/usr/bin/env python
"""Stereo KITTI (Examples/Stereo/stereo_kitti.cc analogue)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam3_vio_fixes_tpu.apps import main_template

if __name__ == "__main__":
    sys.exit(main_template("kitti", "STEREO", __doc__))
