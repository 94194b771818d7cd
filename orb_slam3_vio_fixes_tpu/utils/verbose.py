"""Verbose: leveled message printer (reference: include/System.h:47-72).

The reference gates console output through Verbose::PrintMess with levels
QUIET < NORMAL < VERBOSE < VERY_VERBOSE < DEBUG and a static threshold set
at System construction. Same surface here, plus an optional logger hook.
"""

from __future__ import annotations

import enum
import sys


class Level(enum.IntEnum):
    QUIET = 0
    NORMAL = 1
    VERBOSE = 2
    VERY_VERBOSE = 3
    DEBUG = 4


_threshold = Level.QUIET  # reference sets QUIET at end of System ctor


def set_level(level: Level) -> None:
    global _threshold
    _threshold = Level(level)


def get_level() -> Level:
    return _threshold


def print_mess(msg: str, level: Level = Level.NORMAL, file=None) -> None:
    if level <= _threshold and level != Level.QUIET:
        print(msg, file=file or sys.stderr)
