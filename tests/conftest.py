"""Test configuration: force a virtual 8-device CPU mesh before JAX import.

Unit tests run on CPU (fast iteration, no TPU tunnel latency); the driver
separately compile-checks the TPU path via __graft_entry__.py. The 8 virtual
devices let sharding tests emulate a pod slice locally (SURVEY.md §4).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment may pre-register a TPU backend and force JAX_PLATFORMS to it
# (env var alone is not enough to undo that) — pin the CPU platform via the
# config API, which wins regardless of registration order.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated; repeat runs
# of unchanged kernels load from disk instead of recompiling
from orb_slam3_vio_fixes_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
