"""Persistent XLA compilation cache setup.

The tracking pipeline is one large jitted program (~minutes of first-compile
on a TPU backend). A persistent on-disk cache makes every process after the
first start in seconds — the TPU analogue of the reference shipping
precompiled binaries. Call `enable()` before the first jit compilation
(bench.py, __graft_entry__, example apps, scripts).
"""

from __future__ import annotations

import os


def _host_fingerprint() -> str:
    """Short stable hash of this machine's CPU flags (/proc/cpuinfo)."""
    import hashlib
    import platform as _plat

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_plat.machine()}|{flags}".encode()
    return hashlib.sha1(raw).hexdigest()[:12]


def enable(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        base = os.environ.get(
            "ORB_TPU_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
        # One cache dir PER BACKEND PLATFORM. A TPU-tunnel backend compiles
        # (parts of) executables on the REMOTE host, whose CPU feature set
        # (AMX/AVX512) differs from this machine's; sharing one directory
        # lets a later CPU run load an incompatible AOT blob — XLA warns
        # "could lead to execution errors such as SIGILL" and the process
        # can abort mid-suite (observed). Platform-keyed subdirs make the
        # pollution impossible.
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "unknown"
        # ... and additionally key CPU caches by the HOST feature set: the
        # repo (and its cache dir) migrates between machines with different
        # CPU features (AMX/AVX512 vs not); XLA:CPU AOT blobs compiled on a
        # richer machine fail to load ("Compile machine features ... vs host
        # machine features ... could lead to execution errors such as
        # SIGILL") or could silently mis-execute. A flags fingerprint makes
        # a wrong-machine cache hit impossible.
        if platform == "cpu":
            platform = f"cpu-{_host_fingerprint()}"
        cache_dir = os.path.join(base, platform)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: compilation still works, just uncached
