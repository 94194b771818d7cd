"""ctypes bindings to the native C++ runtime (native/orbslam3_tpu_rt.cpp).

The native library provides the inter-actor bounded queues and host-side
Hamming matching (role parity with the reference's C++ thread/queue runtime,
src/LocalMapping.cc:284-296 / src/LoopClosing.cc:311-322, and
ORBmatcher::DescriptorDistance include/ORBmatcher.h:43). Falls back to pure
Python/numpy when the .so is absent and cannot be built.
"""

from __future__ import annotations

import ctypes
import os
import queue as _pyqueue
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "liborbslam3_tpu_rt.so")

_lib = None


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "orbslam3_tpu_rt.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, OSError):
                return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.rt_queue_create.restype = ctypes.c_void_p
    lib.rt_queue_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t, ctypes.c_int]
    lib.rt_queue_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_queue_push.restype = ctypes.c_int
    lib.rt_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.rt_queue_pop.restype = ctypes.c_int
    lib.rt_queue_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.rt_queue_size.restype = ctypes.c_size_t
    lib.rt_queue_size.argtypes = [ctypes.c_void_p]
    lib.rt_queue_close.argtypes = [ctypes.c_void_p]
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rt_hamming_match.argtypes = [
        u8p, ctypes.c_size_t, u8p, ctypes.c_size_t, i32p, i32p, i32p,
    ]
    lib.rt_hamming_matrix.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t, i32p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _try_load() is not None


class NativeQueue:
    """Bounded fixed-item-size byte queue; native when possible.

    drop_oldest=True mirrors the fork's odometry queue; False mirrors the
    reference's reject-when-full keyframe queue.
    """

    def __init__(self, capacity: int, item_size: int, drop_oldest: bool = False):
        self.capacity = capacity
        self.item_size = item_size
        self.drop_oldest = drop_oldest
        lib = _try_load()
        self._lib = lib
        if lib is not None:
            self._q = lib.rt_queue_create(capacity, item_size, int(drop_oldest))
        else:
            self._q = None
            self._pyq: "_pyqueue.Queue" = _pyqueue.Queue(maxsize=capacity)

    def push(self, data: bytes) -> bool:
        assert len(data) == self.item_size
        if self._q is not None:
            return bool(self._lib.rt_queue_push(self._q, data))
        try:
            self._pyq.put_nowait(data)
            return True
        except _pyqueue.Full:
            if not self.drop_oldest:
                return False
            try:
                self._pyq.get_nowait()
            except _pyqueue.Empty:
                pass
            self._pyq.put_nowait(data)
            return True

    def pop(self, timeout_ms: int = 100) -> Optional[bytes]:
        if self._q is not None:
            buf = ctypes.create_string_buffer(self.item_size)
            ok = self._lib.rt_queue_pop(self._q, buf, timeout_ms)
            return buf.raw if ok else None
        try:
            return self._pyq.get(timeout=timeout_ms / 1000.0)
        except _pyqueue.Empty:
            return None

    def size(self) -> int:
        if self._q is not None:
            return int(self._lib.rt_queue_size(self._q))
        return self._pyq.qsize()

    def close(self) -> None:
        if self._q is not None:
            self._lib.rt_queue_close(self._q)

    def __del__(self):
        if getattr(self, "_q", None) is not None and self._lib is not None:
            self._lib.rt_queue_destroy(self._q)
            self._q = None


def hamming_match(
    queries: np.ndarray, db: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Best/second-best Hamming match: (best_idx, best_dist, second_dist)."""
    q = np.ascontiguousarray(queries, dtype=np.uint8)
    d = np.ascontiguousarray(db, dtype=np.uint8)
    nq, nd = q.shape[0], d.shape[0]
    lib = _try_load()
    if lib is not None and nq and nd:
        bi = np.empty(nq, np.int32)
        b1 = np.empty(nq, np.int32)
        b2 = np.empty(nq, np.int32)
        lib.rt_hamming_match(q, nq, d, nd, bi, b1, b2)
        return bi, b1, b2
    # numpy fallback
    mat = hamming_matrix(q, d)
    if nd == 0 or nq == 0:
        return (
            np.full(nq, -1, np.int32),
            np.full(nq, 257, np.int32),
            np.full(nq, 257, np.int32),
        )
    order = np.argsort(mat, axis=1)
    bi = order[:, 0].astype(np.int32)
    b1 = mat[np.arange(nq), bi]
    b2 = (
        mat[np.arange(nq), order[:, 1]]
        if nd > 1
        else np.full(nq, 257, np.int32)
    )
    return bi, b1.astype(np.int32), b2.astype(np.int32)


def hamming_matrix(queries: np.ndarray, db: np.ndarray) -> np.ndarray:
    """(nq, nd) pairwise Hamming distances over 32-byte descriptors."""
    q = np.ascontiguousarray(queries, dtype=np.uint8)
    d = np.ascontiguousarray(db, dtype=np.uint8)
    nq, nd = q.shape[0], d.shape[0]
    lib = _try_load()
    if lib is not None and nq and nd:
        out = np.empty((nq, nd), np.int32)
        lib.rt_hamming_matrix(q, nq, d, nd, out)
        return out
    bits = np.unpackbits(q[:, None, :] ^ d[None, :, :], axis=-1)
    return bits.sum(-1).astype(np.int32)
