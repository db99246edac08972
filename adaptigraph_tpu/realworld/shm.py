"""ctypes binding for the C++ lock-free shared-memory ring buffer.

Python-facing equivalent of the reference's ``SharedMemoryRingBuffer``
(reference: ``src/planning/real_world/shared_memory/shared_memory_ring_buffer.py:18-219``)
and ``SharedNDArray`` (``shared_ndarray.py:79``): fixed-shape numpy frames
streamed from a producer process (camera) to consumers, newest-first reads,
timestamped. The data plane is the C++ seqlock ring (``cpp/shm_ring.cpp``) so
torn reads are detected rather than prevented by convention.
"""

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpp")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SEARCH = [
    os.path.join(_REPO_ROOT, "build", "shm", "libshm_ring.so"),
    os.path.join(_CPP_DIR, "build", "libshm_ring.so"),
]

_lib = None


def build_library(build_dir=None):
    from shutil import which

    build_dir = build_dir or os.path.join(_REPO_ROOT, "build", "shm")
    os.makedirs(build_dir, exist_ok=True)
    gen = ["-G", "Ninja"] if which("ninja") else []
    subprocess.run(["cmake", "-S", _CPP_DIR, "-B", build_dir, *gen], check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", build_dir, "-j2"], check=True,
                   capture_output=True)
    return os.path.join(build_dir, "libshm_ring.so")


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = next((p for p in _SEARCH if os.path.exists(p)), None)
    if path is None:
        path = build_library()
    lib = ctypes.CDLL(path)
    lib.shm_ring_create.restype = ctypes.c_void_p
    lib.shm_ring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.shm_ring_open.restype = ctypes.c_void_p
    lib.shm_ring_open.argtypes = [ctypes.c_char_p]
    lib.shm_ring_elem_bytes.restype = ctypes.c_uint64
    lib.shm_ring_elem_bytes.argtypes = [ctypes.c_void_p]
    lib.shm_ring_capacity.restype = ctypes.c_uint64
    lib.shm_ring_capacity.argtypes = [ctypes.c_void_p]
    lib.shm_ring_count.restype = ctypes.c_uint64
    lib.shm_ring_count.argtypes = [ctypes.c_void_p]
    lib.shm_ring_put.restype = ctypes.c_uint64
    lib.shm_ring_put.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_uint64, ctypes.c_double]
    lib.shm_ring_get.restype = ctypes.c_int
    lib.shm_ring_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                 ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.shm_ring_get_last_k.restype = ctypes.c_int
    lib.shm_ring_get_last_k.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.shm_ring_close.argtypes = [ctypes.c_void_p]
    lib.shm_ring_unlink.argtypes = [ctypes.c_char_p]
    _lib = lib
    return lib


class ShmRingBuffer:
    """Fixed-shape numpy frame ring over POSIX shared memory.

    One process creates (``create=True``, becomes the owner/writer by
    convention), others open by name. The owner unlinks the segment on close.
    """

    def __init__(self, name, shape, dtype, capacity=64, create=False):
        self.lib = _load()
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.elem_bytes = int(np.prod(self.shape)) * self.dtype.itemsize
        bname = name.encode()
        if create:
            self.h = self.lib.shm_ring_create(bname, self.elem_bytes, capacity)
        else:
            self.h = self.lib.shm_ring_open(bname)
            if self.h and self.lib.shm_ring_elem_bytes(self.h) != self.elem_bytes:
                raise ValueError("shape/dtype mismatch with existing ring")
        if not self.h:
            raise OSError(f"shm ring {'create' if create else 'open'} failed: {name}")
        self.name = name

    @property
    def count(self):
        return int(self.lib.shm_ring_count(self.h))

    def put(self, frame, timestamp):
        frame = np.ascontiguousarray(frame, dtype=self.dtype)
        assert frame.shape == self.shape, (frame.shape, self.shape)
        self.lib.shm_ring_put(self.h, frame.ctypes.data_as(ctypes.c_void_p),
                              self.elem_bytes, float(timestamp))

    def get(self, k=0):
        """k-th most recent frame (0 = latest) -> (frame, timestamp) or None."""
        out = np.empty(self.shape, self.dtype)
        ts = ctypes.c_double()
        rc = self.lib.shm_ring_get(self.h, k, out.ctypes.data_as(ctypes.c_void_p),
                                   ctypes.byref(ts))
        if rc != 0:
            return None
        return out, ts.value

    def get_last_k(self, k):
        """Last k frames, oldest first -> (frames (m, *shape), timestamps (m,))."""
        out = np.empty((k,) + self.shape, self.dtype)
        ts = np.empty(k, np.float64)
        got = self.lib.shm_ring_get_last_k(
            self.h, k, out.ctypes.data_as(ctypes.c_void_p),
            ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out[:got], ts[:got]

    def close(self):
        if self.h:
            self.lib.shm_ring_close(self.h)
            self.h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def align_timestamps(ts_lists, target_time):
    """Per-stream index of the frame closest to ``target_time`` (the
    reference's TimestampObsAccumulator alignment,
    ``src/planning/real_world/common/timestamp_accumulator.py:44-152``)."""
    return [int(np.argmin(np.abs(np.asarray(ts) - target_time))) if len(ts) else -1
            for ts in ts_lists]
