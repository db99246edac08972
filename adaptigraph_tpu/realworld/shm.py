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
    if not hasattr(lib, "shm_queue_create"):  # stale build without the queue
        lib = ctypes.CDLL(build_library())
    lib.shm_queue_create.restype = ctypes.c_void_p
    lib.shm_queue_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.shm_queue_open.restype = ctypes.c_void_p
    lib.shm_queue_open.argtypes = [ctypes.c_char_p]
    lib.shm_queue_elem_bytes.restype = ctypes.c_uint64
    lib.shm_queue_elem_bytes.argtypes = [ctypes.c_void_p]
    lib.shm_queue_capacity.restype = ctypes.c_uint64
    lib.shm_queue_capacity.argtypes = [ctypes.c_void_p]
    lib.shm_queue_size.restype = ctypes.c_uint64
    lib.shm_queue_size.argtypes = [ctypes.c_void_p]
    lib.shm_queue_put.restype = ctypes.c_int
    lib.shm_queue_put.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.shm_queue_get_k.restype = ctypes.c_int
    lib.shm_queue_get_k.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.shm_queue_clear.argtypes = [ctypes.c_void_p]
    lib.shm_queue_close.argtypes = [ctypes.c_void_p]
    lib.shm_queue_unlink.argtypes = [ctypes.c_char_p]
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


class ShmQueue:
    """Bounded FIFO of dicts of fixed-shape numpy arrays over POSIX shared
    memory, backed by the C++ SPSC queue in ``cpp/shm_ring.cpp``.

    Python-facing equivalent of the reference's ``SharedMemoryQueue``
    (reference: ``src/planning/real_world/shared_memory/shared_memory_queue.py:10-187``):
    the command plane between the parent and camera/robot child processes.
    Fields are packed into one contiguous record so a put/get is a single
    native memcpy; ``put`` raises ``queue.Full`` and ``get``/``get_k``/
    ``get_all`` raise ``queue.Empty`` like the reference.
    """

    def __init__(self, name, specs, capacity=64, create=False):
        """specs: list of (field_name, shape, dtype) defining the record."""
        self.lib = _load()
        self.specs = []
        offset = 0
        for fname, shape, dtype in specs:
            shape = tuple(int(s) for s in shape)
            dtype = np.dtype(dtype)
            nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
            offset = -(-offset // dtype.itemsize) * dtype.itemsize  # align
            self.specs.append((fname, shape, dtype, offset, nbytes))
            offset += nbytes
        self.elem_bytes = max(offset, 1)
        bname = name.encode()
        if create:
            self.h = self.lib.shm_queue_create(bname, self.elem_bytes, capacity)
        else:
            self.h = self.lib.shm_queue_open(bname)
            if self.h and self.lib.shm_queue_elem_bytes(self.h) != self.elem_bytes:
                raise ValueError("record layout mismatch with existing queue")
        if not self.h:
            raise OSError(f"shm queue {'create' if create else 'open'} failed: {name}")
        self.name = name

    @classmethod
    def from_examples(cls, name, examples, capacity=64, create=True):
        """Infer the record layout from an example dict (reference:
        ``create_from_examples``, shared_memory_queue.py:44-75)."""
        specs = []
        for key, value in examples.items():
            value = np.asarray(value)
            if value.dtype == object:
                raise TypeError(f"unsupported object field {key!r}")
            specs.append((key, value.shape, value.dtype))
        return cls(name, specs, capacity=capacity, create=create)

    def qsize(self):
        return int(self.lib.shm_queue_size(self.h))

    def empty(self):
        return self.qsize() == 0

    def clear(self):
        self.lib.shm_queue_clear(self.h)

    def _pack(self, data):
        rec = np.zeros(self.elem_bytes, np.uint8)
        for fname, shape, dtype, off, nbytes in self.specs:
            value = np.ascontiguousarray(data[fname], dtype=dtype)
            if value.shape != shape:
                value = value.reshape(shape)
            rec[off:off + nbytes] = value.reshape(-1).view(np.uint8)
        return rec

    def _unpack(self, recs, k=None):
        """recs: (n, elem_bytes) uint8 -> dict of (n, *shape) or (*shape,)."""
        out = {}
        for fname, shape, dtype, off, nbytes in self.specs:
            raw = recs[:, off:off + nbytes].copy().view(dtype)
            arr = raw.reshape((len(recs),) + shape)
            out[fname] = arr if k is not None else arr[0]
        return out

    def put(self, data):
        import queue as _q

        rec = self._pack(data)
        if self.lib.shm_queue_put(self.h, rec.ctypes.data_as(ctypes.c_void_p),
                                  self.elem_bytes) != 0:
            raise _q.Full()

    def _get_k_impl(self, k):
        import queue as _q

        recs = np.empty((k, self.elem_bytes), np.uint8)
        got = self.lib.shm_queue_get_k(self.h, k,
                                       recs.ctypes.data_as(ctypes.c_void_p))
        if got <= 0:
            raise _q.Empty()
        return recs[:got]

    def get(self):
        """Pop one record -> dict of arrays (raises queue.Empty)."""
        return self._unpack(self._get_k_impl(1))

    def get_k(self, k):
        """Pop exactly up-to-k records -> dict of (m, *shape) arrays."""
        recs = self._get_k_impl(k)
        return self._unpack(recs, k=len(recs))

    def get_all(self):
        """Drain the queue -> dict of (m, *shape) arrays."""
        n = max(self.qsize(), 1)
        recs = self._get_k_impl(n)
        return self._unpack(recs, k=len(recs))

    def close(self):
        if self.h:
            self.lib.shm_queue_close(self.h)
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
