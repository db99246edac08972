"""ctypes binding for the C++ XPBD simulator.

Plays the role of the reference's pybind11 ``pyflex`` module
(reference: PyFleX/bindings/pyflex.cpp:3752-3852 — init/set_scene/step/
get_positions/...). pybind11 is not available in this image, so the binding
is a thin ctypes layer over an ``extern "C"`` API.

Build: ``python -m adaptigraph_tpu.sim.engine`` (or see
.claude/skills/verify/SKILL.md) — cmake+ninja into ``build/sim``.
"""

import ctypes
import os
import subprocess

import numpy as np

SCENE_TYPES = {"rope": 0, "granular": 1, "cloth": 2, "softbody": 3,
               "multiobj": 4, "bunnybath": 5}

_CPP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpp")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SEARCH = [
    os.path.join(_REPO_ROOT, "build", "sim", "libxpbd.so"),
    os.path.join(_CPP_DIR, "build", "libxpbd.so"),
]

_lib = None


def build_library(build_dir=None):
    build_dir = build_dir or os.path.join(_REPO_ROOT, "build", "sim")
    os.makedirs(build_dir, exist_ok=True)
    gen = ["-G", "Ninja"] if _have("ninja") else []
    subprocess.run(["cmake", "-S", _CPP_DIR, "-B", build_dir, *gen], check=True,
                   capture_output=True)
    subprocess.run(["cmake", "--build", build_dir, "-j2"], check=True, capture_output=True)
    return os.path.join(build_dir, "libxpbd.so")


def _have(exe):
    from shutil import which

    return which(exe) is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = next((p for p in _SEARCH if os.path.exists(p)), None)
    if path is None:
        path = build_library()
    lib = ctypes.CDLL(path)
    lib.xpbd_create.restype = ctypes.c_void_p
    lib.xpbd_create.argtypes = [ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.c_uint64]
    lib.xpbd_n_particles.restype = ctypes.c_int
    lib.xpbd_n_particles.argtypes = [ctypes.c_void_p]
    lib.xpbd_get_positions.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.xpbd_get_inv_mass.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.xpbd_set_tool.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int, ctypes.c_float]
    lib.xpbd_get_tool.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.xpbd_step.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.xpbd_create_softbody_points.restype = ctypes.c_void_p
    lib.xpbd_create_softbody_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_float]
    lib.xpbd_get_instance.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.xpbd_fluid_range.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.xpbd_grasp.restype = ctypes.c_int
    lib.xpbd_grasp.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_float]
    lib.xpbd_release.argtypes = [ctypes.c_void_p]
    lib.xpbd_get_timers.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.xpbd_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _fptr(arr):
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class XPBDScene:
    """One live simulation (analog of the pyflex global solver + scene,
    reference: pyflex.cpp:2769 pyflex_set_scene / :2752 pyflex_step)."""

    def __init__(self, scene: str, params, seed=0):
        self._lib = _load()
        arr, ptr = _fptr(np.asarray(params, np.float32))
        self._h = self._lib.xpbd_create(SCENE_TYPES[scene], ptr, len(arr), seed)
        if not self._h:
            raise ValueError(f"unknown scene {scene}")
        self._n_tool = 0

    @classmethod
    def from_points(cls, points, spacing, stiffness=0.5, cluster_span=3,
                    fixed_frac=0.0):
        """Soft body from an arbitrary particle fill (e.g. meshutil.voxelize
        output) — the FleX CreateSoftBody-from-mesh role (by_softbody.h:260)."""
        self = cls.__new__(cls)
        self._lib = _load()
        arr, ptr = _fptr(np.asarray(points, np.float32))
        self._h = self._lib.xpbd_create_softbody_points(
            ptr, len(points), spacing, stiffness, cluster_span, fixed_frac)
        if not self._h:
            raise ValueError("softbody_points creation failed")
        self._n_tool = 0
        return self

    @property
    def n_particles(self):
        return self._lib.xpbd_n_particles(self._h)

    def get_positions(self):
        out = np.empty((self.n_particles, 3), np.float32)
        self._lib.xpbd_get_positions(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def get_inv_mass(self):
        out = np.empty(self.n_particles, np.float32)
        self._lib.xpbd_get_inv_mass(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def set_tool(self, tool_positions, radius=0.06):
        arr, ptr = _fptr(tool_positions)
        self._n_tool = arr.shape[0]
        self._lib.xpbd_set_tool(self._h, ptr, self._n_tool, radius)

    def get_tool(self):
        out = np.empty((self._n_tool, 3), np.float32)
        self._lib.xpbd_get_tool(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def get_instance(self):
        """Particle -> object-instance id (reference:
        pyflex_get_particle_2_obj_instance, pyflex.cpp:2926)."""
        out = np.empty(self.n_particles, np.int32)
        self._lib.xpbd_get_instance(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return out

    def fluid_mask(self):
        """Boolean mask of PBF fluid particles (empty range = no fluid)."""
        out = (ctypes.c_int * 2)()
        self._lib.xpbd_fluid_range(self._h, out)
        mask = np.zeros(self.n_particles, bool)
        mask[out[0]:out[1]] = True
        return mask

    def grasp(self, k=5, max_dist=0.1):
        """Pin the k nearest movable particles to tool point 0 (the
        reference's gripper pick, flex_env.py:389-433). Returns the number of
        particles grasped (0 = nothing in reach)."""
        return self._lib.xpbd_grasp(self._h, int(k), float(max_dist))

    def release(self):
        """Restore the inv mass of grasped particles (flex_env.py:468-471)."""
        self._lib.xpbd_release(self._h)

    def step(self, tool_target=None):
        if tool_target is None:
            tool_target = self.get_tool()
        arr, ptr = _fptr(tool_target)
        self._lib.xpbd_step(self._h, ptr, arr.shape[0])

    def get_timers(self):
        """Per-stage solver timers in ms, accumulated since creation
        (parity with NvFlexGetTimers, reference pyflex.cpp:3557-3583)."""
        out = np.zeros(8, np.float64)
        self._lib.xpbd_get_timers(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        keys = ("integrate", "constraints", "clusters", "fluid", "contacts",
                "tool_walls_ground", "velocity_xsph")
        t = {k: float(v) for k, v in zip(keys, out[:7])}
        t["frames"] = int(out[7])
        return t

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.xpbd_destroy(self._h)
                self._h = None
        except Exception:
            pass


if __name__ == "__main__":
    print(build_library())
