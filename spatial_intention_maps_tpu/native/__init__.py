"""ctypes bindings for the native SPFA library (native/spfa/spfa.cpp).

Builds lazily with g++ on first use; used by host-side tools, the real-robot
bridge, and as the exact oracle for the wavefront kernel tests.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "spfa" / "spfa.cpp"
_LIB_PATH = Path(__file__).resolve().parent / "libspfa.so"
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB_PATH)],
        check=True,
    )


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.spfa_distance_image.argtypes = [u8p, c, c, c, c, f32p]
    lib.spfa_distance.restype = ctypes.c_float
    lib.spfa_distance.argtypes = [u8p, c, c, c, c, c, c]
    lib.spfa_shortest_path.restype = c
    lib.spfa_shortest_path.argtypes = [u8p, c, c, c, c, c, c, i32p, c]
    _lib = lib
    return lib


class GridGraph:
    """Host-side grid-graph planner with the reference's API surface
    (shortest_paths.pyx:10, 122-167): shortest_path, shortest_path_distance,
    shortest_path_image."""

    def __init__(self, grid):
        self.grid = np.ascontiguousarray(grid, np.uint8)
        self.h, self.w = self.grid.shape
        self._lib = get_lib()
        self._cache = {}

    def shortest_path(self, source, target, max_len=64):
        out = np.zeros((max_len, 2), np.int32)
        n = self._lib.spfa_shortest_path(
            self.grid, self.h, self.w, int(source[0]), int(source[1]),
            int(target[0]), int(target[1]), out, max_len,
        )
        return [list(p) for p in out[:n]]

    def shortest_path_distance(self, source, target):
        return float(
            self._lib.spfa_distance(
                self.grid, self.h, self.w, int(source[0]), int(source[1]),
                int(target[0]), int(target[1]),
            )
        )

    def shortest_path_image(self, source):
        key = (int(source[0]), int(source[1]))
        if key not in self._cache:
            out = np.zeros(self.h * self.w, np.float32)
            self._lib.spfa_distance_image(
                self.grid, self.h, self.w, key[0], key[1], out
            )
            self._cache[key] = out.reshape(self.h, self.w)
        return self._cache[key]
