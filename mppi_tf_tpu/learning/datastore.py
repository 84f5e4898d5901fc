"""ctypes bindings to the native C++ transition datastore.

The storage backend for :class:`..learning.replay.ReplayBuffer` when the
shared library is built (``make -C mppi_tf_tpu/native``). See
native/src/datastore.cpp for the design rationale; the reference counterpart
is the C++ DataBase (include/data_base.hpp, src/data_base.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmppidata.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # attempt a one-shot build; quiet failure falls back to numpy
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # pragma: no cover
            raise ImportError(f"native datastore unavailable: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ds_create.restype = ctypes.c_void_p
    lib.ds_create.argtypes = [ctypes.c_int64] * 3
    lib.ds_destroy.argtypes = [ctypes.c_void_p]
    lib.ds_size.restype = ctypes.c_int64
    lib.ds_size.argtypes = [ctypes.c_void_p]
    lib.ds_capacity.restype = ctypes.c_int64
    lib.ds_capacity.argtypes = [ctypes.c_void_p]
    dptr = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    lib.ds_add.argtypes = [ctypes.c_void_p, dptr, dptr, dptr]
    lib.ds_get_all.restype = ctypes.c_int64
    lib.ds_get_all.argtypes = [ctypes.c_void_p, dptr, dptr, dptr,
                               ctypes.c_int64]
    lib.ds_to_csv.restype = ctypes.c_int
    lib.ds_to_csv.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    _lib = lib
    return lib


class NativeDataStore:
    """Thin RAII wrapper over the C datastore ABI."""

    def __init__(self, capacity: int, s_dim: int, a_dim: int):
        self._lib = _load_lib()
        self.s_dim = int(s_dim)
        self.a_dim = int(a_dim)
        self._h = self._lib.ds_create(capacity, s_dim, a_dim)
        if not self._h:
            raise ValueError("invalid datastore dimensions")

    def __len__(self) -> int:
        return int(self._lib.ds_size(self._h))

    def add(self, obs: np.ndarray, act: np.ndarray, next_obs: np.ndarray):
        self._lib.ds_add(
            self._h,
            np.ascontiguousarray(obs, np.float64),
            np.ascontiguousarray(act, np.float64),
            np.ascontiguousarray(next_obs, np.float64),
        )

    def get_all(self) -> Dict[str, np.ndarray]:
        # the copy is bounded by the buffer size IN the C call (and the
        # store returns how many rows it wrote): a size-then-copy pair
        # raced concurrent add() into a heap overflow (review finding)
        n = len(self)
        obs = np.empty((n, self.s_dim))
        act = np.empty((n, self.a_dim))
        nxt = np.empty((n, self.s_dim))
        if n:
            wrote = int(self._lib.ds_get_all(self._h, obs, act, nxt, n))
            if wrote < n:  # concurrent eviction shrank the window
                obs, act, nxt = obs[:wrote], act[:wrote], nxt[:wrote]
        return {"obs": obs, "act": act, "next_obs": nxt}

    def to_csv(self, path: str) -> None:
        rc = self._lib.ds_to_csv(self._h, path.encode())
        if rc != 0:
            raise IOError(f"csv export failed: {path}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ds_destroy(self._h)
            self._h = None
