"""ctypes bindings to the native C++ MPPI core (libmppicore.so).

The double-precision golden model / host fallback for the MPPI update law —
the framework's counterpart of the reference's whole C++ implementation
(src/controller_base.cpp, src/model_base.cpp, src/cost_base.cpp). Built via
``make -C mppi_tf_tpu/native``; see native/src/mppi_core.cpp for the design
rationale. Used by tests/test_native_core.py to cross-check the JAX and
Pallas paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmppicore.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    # ALWAYS run make (it is incremental): building only when the .so is
    # missing silently loaded a stale library after C++ edits, so the
    # "golden model" cross-checks validated JAX against outdated math
    # (review finding). A make failure with an existing .so falls back to
    # it (e.g. no toolchain in a deployment image).
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:  # pragma: no cover
        if not os.path.exists(_LIB_PATH):
            raise ImportError(f"native mppi core unavailable: {e}") from e
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # unloadable .so (stale build, missing runtime dep)
        raise ImportError(f"native mppi core unloadable: {e}") from e
    d = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    i64, dbl, c_int = ctypes.c_int64, ctypes.c_double, ctypes.c_int
    try:
        lib.mppi_update.argtypes = [d, d, i64, i64, i64, dbl, c_int, d, d]
        lib.mppi_pm_rollout.argtypes = [d] * 8 + [i64] * 4 + [dbl] * 3 + [d]
        lib.mppi_pm_solve.argtypes = (
            [d] * 8 + [i64] * 4 + [dbl] * 3 + [c_int] + [d] * 3)
    except AttributeError as e:  # .so predating a symbol
        raise ImportError(
            f"native mppi core is stale (missing symbol): {e}") from e
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load_lib()
        return True
    except ImportError:
        return False


def update(costs, eps, lam: float, normalize: bool = False):
    """Softmax update law. Returns (wnoise [tau, adim], stats dict)."""
    lib = _load_lib()
    costs = np.ascontiguousarray(costs, np.float64)
    eps = np.ascontiguousarray(eps, np.float64)
    k, tau, adim = eps.shape
    assert costs.shape == (k,), costs.shape
    wnoise = np.zeros((tau, adim))
    stats = np.zeros(4)
    lib.mppi_update(costs, eps, k, tau, adim, float(lam),
                    int(bool(normalize)), wnoise, stats)
    return wnoise, {"beta": stats[0], "nabla": stats[1],
                    "cost_mean": stats[2], "cost_max": stats[3]}


def pm_rollout(A, Bm, x0, useq, eps, Q, goal, inv_sigma, lam: float,
               gamma: float, upsilon: float):
    """Point-mass rollout costs [k] (OpenMP-parallel over samples)."""
    lib = _load_lib()
    A = np.ascontiguousarray(A, np.float64)
    Bm = np.ascontiguousarray(Bm, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    useq = np.ascontiguousarray(useq, np.float64)
    eps = np.ascontiguousarray(eps, np.float64)
    Q = np.ascontiguousarray(Q, np.float64)
    goal = np.ascontiguousarray(goal, np.float64)
    inv_sigma = np.ascontiguousarray(inv_sigma, np.float64)
    k, tau, adim = eps.shape
    sdim = x0.shape[0]
    assert A.shape == (sdim, sdim) and Bm.shape == (sdim, adim)
    assert useq.shape == (tau, adim) and Q.shape == (sdim, sdim)
    assert goal.shape == (sdim,) and inv_sigma.shape == (adim, adim)
    costs = np.zeros(k)
    lib.mppi_pm_rollout(A, Bm, x0, useq, eps, Q, goal, inv_sigma, k, tau,
                        sdim, adim, float(lam), float(gamma), float(upsilon),
                        costs)
    return costs


def pm_solve(A, Bm, x0, useq, eps, Q, goal, inv_sigma, lam: float,
             gamma: float, upsilon: float, normalize: bool = False):
    """Full control step. Returns (action [adim], next_useq [tau, adim],
    stats dict). The caller carries next_useq — receding-horizon semantics."""
    lib = _load_lib()
    A = np.ascontiguousarray(A, np.float64)
    Bm = np.ascontiguousarray(Bm, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    useq = np.ascontiguousarray(useq, np.float64)
    eps = np.ascontiguousarray(eps, np.float64)
    Q = np.ascontiguousarray(Q, np.float64)
    goal = np.ascontiguousarray(goal, np.float64)
    inv_sigma = np.ascontiguousarray(inv_sigma, np.float64)
    k, tau, adim = eps.shape
    sdim = x0.shape[0]
    # the C side trusts these shapes; mismatches would index out of
    # bounds (pm_rollout already asserts — review finding: solve didn't)
    assert k >= 1, "need at least one sample"
    assert A.shape == (sdim, sdim) and Bm.shape == (sdim, adim), \
        (A.shape, Bm.shape)
    assert useq.shape == (tau, adim) and Q.shape == (sdim, sdim), \
        (useq.shape, Q.shape)
    assert goal.shape == (sdim,) and inv_sigma.shape == (adim, adim), \
        (goal.shape, inv_sigma.shape)
    action = np.zeros(adim)
    next_useq = np.zeros((tau, adim))
    stats = np.zeros(4)
    lib.mppi_pm_solve(A, Bm, x0, useq, eps, Q, goal, inv_sigma, k, tau, sdim,
                      adim, float(lam), float(gamma), float(upsilon),
                      int(bool(normalize)), action, next_useq, stats)
    return action, next_useq, {"beta": stats[0], "nabla": stats[1],
                               "cost_mean": stats[2], "cost_max": stats[3]}
