"""ctypes loader for the native C++ parity oracle (native/vecode_oracle.cc).

The oracle is an independent C++ implementation of the reference's adaptive
RKF45 semantics; the test suite compares the JAX driver's f64 trajectories,
step counts and per-iteration event sequences against it (cross-language
golden parity). Built on demand with g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "vecode_oracle.cc"
_SO = _NATIVE_DIR / "build" / "libvecode_oracle.so"

_lib = None


def build(force: bool = False) -> pathlib.Path:
    """Compile the oracle shared library if needed."""
    if _SO.exists() and not force:
        if _SO.stat().st_mtime >= _SRC.stat().st_mtime:
            return _SO
    _SO.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         str(_SRC), "-o", str(_SO)],
        check=True,
    )
    return _SO


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build()))
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.vecode_solve_linear_rkf45.restype = ctypes.c_int
    lib.vecode_solve_linear_rkf45.argtypes = [
        ctypes.c_int, dp, dp,                       # dim, A, y0
        ctypes.c_double, ctypes.c_double,           # t0, tf
        ctypes.c_double, ctypes.c_double,           # h0, rtol
        ctypes.c_double, ctypes.c_double,           # min_dt, max_dt
        ctypes.c_double, ctypes.c_double,           # alpha, order
        ctypes.c_int, ctypes.c_int, ctypes.c_int,   # adaptive, typo, lower
        ctypes.c_int,                               # strict_end
        ctypes.c_int,                               # max_steps
        dp, dp, dp, ip, ip, ip, i8p,                # outputs
    ]
    lib.vecode_controller_update.restype = ctypes.c_int
    lib.vecode_controller_update.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, dp,
    ]
    lib.vecode_solve_linear_magnus4.restype = ctypes.c_int
    lib.vecode_solve_linear_magnus4.argtypes = [
        ctypes.c_int, dp, dp, ctypes.c_double, dp,  # dim, A0, A1, w, y0
        ctypes.c_double, ctypes.c_double,           # t0, tf
        ctypes.c_double, ctypes.c_double,           # h0, rtol
        ctypes.c_double, ctypes.c_double,           # min_dt, max_dt
        ctypes.c_double, ctypes.c_double,           # alpha, order
        ctypes.c_int, ctypes.c_int,                 # adaptive, strict_end
        ctypes.c_int,                               # max_steps
        dp, ctypes.c_int,                           # norm_weights, kind
        dp, dp, dp, ip, ip, ip, i8p,                # outputs
    ]
    lib.vecode_solve_linear_cfm4.restype = ctypes.c_int
    lib.vecode_solve_linear_cfm4.argtypes = (
        lib.vecode_solve_linear_magnus4.argtypes
    )
    _lib = lib
    return lib


def solve_linear_rkf45(
    A: np.ndarray,
    y0: np.ndarray,
    t0: float,
    tf: float,
    h0: float,
    *,
    rtol: float = 1e-4,
    min_dt: float = 1e-6,
    max_dt: float = 1.0,
    alpha: float = 0.9,
    order: float = 3.0,
    adaptive: bool = True,
    reference_typo: bool = False,
    advance_lower: bool = True,
    strict_end: bool = False,
    max_steps: int = 1_000_000,
):
    """Run the oracle. Returns a dict with y_final, t_final, h_final,
    n_accept, n_reject, events (int8 array), status."""
    lib = load()
    A = np.ascontiguousarray(A, dtype=np.float64)
    y0 = np.ascontiguousarray(y0, dtype=np.float64)
    d = y0.shape[0]
    assert A.shape == (d, d)
    y_final = np.zeros(d)
    t_final = ctypes.c_double()
    h_final = ctypes.c_double()
    n_accept = ctypes.c_int()
    n_reject = ctypes.c_int()
    n_events = ctypes.c_int()
    events = np.zeros(max_steps, dtype=np.int8)

    dp = ctypes.POINTER(ctypes.c_double)
    status = lib.vecode_solve_linear_rkf45(
        d,
        A.ctypes.data_as(dp),
        y0.ctypes.data_as(dp),
        t0, tf, h0, rtol, min_dt, max_dt, alpha, order,
        int(adaptive), int(reference_typo), int(advance_lower),
        int(strict_end),
        max_steps,
        y_final.ctypes.data_as(dp),
        ctypes.byref(t_final),
        ctypes.byref(h_final),
        ctypes.byref(n_accept),
        ctypes.byref(n_reject),
        ctypes.byref(n_events),
        events.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return {
        "y_final": y_final,
        "t_final": t_final.value,
        "h_final": h_final.value,
        "n_accept": n_accept.value,
        "n_reject": n_reject.value,
        "events": events[: n_events.value],
        "status": status,
    }


def controller_update(h, dx_norm, rtol=1e-4, alpha=0.9, order=3.0,
                      min_dt=1e-6, max_dt=1.0):
    lib = load()
    new_h = ctypes.c_double()
    acc = lib.vecode_controller_update(
        h, dx_norm, rtol, alpha, order, min_dt, max_dt, ctypes.byref(new_h)
    )
    return new_h.value, bool(acc)


def solve_linear_magnus4(
    A0: np.ndarray,
    A1: np.ndarray,
    w: float,
    y0: np.ndarray,
    t0: float,
    tf: float,
    h0: float,
    *,
    rtol: float = 1e-4,
    min_dt: float = 1e-6,
    max_dt: float = 1.0,
    alpha: float = 0.9,
    order: float = 3.0,
    adaptive: bool = True,
    strict_end: bool = False,
    max_steps: int = 1_000_000,
    norm_weights=None,
    norm_kind: int = 0,
    _entry: str = "vecode_solve_linear_magnus4",
):
    """Adaptive Magnus-4 oracle on y' = (A0 + cos(w t) A1) y; same return
    dict as :func:`solve_linear_rkf45`. ``norm_weights``/``norm_kind``
    (0=l2, 1=rms, 2=max): the reference's user NormFn (cfm.rs:131-155)
    applied to the embedded error vector."""
    lib = load()
    A0 = np.ascontiguousarray(A0, dtype=np.float64)
    A1 = np.ascontiguousarray(A1, dtype=np.float64)
    y0 = np.ascontiguousarray(y0, dtype=np.float64)
    d = y0.shape[0]
    assert A0.shape == (d, d) and A1.shape == (d, d)
    y_final = np.zeros(d)
    t_final = ctypes.c_double()
    h_final = ctypes.c_double()
    n_accept = ctypes.c_int()
    n_reject = ctypes.c_int()
    n_events = ctypes.c_int()
    events = np.zeros(max_steps, dtype=np.int8)

    dp = ctypes.POINTER(ctypes.c_double)
    status = getattr(lib, _entry)(
        d,
        A0.ctypes.data_as(dp),
        A1.ctypes.data_as(dp),
        w,
        y0.ctypes.data_as(dp),
        t0, tf, h0, rtol, min_dt, max_dt, alpha, order,
        int(adaptive), int(strict_end), max_steps,
        (None if norm_weights is None else np.ascontiguousarray(
            norm_weights, dtype=np.float64).ctypes.data_as(dp)),
        int(norm_kind),
        y_final.ctypes.data_as(dp),
        ctypes.byref(t_final),
        ctypes.byref(h_final),
        ctypes.byref(n_accept),
        ctypes.byref(n_reject),
        ctypes.byref(n_events),
        events.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return {
        "y_final": y_final,
        "t_final": t_final.value,
        "h_final": h_final.value,
        "n_accept": n_accept.value,
        "n_reject": n_reject.value,
        "events": events[: n_events.value],
        "status": status,
    }


def solve_linear_cfm4(A0, A1, w, y0, t0, tf, h0, **kw):
    """Adaptive CFM-4 oracle (reference ExpCFMSolver configuration) on
    y' = (A0 + cos(w t) A1) y; same return dict as solve_linear_rkf45."""
    return solve_linear_magnus4(
        A0, A1, w, y0, t0, tf, h0,
        _entry="vecode_solve_linear_cfm4", **kw,
    )
