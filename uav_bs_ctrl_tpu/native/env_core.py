"""ctypes bindings for the C++ env scheduling core.

Implements the hot inner loop of ``MultiUbsCoverageEnv._transmit_data``
(priority-ordered GT association with lowest-interference idle-RB selection;
reference semantics ``envs/mubs_cov/mubs_cov.py:172-200``) in C++ for
env-steps/s.  Falls back transparently when the library is absent; NumPy and
C++ paths are tested for exact agreement.
"""

import ctypes
import os.path as osp

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    return osp.join(osp.dirname(__file__), "libuavbs.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not osp.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.schedule_and_rate.restype = None
        lib.schedule_and_rate.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,            # n_ubs, n_gts, n_rbs
            ctypes.POINTER(ctypes.c_float),                       # d_u2g [n_ubs, n_gts]
            ctypes.POINTER(ctypes.c_double),                      # gain  [n_ubs, n_gts]
            ctypes.POINTER(ctypes.c_uint8),                       # mask_itf [n_ubs, n_gts]
            ctypes.POINTER(ctypes.c_int64),                       # prior_gts [n_gts]
            ctypes.c_double, ctypes.c_double,                     # r_cov, p_tx
            ctypes.c_double, ctypes.c_double,                     # noise, bw
            ctypes.POINTER(ctypes.c_uint8),                       # out sched [n_ubs,n_gts,n_rbs]
            ctypes.POINTER(ctypes.c_float),                       # out rate_per_gt [n_gts]
            ctypes.POINTER(ctypes.c_float),                       # out rate_per_ubs [n_ubs]
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def schedule_and_rate(d_u2g, gain, mask_itf, prior_gts, n_rbs, r_cov, p_tx, noise, bw=180e3):
    """C++ twin of ``MultiUbsCoverageEnv._schedule_numpy``.

    Returns (sched [n_ubs, n_gts, n_rbs] bool, rate_per_gt [n_gts] f32,
    rate_per_ubs [n_ubs] f32).
    """
    lib = _load()
    n_ubs, n_gts = d_u2g.shape

    d = np.ascontiguousarray(d_u2g, dtype=np.float32)
    g = np.ascontiguousarray(gain, dtype=np.float64)
    mi = np.ascontiguousarray(mask_itf, dtype=np.uint8)
    pr = np.ascontiguousarray(prior_gts, dtype=np.int64)

    sched = np.zeros((n_ubs, n_gts, n_rbs), dtype=np.uint8)
    rate_gt = np.zeros(n_gts, dtype=np.float32)
    rate_ubs = np.zeros(n_ubs, dtype=np.float32)

    lib.schedule_and_rate(
        n_ubs, n_gts, n_rbs,
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        pr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        float(r_cov), float(p_tx), float(noise), float(bw),
        sched.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rate_gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rate_ubs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return sched.astype(bool), rate_gt, rate_ubs
