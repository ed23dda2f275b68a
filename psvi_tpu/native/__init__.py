"""Native (C++) host-side kernels via ctypes.

Replaces the reference's faiss-cpu dependency (``psvi/inference/
utils.py:556-612``) with our own OpenMP C++ library (``kmeans.cpp``):
k-means++/Lloyd clustering, exact nearest-neighbor search, pairwise
distances. Compiled on first use with g++ into a cached shared object;
``native_available()`` gates callers so the pure-JAX backend
(``psvi_tpu/ops/kmeans.py``) remains the default everywhere.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kmeans.cpp")
_lock = threading.Lock()
_lib = None
_build_error = None


def _so_path():
    """Cache path keyed by the SOURCE CONTENT and the host machine.

    Content hashing (not mtimes) makes staleness robust to git checkouts,
    and the machine key prevents loading a -march=native binary built on
    a CPU with different ISA extensions (SIGILL otherwise)."""
    h = hashlib.sha256()
    with open(_SRC, "rb") as f:
        h.update(f.read())
    h.update(os.uname().machine.encode())
    try:
        h.update(subprocess.run(
            ["g++", "-dumpversion"], capture_output=True, check=True
        ).stdout)
    except Exception:
        pass
    return os.path.join(_HERE, f"libpsvi_native-{h.hexdigest()[:16]}.so")


def _build(so):
    # compile to a temp file and os.replace (atomic): a concurrent process
    # can never dlopen a half-written library
    tmp = f"{so}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", _SRC, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            so = _so_path()
            if not os.path.exists(so):
                _build(so)
            lib = ctypes.CDLL(so)
            lib.kmeans_fit.restype = ctypes.c_double
            lib.kmeans_fit.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.assign_labels.restype = ctypes.c_double
            lib.assign_labels.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.nearest_index.restype = None
            lib.nearest_index.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.pairwise_sq_dists.restype = None
            lib.pairwise_sq_dists.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover
            _build_error = e
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def kmeans_fit(X: np.ndarray, k: int, iters: int = 25, seed: int = 0):
    """k-means++ + Lloyd. Returns (centroids (k, d), labels (n,), inertia)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    X = np.ascontiguousarray(X, np.float32)
    n, d = X.shape
    C = np.zeros((k, d), np.float32)
    labels = np.zeros(n, np.int32)
    inertia = lib.kmeans_fit(
        _fptr(X), n, d, k, iters, seed, _fptr(C),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return C, labels, inertia


def nearest_index(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Index of the nearest row of X for each row of C."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    X = np.ascontiguousarray(X, np.float32)
    C = np.ascontiguousarray(C, np.float32)
    out = np.zeros(len(C), np.int64)
    lib.nearest_index(
        _fptr(X), X.shape[0], X.shape[1], _fptr(C), C.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def pairwise_sq_dists(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    X = np.ascontiguousarray(X, np.float32)
    Y = np.ascontiguousarray(Y, np.float32)
    out = np.zeros((X.shape[0], Y.shape[0]), np.float32)
    lib.pairwise_sq_dists(
        _fptr(X), X.shape[0], _fptr(Y), Y.shape[0], X.shape[1], _fptr(out)
    )
    return out
