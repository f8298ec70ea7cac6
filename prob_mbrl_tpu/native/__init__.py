"""Native (C++) runtime components, bound through ctypes.

The reference is pure Python (`SURVEY.md §2`: zero native components), so
there is nothing to mirror — these are the new framework's own host-runtime
accelerators. The TPU compute path is JAX/XLA/Pallas; the pieces that live on
the host — prioritized-replay bookkeeping, experience indexing — are the ones
that profit from native code once replay buffers reach production sizes
(millions of leaves: Python's per-update bubble-up and per-sample tree walks
dominate the host step otherwise).

The shared library builds on demand with the system ``g++`` and is cached next
to this file; every consumer falls back to the pure-Python implementation when
no compiler is available (see ``utils.experience.SumTree`` vs
``NativeSumTree``).
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'sum_tree.cpp')
_LIB = os.path.join(_HERE, 'libsumtree.so')
_lock = threading.Lock()
_lib = None
_build_error = None


def _build_lib():
    subprocess.run(
        ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _LIB],
        check=True, capture_output=True)


def load_library(rebuild=False):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None and not rebuild:
            return _lib
        if _build_error is not None and not rebuild:
            return None
        try:
            if rebuild or not os.path.exists(_LIB) or (
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build_lib()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError) as e:  # no g++ / load fail
            _build_error = e
            return None
        lib.sumtree_new.restype = ctypes.c_void_p
        lib.sumtree_new.argtypes = [ctypes.c_int64, ctypes.c_uint64]
        lib.sumtree_free.argtypes = [ctypes.c_void_p]
        lib.sumtree_append.restype = ctypes.c_int64
        lib.sumtree_append.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.sumtree_update.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_double]
        lib.sumtree_renormalize.argtypes = [ctypes.c_void_p]
        for name in ('total', 'max_p', 'max_count', 'norm_factor'):
            fn = getattr(lib, f'sumtree_{name}')
            fn.restype = ctypes.c_double
            fn.argtypes = [ctypes.c_void_p]
        lib.sumtree_size.restype = ctypes.c_int64
        lib.sumtree_size.argtypes = [ctypes.c_void_p]
        dptr = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
        iptr = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
        lib.sumtree_get_counts.argtypes = [ctypes.c_void_p, dptr]
        lib.sumtree_get_batch.argtypes = [ctypes.c_void_p, dptr,
                                          ctypes.c_int64, iptr, dptr]
        lib.sumtree_sample.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_double, iptr, dptr]
        _lib = lib
        return _lib


def available():
    return load_library() is not None


class NativeSumTree:
    """C++-backed prioritized-replay sum tree.

    API-compatible with ``utils.experience.SumTree`` (payloads stay in Python,
    tree math runs natively). Raises ``RuntimeError`` at construction when the
    native library cannot be built — callers choose the fallback.
    """

    def __init__(self, max_size, seed=0):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                f'native sumtree unavailable: {_build_error!r}')
        self._lib = lib
        self.max_size = max_size
        self.data = [None] * max_size
        self.idx = 0
        self._h = ctypes.c_void_p(lib.sumtree_new(max_size, seed))

    def __del__(self):
        h = getattr(self, '_h', None)
        if h:
            self._lib.sumtree_free(h)
            self._h = None

    # -- properties mirrored from the Python implementation ------------------
    @property
    def size(self):
        return self._lib.sumtree_size(self._h)

    @property
    def max_p(self):
        return self._lib.sumtree_max_p(self._h)

    @property
    def max_count(self):
        return self._lib.sumtree_max_count(self._h)

    @property
    def norm_factor(self):
        return self._lib.sumtree_norm_factor(self._h)

    @property
    def total(self):
        return self._lib.sumtree_total(self._h)

    @property
    def counts(self):
        out = np.empty(self.max_size, np.float64)
        self._lib.sumtree_get_counts(self._h, out)
        return out

    # -- mutation -------------------------------------------------------------
    def append(self, data, priority):
        at = self._lib.sumtree_append(self._h, float(priority))
        self.data[at] = data
        self.idx = (at + 1) % self.max_size

    def update(self, tree_idx, priority):
        self._lib.sumtree_update(self._h, int(tree_idx), float(priority))

    def renormalize(self):
        self._lib.sumtree_renormalize(self._h)

    # -- retrieval --------------------------------------------------------------
    def get_batch(self, priorities):
        targets = np.ascontiguousarray(np.atleast_1d(priorities), np.float64)
        n = len(targets)
        idxs = np.empty(n, np.int64)
        ps = np.empty(n, np.float64)
        self._lib.sumtree_get_batch(self._h, targets, n, idxs, ps)
        data_idxs = idxs - self.max_size + 1
        return idxs, ps, [self.data[i] for i in data_idxs]

    def sample(self, batchsize, beta=1.0, rng=None):
        del rng  # the native tree owns its RNG stream
        idxs = np.empty(batchsize, np.int64)
        weights = np.empty(batchsize, np.float64)
        self._lib.sumtree_sample(self._h, batchsize, float(beta), idxs,
                                 weights)
        data_idxs = idxs - self.max_size + 1
        samples = [self.data[i] for i in data_idxs]
        return samples, idxs, weights


def make_sum_tree(max_size, seed=0, prefer_native=True):
    """Best-available sum tree: native C++ if buildable, else pure Python."""
    if prefer_native and available():
        return NativeSumTree(max_size, seed)
    from ..utils.experience import SumTree
    return SumTree(max_size)
