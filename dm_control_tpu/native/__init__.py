"""Native (C++) runtime components.

The reference's runtime sits on native code (MuJoCo C engine, GL);
the TPU build's compute path is XLA, but host-side throughput paths are
native C++ here: ``trajloader`` is a threaded block-gather + prefetch
ring for BC training batches (replacing the reference's torch DataLoader
worker processes, scripts/dataset.py + trainer.py).

The library builds on demand with g++ into this package directory and
loads via ctypes; callers fall back to numpy when a toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "trajloader.cc")
_SO = os.path.join(_DIR, "libtrajloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library():
    """Returns the ctypes library, building it if needed; None if no
    toolchain."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.tl_gather.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, i64p, ctypes.c_int, ctypes.c_int, f32p, f32p]
        lib.tl_gather.restype = None
        lib.tl_create.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i64p,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int]
        lib.tl_create.restype = ctypes.c_void_p
        lib.tl_next.argtypes = [ctypes.c_void_p, f32p, f32p]
        lib.tl_next.restype = None
        lib.tl_destroy.argtypes = [ctypes.c_void_p]
        lib.tl_destroy.restype = None
        _lib = lib
        return _lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _check_starts(starts, block, n):
    """The C++ side does raw memcpy — validate bounds here so malformed
    start indices raise instead of reading out-of-bounds heap memory."""
    if len(starts) and (starts.min() < 0 or starts.max() + block > n):
        raise IndexError(
            f"block start out of range: starts in "
            f"[{starts.min()}, {starts.max()}], block={block}, rows={n}")


def gather_blocks(obs, act, starts, block, n_threads=4):
    """Threaded gather of [batch, block, dim] from explicit start rows."""
    lib = load_library()
    obs = np.ascontiguousarray(obs, np.float32)
    act = np.ascontiguousarray(act, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    _check_starts(starts, block, min(obs.shape[0], act.shape[0]))
    batch = len(starts)
    out_obs = np.empty((batch, block, obs.shape[1]), np.float32)
    out_act = np.empty((batch, block, act.shape[1]), np.float32)
    if lib is None:  # numpy fallback
        gather = starts[:, None] + np.arange(block)[None, :]
        return obs[gather], act[gather]
    lib.tl_gather(_f32p(obs), _f32p(act), obs.shape[0], obs.shape[1],
                  act.shape[1], block, _i64p(starts), batch, n_threads,
                  _f32p(out_obs), _f32p(out_act))
    return out_obs, out_act


class PrefetchLoader:
    """Background-prefetching batch stream over a TrajectoryDataset.

    The C++ worker assembles the next [batch, block, dim] pair while the
    previous one is being consumed (double buffering); `next()` returns
    numpy arrays ready for device transfer.
    """

    def __init__(self, dataset, batch_size, seed=0, n_threads=4):
        import bisect

        lib = load_library()
        if lib is None:
            raise RuntimeError("native toolchain unavailable; use "
                               "TrajectoryDataset.batches instead")
        self._lib = lib
        self.block = dataset.block_size
        self.batch = batch_size
        # keep references so the buffers outlive the C++ loader
        self._obs = np.ascontiguousarray(dataset.observations, np.float32)
        self._act = np.ascontiguousarray(dataset.actions, np.float32)
        starts = np.array([
            i + dataset.logical_offset[
                bisect.bisect_left(dataset.logical_index, i)]
            for i in range(len(dataset))], np.int64)
        self._starts = np.ascontiguousarray(starts)
        _check_starts(self._starts, self.block,
                      min(self._obs.shape[0], self._act.shape[0]))
        self._h = lib.tl_create(
            _f32p(self._obs), _f32p(self._act), self._obs.shape[0],
            self._obs.shape[1], self._act.shape[1], _i64p(self._starts),
            len(self._starts), self.block, self.batch,
            ctypes.c_uint64(seed), n_threads)

    def next(self):
        out_obs = np.empty((self.batch, self.block, self._obs.shape[1]),
                           np.float32)
        out_act = np.empty((self.batch, self.block, self._act.shape[1]),
                           np.float32)
        self._lib.tl_next(self._h, _f32p(out_obs), _f32p(out_act))
        return out_obs, out_act

    def close(self):
        if self._h:
            self._lib.tl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
